"""Sessionization + engagement operators over an event stream table.

The reference loads a ``user_viewing`` engagement table but never joins or
aggregates it (SURVEY.md §2.9 quirk 10 — cleaned then dropped). These
operators are the engagement surface that table invites, expressed on the
driver's ``events`` table.

Scale notes: both operators shuffle once on ``user_col`` (the natural
partitioning for per-user history); the gap-based session assignment is a
LAG + running-sum window pair over that single partitioning, so adding the
second window costs no extra exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str | Column,
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the user's previous event exceeds ``gap_minutes``.

    Classic two-window formulation over one hash partitioning:
    LAG(ts) -> new-session flag -> running SUM of flags = session index.
    Output adds ``session_seq`` (1-based per user).
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    order = [ts.asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_s = gap_minutes * 60
    prev_ts = F.lag(ts).over(w)
    new_session = (
        prev_ts.isNull()
        | ((ts.cast("long") - prev_ts.cast("long")) > gap_s)
    ).cast("int")
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("__new_session", new_session).withColumn(
        "session_seq", F.sum("__new_session").over(running)
    ).drop("__new_session")


def session_stats(
    events: DataFrame,
    user_col: str,
    ts_col: str | Column,
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: event count and duration in seconds."""
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    sessions = sessionize(events, user_col, ts_col, gap_minutes, tiebreak_col)
    return (
        sessions.groupBy(F.col(user_col).alias("user_id"), "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ts).cast("long") - F.min(ts).cast("long")).alias("duration_sec"),
        )
        .orderBy("user_id", "session_seq")
    )


def user_engagement(
    events: DataFrame,
    user_col: str,
    ts_col: str | Column,
    type_col: str | None = None,
) -> DataFrame:
    """Per-user engagement profile: totals, breadth, activity span."""
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts).cast("long") - F.min(ts).cast("long")).alias("span_sec"),
    ]
    if type_col:
        aggs.append(F.countDistinct(type_col).alias("n_event_types"))
    return events.groupBy(F.col(user_col).alias("user_id")).agg(*aggs).orderBy("user_id")


def conversion_funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str | Column,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Ordered-stage conversion funnel: for stage i, count the users
    whose first qualifying stage-i event falls STRICTLY AFTER their
    first qualifying stage-(i-1) event — the product-analytics query
    behind every "view -> click -> purchase" dashboard (engine
    extension; the reference computes flat per-metric aggregates only,
    `spark-job/apps/presentation_tranformation.py`).

    "Qualifying" is recursive: a stage-2 click only counts if it
    happens after the user's first stage-1 view, and the user's
    stage-2 anchor is their FIRST such click — so an early click
    before any view neither advances nor poisons the funnel. Equal
    timestamps do not chain (strict >): simultaneous events can't
    prove ordering, so the funnel stays conservative.

    Shape: one filtered min-aggregate per stage, each joined on the
    user key to the previous stage's anchors — hash aggregates with
    map-side combine and key-partitioned joins, no windows, no
    event-list materialization per user. Each stage's scan pushes its
    type filter into parquet (plan-verified), each anchor frame is
    |users-reaching-stage| rows (monotonically shrinking), and AQE
    broadcast-joins the later, smaller anchors. The per-stage count
    branches in the union share the earlier stages' anchor subplans;
    Spark's ReuseExchange dedupes those identical exchanges at
    runtime, so stage i's aggregate is not recomputed per branch.

    Returns (stage_idx, stage, n_users) — one row per stage.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    base = events.select(
        F.col(user_col).alias("__u"), ts.alias("__ts"), F.col(type_col).alias("__k")
    )
    reached = (
        base.filter(F.col("__k") == stages[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("__anchor"))
    )
    rows = [reached.select(
        F.lit(1).alias("stage_idx"),
        F.lit(stages[0]).alias("stage"),
        F.count(F.lit(1)).alias("n_users"),
    )]
    for i, stage in enumerate(stages[1:], start=2):
        reached = (
            base.filter(F.col("__k") == stage)
            .join(reached.select("__u", "__anchor").withColumnRenamed(
                "__anchor", "__prev"), "__u")
            .filter(F.col("__ts") > F.col("__prev"))
            .groupBy("__u")
            .agg(F.min("__ts").alias("__anchor"))
        )
        rows.append(reached.select(
            F.lit(i).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        ))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("stage_idx")


def event_transitions(
    events: DataFrame,
    user_col: str,
    ts_col: str | Column,
    type_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences: how often event type A is immediately followed by B —
    the behavioral-flow matrix funnels and next-action models start
    from (conversion_funnel asks "did the fixed path happen";
    this asks "what paths happen").

    Exact across engines: consecutive pairs come from one LEAD window
    over (ts, tiebreak) — a deterministic total order per user — and
    ``p_ppm`` is floor(1e6 * n / row-total of the from-type), a
    truncating BIGINT division on non-negative operands. Sequence ends
    (LEAD NULL) are dropped, so each from-row total equals the sum of
    its transitions.

    Shape: one shuffle on user for the window, then a type²-sized hash
    aggregate with map-side partials; the output is alphabet², never
    data-sized. Per-user window skew is bounded by the busiest user.

    Returns (from_type, to_type, n_transitions, p_ppm) sorted by
    (from_type, to_type).
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    order = [ts.asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(F.col(type_col)).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_from = Window.partitionBy("from_type")
    return (
        pairs.withColumn("__from_total", F.sum("n_transitions").over(w_from))
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.expr("(1000000 * n_transitions) div __from_total").alias(
                "p_ppm"
            ),
        )
        .orderBy("from_type", "to_type")
    )


def top_paths(
    events: DataFrame,
    user_col: str,
    ts_col: str | Column,
    type_col: str,
    gap_minutes: int = 30,
    max_len: int = 5,
    k: int = 20,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-k session paths: the most common opening sequences of event
    types (first ``max_len`` events of each gap-based session, joined
    with '>'), ranked by how many sessions follow them — the
    path-mining view ("view>click>purchase happens 1,200×") on top of
    the same sessionization the per-session stats use.

    Deterministic across engines: session assignment is the exact
    sessionize() rule, within-session order is (ts, tiebreak), the
    path string concatenates the rn<=max_len prefix in that order, and
    the final top-k rides (n_sessions DESC, path ASC) — a total order,
    so the cut line is unambiguous.

    Shape: one shuffle on user (sessionize + the prefix window share
    the partitioning), one path-sized hash aggregate, then a bounded
    TakeOrdered top-k — no global sort of the data.

    Returns (path, n_sessions) — k rows, (n_sessions DESC, path) order.
    """
    ts_name = ts_col if isinstance(ts_col, str) else None
    sess = sessionize(events, user_col, ts_col, gap_minutes, tiebreak_col)
    ts = F.col(ts_name) if ts_name else ts_col
    order = [ts.asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col, "session_seq").orderBy(*order)
    prefix = sess.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= max_len
    )
    paths = (
        prefix.groupBy(user_col, "session_seq")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__rn", F.col(type_col)))
                    ),
                    lambda s: s[type_col],
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    return paths.orderBy(F.col("n_sessions").desc(), F.col("path").asc()).limit(k)


def rolling_active_users(
    events: DataFrame,
    user_col: str,
    day_col: str | Column,
    windows_days: tuple[int, ...] = (1, 7, 28),
) -> DataFrame:
    """Exact DAU / WAU / MAU: for every calendar day with activity, the
    distinct users active in the trailing 1 / 7 / 28 days — the
    engagement dashboard triple, computed exactly (sliding-window
    COUNT(DISTINCT) has no native window form; approx sketches drift
    across engines).

    Shape: activity first collapses to distinct (user, day) — the only
    data-sized aggregate; each activity day then EXPLODES ONCE into
    the max(window) future report days it supports, carrying its day
    offset, and ONE aggregate computes every window's distinct count
    via conditional COUNT(DISTINCT CASE WHEN offset < w ...) — one
    shuffle for all windows (Catalyst's Expand handles the multiple
    distincts), not one explode+join per window. Report days are
    restricted to days that exist in the data (no empty-day grid), so
    output is day-sized.

    At 100 TB: |distinct user-days| is the corpus bound (billions),
    ×28 explode is the documented cost — the alternative (re-scanning
    raw events per window) is strictly worse; HLL partials replace the
    exact distinct when approximation is acceptable, with THIS form as
    the oracle.

    ``day_col`` must already be a DATE — deriving a calendar day from an
    instant is timezone-POLICY, not arithmetic, so the caller owns it
    (the registry wrapper uses tz-free epoch-day arithmetic; a local
    dashboard would convert in its zone first).

    Returns (day, n_active_1d, n_active_7d, n_active_28d) — one row per
    active day, sorted; column names follow ``windows_days``.
    """
    day = F.col(day_col) if isinstance(day_col, str) else day_col
    act = events.select(
        F.col(user_col).alias("user"), day.alias("day")
    ).distinct()
    days = act.select("day").distinct()
    maxw = max(windows_days)
    support = act.select(
        "user",
        F.explode(F.sequence(F.lit(0), F.lit(maxw - 1))).alias("off"),
        "day",
    ).select(
        "user", "off", F.date_add(F.col("day"), F.col("off")).alias("rday")
    )
    counts = support.groupBy("rday").agg(
        *[
            F.countDistinct(
                F.when(F.col("off") < w, F.col("user"))
            ).alias(f"n_active_{w}d")
            for w in windows_days
        ]
    )
    out = days.join(counts, days["day"] == counts["rday"], "left").drop(
        "rday"
    )
    cols = ["day"] + [f"n_active_{w}d" for w in windows_days]
    return out.select(*[F.col(c) for c in cols]).orderBy("day")


def funnel_timing(
    events: DataFrame,
    user_col: str,
    ts_col: str | Column,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Conversion-funnel TIMING: conversion_funnel's recursive
    first-anchor rule, plus how long each hop takes — per stage, the
    converting-user count, the exact total seconds from the previous
    anchor, and the truncating-ms average ("users take a median/mean N
    minutes from click to purchase"), the second question every funnel
    dashboard asks.

    Timestamps collapse to whole epoch seconds up front (the
    sessionization-oracle rule: sub-second instant encodings are
    engine-representation noise), so anchors, deltas and sums are all
    exact BIGINTs; ``avg_delta_ms`` = (1000·Σdelta) div n is one
    truncating division on non-negative operands. Stage 1 has no
    previous anchor — its timing columns are NULL, not 0.

    Same plan shape as conversion_funnel (shrinking per-stage
    min-aggregates over user-keyed joins; no windows), with MIN(prev)
    carried through the stage aggregate (constant per user, so MIN is
    just a pick).

    Returns (stage_idx, stage, n_users, sum_delta_sec, avg_delta_ms)
    sorted by stage_idx.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    base = events.select(
        F.col(user_col).alias("__u"),
        ts.cast("long").alias("__s"),
        F.col(type_col).alias("__k"),
    )
    reached = (
        base.filter(F.col("__k") == stages[0])
        .groupBy("__u")
        .agg(F.min("__s").alias("__anchor"))
    )
    rows = [
        reached.select(
            F.lit(1).alias("stage_idx"),
            F.lit(stages[0]).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
            F.lit(None).cast("long").alias("sum_delta_sec"),
            F.lit(None).cast("long").alias("avg_delta_ms"),
        )
    ]
    for i, stage in enumerate(stages[1:], start=2):
        reached = (
            base.filter(F.col("__k") == stage)
            .join(
                reached.select("__u", "__anchor").withColumnRenamed(
                    "__anchor", "__prev"
                ),
                "__u",
            )
            .filter(F.col("__s") > F.col("__prev"))
            .groupBy("__u")
            .agg(
                F.min("__s").alias("__anchor"),
                F.min("__prev").alias("__from"),
            )
        )
        stats = (
            reached.select(
                (F.col("__anchor") - F.col("__from")).alias("__d")
            )
            .agg(
                F.count(F.lit(1)).alias("n_users"),
                F.sum("__d").alias("sum_delta_sec"),
            )
        )
        rows.append(
            stats.select(
                F.lit(i).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                "n_users",
                "sum_delta_sec",
                F.when(
                    F.col("n_users") > 0,
                    F.expr("(1000 * sum_delta_sec) div n_users"),
                ).alias("avg_delta_ms"),
            )
        )
        reached = reached.select("__u", "__anchor")
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("stage_idx")


def multi_touch_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    conversion_type: str,
    lookback_hours: int = 168,
) -> DataFrame:
    """Batch multi-touch attribution: every conversion splits exactly
    1,000,000 ppm of credit EQUALLY across the user's touch events in
    the strict lookback window ``[conv_ts - lookback, conv_ts)`` —
    linear attribution, the position-free baseline marketing teams
    reconcile against (last-touch is its rank==n special case).

    Exact-integer split by largest remainder: each of the n touches
    gets ``1e6 div n`` ppm and the ``1e6 mod n`` EARLIEST touches
    (order: ts, then id — a total order) get +1 ppm, so per-conversion
    credit sums to exactly 1,000,000 with no float shares and no
    engine-varying rounding. Conversions with zero in-window touches
    distribute nothing (reported nowhere — they have no touch rows);
    timestamps compare in microseconds, a touch sharing the exact
    microsecond of the conversion is OUTSIDE the window (strict <).

    Shape: one shuffle joins touches to conversions on ``user_col``
    with the range predicate applied inside the join (per-user pair
    space is bounded by the lookback width, the same bound any
    attribution system carries); one window over conversion id ranks
    and counts touches; one final groupBy on touch type. At 100 TB the
    user-keyed shuffle dominates and skewed users stay bounded by
    events-per-lookback, not history length.

    Returns (touch_type, n_touches, n_conversions, credit_ppm) sorted
    by touch_type. ``credit_ppm`` sums to 1e6 × (conversions with ≥1
    in-window touch) across the whole frame — the conservation law the
    oracle hash pins.
    """
    base = events.select(
        F.col(user_col).alias("__u"),
        F.unix_micros(F.col(ts_col)).alias("__ts"),
        F.col(type_col).alias("__type"),
        F.col(id_col).alias("__id"),
    )
    conv = base.filter(F.col("__type") == conversion_type).select(
        F.col("__u").alias("c_u"),
        F.col("__ts").alias("c_ts"),
        F.col("__id").alias("c_id"),
    )
    touch = base.filter(F.col("__type") != conversion_type)
    lookback_us = lookback_hours * 3600 * 1_000_000
    pairs = touch.join(
        conv,
        (F.col("__u") == F.col("c_u"))
        & (F.col("__ts") < F.col("c_ts"))
        & (F.col("__ts") >= F.col("c_ts") - F.lit(lookback_us)),
    )
    # partition by (user, conversion id): id_col need only be unique
    # WITHIN a user (a per-user sequence id is fine) — two users
    # sharing a conversion id must not merge into one credit pool
    w = Window.partitionBy("c_u", "c_id")
    w_rank = w.orderBy(F.col("__ts").asc(), F.col("__id").asc())
    shared = pairs.select(
        "__type",
        "c_u",
        "c_id",
        F.row_number().over(w_rank).alias("__rk"),
        F.count(F.lit(1)).over(w).alias("__n"),
    ).withColumn(
        "__ppm",
        F.expr("1000000 div __n")
        + F.when(F.col("__rk") <= F.expr("1000000 % __n"), 1).otherwise(0),
    )
    return (
        shared.groupBy(F.col("__type").alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("c_u", "c_id").alias("n_conversions"),
            F.sum("__ppm").alias("credit_ppm"),
        )
        .orderBy("touch_type")
    )


def first_seen_rate(
    events: DataFrame,
    user_col: str,
    day_col: str | Column,
) -> DataFrame:
    """Daily new-vs-returning actives: for every calendar day with
    activity, how many distinct users were active and how many of them
    were seen for the FIRST time that day, plus the new share in
    truncating ppm — the acquisition-vs-retention split every growth
    dashboard opens with.

    Exact: activity collapses to distinct (user, day) once; a per-user
    MIN(day) marks the first-seen day; counts are exact distincts and
    the ppm share is integer ``(1e6 * new) div actives`` (actives ≥ 1
    on every emitted row, so no zero-division branch). Like
    :func:`rolling_active_users`, ``day_col`` must already be a DATE —
    the caller owns the timezone policy.

    Shape: two shuffles (user-keyed MIN, then day-keyed counts), both
    on corpus-bounded frames (distinct user-days); nothing explodes.

    Returns (day, n_active, n_new, new_ppm) sorted by day.
    """
    day = F.col(day_col) if isinstance(day_col, str) else day_col
    act = events.select(
        F.col(user_col).alias("user"), day.alias("day")
    ).distinct()
    first = act.groupBy("user").agg(F.min("day").alias("first_day"))
    return (
        act.join(first, "user")
        .groupBy("day")
        .agg(
            F.countDistinct("user").alias("n_active"),
            F.countDistinct(
                F.when(F.col("day") == F.col("first_day"), F.col("user"))
            ).alias("n_new"),
        )
        .withColumn("new_ppm", F.expr("(1000000 * n_new) div n_active"))
        .orderBy("day")
    )


def session_depth_hist(
    events: DataFrame,
    user_col: str,
    ts_col: str | Column,
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
    max_depth: int = 10,
) -> DataFrame:
    """Session-depth distribution: how many sessions contain exactly 1,
    2, ..., ``max_depth``+ events, with each depth's share in
    truncating ppm — depth-1 share IS the bounce rate, the first number
    any engagement review asks for.

    Exact: sessions come from :func:`sessionize`'s gap rule (a total
    order via ``tiebreak_col`` keeps the assignment engine-stable,
    though depth COUNTS are tie-order-invariant anyway — moving an
    event between two orders of equal timestamps never changes per-
    session counts, only which session id holds them); depths clamp to
    ``max_depth`` ("10+"), shares are ``(1e6 · n) div total``.

    Shape: one user-keyed shuffle (the session windows), one per-
    session aggregate on (user, session) sharing that partitioning,
    one depth-sized hash aggregate; the share window runs over the
    ≤ ``max_depth``-row result frame.

    Returns (depth, n_sessions, share_ppm) sorted by depth.
    """
    stats = session_stats(
        events, user_col, ts_col, gap_minutes, tiebreak_col
    )
    depths = (
        stats.select(
            F.least(F.col("n_events"), F.lit(max_depth)).alias("depth")
        )
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    w_all = Window.partitionBy()
    return (
        depths.withColumn("__total", F.sum("n_sessions").over(w_all))
        .withColumn(
            "share_ppm", F.expr("(1000000 * n_sessions) div __total")
        )
        .drop("__total")
        .orderBy("depth")
    )


def event_streaks(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Run-length (streak) analysis: collapse each user's consecutive
    same-type events into runs and report, per event type, how many
    runs exist, the LONGEST run, and the total events — "what's the
    longest error burst / purchase streak", the consecutiveness
    question transitions and funnels don't answer.

    Exact: runs come from one LAG + running-sum island pass over the
    (ts, tiebreak) total order per user — the sessionize/SCD2 island
    idiom, keyed on type-change instead of time-gap. Ties in ts without
    a tiebreak would make run BOUNDARIES order-dependent, so pass one
    whenever timestamps can collide (the registry row uses event_id).

    Shape: one shuffle on user (both windows share it), one hash
    aggregate per (user, run), one alphabet-sized rollup.

    Returns (event_type, n_events, n_runs, max_run_len) sorted by
    event_type.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    from lab_etl_batch_data_processing_pipeline__spark.operators.windows import (
        island_ids,
    )

    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(type_col)).over(w)
    flagged = island_ids(
        events.withColumn(
            "__new",
            F.when(
                prev.isNull() | (F.col(type_col) != prev), 1
            ).otherwise(0),
        ),
        user_col,
        order,
        "__new",
        out_col="__run",
    )
    runs = flagged.groupBy(
        F.col(user_col).alias("__u"),
        F.col("__run"),
        F.col(type_col).alias("event_type"),
    ).agg(F.count(F.lit(1)).alias("__len"))
    return (
        runs.groupBy("event_type")
        .agg(
            F.sum("__len").alias("n_events"),
            F.count(F.lit(1)).alias("n_runs"),
            F.max("__len").alias("max_run_len"),
        )
        .orderBy("event_type")
    )
