"""The seven canonical business metrics (SURVEY.md §2.4, M1-M7), as
parameterized DataFrame operators.

Each metric is a pure function over a "bookings-like" DataFrame with the
role columns passed explicitly, so the same operator runs on the
reference's rental schema (bookings/apartments) and on the driver testdata
(orders/lineitem) without modification. All expressions are built-in
(JVM-side, whole-stage codegen); every aggregate goes through Spark's
partial->shuffle->final hash aggregation, and outputs are small so the
trailing ``orderBy`` is cheap.

Reference parity (file:line of the original SQL):
- M1 avg_listing_price_weekly     curated_tranformation.py:184-190
- M2 occupancy_rate_monthly       present_summary.py:81-97
- M3 popular_locations_weekly     present_summary.py:99-108
- M4 top_revenue_weekly           present_summary.py:110-119 (+ explicit
                                  top-k window variant the spec implies)
- M5 bookings_per_user            present_summary.py:121-130
- M6 avg_duration_monthly         present_summary.py:132-140
- M7 repeat_customer_rate_monthly present_summary.py:142-181
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _week(col: str | Column) -> Column:
    """Monday-based week start as DateType (Spark date_trunc is Monday-based,
    matching DuckDB/Postgres — verified on boundary dates in tests)."""
    return F.to_date(F.date_trunc("week", F.col(col) if isinstance(col, str) else col))


def _month(col: str | Column) -> Column:
    return F.to_date(F.date_trunc("month", F.col(col) if isinstance(col, str) else col))


def avg_listing_price_weekly(
    listings: DataFrame,
    created_col: str,
    price_col: str,
    active_col: str | None = None,
) -> DataFrame:
    """M1: average listing price per week the listing was created.

    The reference skips the spec's "active listings" filter
    (curated_tranformation.py:184-190, SURVEY.md §2.9 quirk 4); pass
    ``active_col`` for the spec-faithful variant, None for reference parity.
    """
    df = listings.filter(F.col(active_col)) if active_col else listings
    # Money is summed as DECIMAL: float summation is order-dependent (the
    # parallel merge order changes the low bits run to run), decimal
    # summation is exact and associative — reproducible at any parallelism.
    return (
        df.groupBy(_week(created_col).alias("week_start"))
        .agg(
            (
                F.sum(F.col(price_col).cast("decimal(18,4)")).cast("double")
                / F.count(price_col)
            ).alias("avg_price")
        )
        .orderBy("week_start")
    )


def occupancy_rate_monthly(
    bookings: DataFrame,
    checkin_col: str,
    checkout_col: str,
    unit_col: str,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M2: per checkin-month, booked nights / available nights * 100.

    Denominator follows the reference exactly (present_summary.py:88-91):
    (distinct units booked that month) x days-in-month, where days-in-month
    comes from ``DAY(LAST_DAY(ANY_VALUE(checkin)))`` — deterministic because
    every row in the group shares the month. COUNT(DISTINCT) triggers
    Catalyst's expand + two-phase aggregation; fine at scale because the
    group count (months) is tiny.
    """
    df = bookings
    if status_col:
        df = df.filter(F.col(status_col) == confirmed_value)
    checkin = F.to_date(F.col(checkin_col))
    checkout = F.to_date(F.col(checkout_col))
    return (
        df.groupBy(_month(checkin_col).alias("month"))
        .agg(
            F.count(F.lit(1)).alias("total_bookings"),
            F.sum(F.datediff(checkout, checkin)).alias("booked_nights"),
            (
                F.countDistinct(unit_col)
                * F.dayofmonth(F.last_day(F.any_value(checkin)))
            ).alias("available_nights"),
        )
        .withColumn(
            "occupancy_rate",
            F.round(F.lit(100.0) * F.col("booked_nights") / F.col("available_nights"), 2),
        )
        .orderBy("month")
    )


def popular_locations_weekly(
    bookings: DataFrame,
    date_col: str,
    location_col: str,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M3: bookings per (week, location), busiest first."""
    df = bookings
    if status_col:
        df = df.filter(F.col(status_col) == confirmed_value)
    return (
        df.groupBy(_week(date_col).alias("week_start"), F.col(location_col).alias("location"))
        .agg(F.count(F.lit(1)).alias("total_bookings"))
        .orderBy("week_start", F.col("total_bookings").desc(), "location")
    )


def top_revenue_weekly(
    bookings: DataFrame,
    date_col: str,
    unit_col: str,
    revenue_expr: Column,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M4: revenue per (week, unit), highest first (reference's global-sort
    form, present_summary.py:110-119)."""
    df = bookings
    if status_col:
        df = df.filter(F.col(status_col) == confirmed_value)
    return (
        df.groupBy(_week(date_col).alias("week_start"), F.col(unit_col).alias("listing_id"))
        # Exact decimal sum (order-independent), rounded to cents; see
        # avg_listing_price_weekly for why money never sums as float.
        .agg(
            F.round(F.sum(revenue_expr.cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_revenue")
        )
        .orderBy("week_start", F.col("total_revenue").desc(), "listing_id")
    )


def top_revenue_weekly_topk(
    bookings: DataFrame,
    date_col: str,
    unit_col: str,
    revenue_expr: Column,
    k: int = 5,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M4 top-k variant: rank within each week, keep the k best.

    The spec says "top performing listings"; the reference approximates with
    a global sort. A ranking window partitioned by week does it exactly and
    scales: one shuffle on week_start, in-partition sort, early filter.
    Ties broken by listing_id for determinism.
    """
    agg = top_revenue_weekly(
        bookings, date_col, unit_col, revenue_expr, status_col, confirmed_value
    )
    w = Window.partitionBy("week_start").orderBy(
        F.col("total_revenue").desc(), F.col("listing_id").asc()
    )
    return (
        agg.withColumn("revenue_rank", F.row_number().over(w))
        .filter(F.col("revenue_rank") <= k)
        .orderBy("week_start", "revenue_rank")
    )


def bookings_per_user(
    bookings: DataFrame,
    user_col: str,
    spend_col: str | None = None,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M5: confirmed bookings (and optional total spend) per user."""
    df = bookings
    if status_col:
        df = df.filter(F.col(status_col) == confirmed_value)
    aggs = [F.count(F.lit(1)).alias("total_bookings")]
    if spend_col:
        aggs.append(
            F.round(F.sum(F.col(spend_col).cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_spend")
        )
    return (
        df.groupBy(F.col(user_col).alias("user_id")).agg(*aggs).orderBy("user_id")
    )


def avg_duration_monthly(
    bookings: DataFrame,
    checkin_col: str,
    checkout_col: str,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M6: ROUND(AVG(nights), 2) per checkin-month."""
    df = bookings
    if status_col:
        df = df.filter(F.col(status_col) == confirmed_value)
    nights = F.datediff(F.to_date(F.col(checkout_col)), F.to_date(F.col(checkin_col)))
    return (
        df.groupBy(_month(checkin_col).alias("month"))
        .agg(F.round(F.avg(nights), 2).alias("avg_duration_days"))
        .orderBy("month")
    )


def repeat_customer_rate_monthly(
    bookings: DataFrame,
    user_col: str,
    date_col: str,
    tiebreak_col: str | None = None,
    repeat_within_days: int = 30,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M7: % of that month's users whose booking follows their previous one
    within ``repeat_within_days`` (present_summary.py:142-181).

    Stage 1 is a LAG window over (user, date) — one shuffle on user_id, the
    natural partitioning for per-user history, with an explicit tiebreak
    column so the lag is deterministic under same-day bookings. Stage 2 is a
    conditional distinct count per month (NULLs from the CASE drop out of
    COUNT(DISTINCT), matching the reference SQL).
    """
    df = bookings
    if status_col:
        df = df.filter(F.col(status_col) == confirmed_value)
    order_cols = [F.col(date_col).asc()]
    if tiebreak_col:
        order_cols.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    date = F.to_date(F.col(date_col))

    flagged = df.select(
        F.col(user_col).alias("user_id"),
        date.alias("booking_date"),
        F.lag(date).over(w).alias("prev_booking_date"),
    ).withColumn(
        "is_repeat",
        F.when(
            F.col("prev_booking_date").isNotNull()
            & (F.datediff(F.col("booking_date"), F.col("prev_booking_date")) <= repeat_within_days),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return (
        flagged.groupBy(_month("booking_date").alias("month"))
        .agg(
            F.countDistinct(
                F.when(F.col("is_repeat") == 1, F.col("user_id"))
            ).alias("repeat_customers"),
            F.countDistinct("user_id").alias("total_customers"),
        )
        .withColumn(
            "repeat_rate_pct",
            F.round(
                F.lit(100.0) * F.col("repeat_customers") / F.col("total_customers"), 2
            ),
        )
        .orderBy("month")
    )



def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str | Column,
) -> DataFrame:
    """Monthly cohort-retention matrix: users grouped by their FIRST
    active month (the cohort), then counted in every later month they
    come back — the standard growth-analytics view of repeat behavior
    (repeat_customer_rate_monthly answers "how many returned this
    month"; this answers "of January's new users, how many were still
    here in April").

    Exact across engines: months are calendar-truncated dates,
    ``months_since`` is pure INTEGER month arithmetic
    ((year*12+month) difference — no months_between float), and
    ``retention_ppm`` is one truncating BIGINT division
    (floor(1e6 * n_active / n_cohort); operands non-negative so
    div == floor on any engine).

    Shape (r13): ONE scan, ONE data-sized shuffle. groupBy(user) with
    collect_set(month) builds each user's activity set in one exchange
    (the set is months-bounded, <= a few hundred entries ever);
    cohort = array_min in the same frame, the explode back to (cohort,
    months_since) cells is map-side, and everything after is
    dimension-sized (a month²-grain aggregate + a cohort-partitioned
    window that reads n_cohort off the months_since=0 cell — each user
    contributes EXACTLY one month == cohort_month row, so the zero
    cell IS the cohort size; no user-frame join back). The pre-r13
    form scanned the input three times (cohort anchor, activity
    distinct, sizes) and shuffled each.

    NULL timestamps are ignored: a NULL month never forms a cell, and
    a user whose timestamps are ALL NULL has no cohort and is absent
    from the matrix entirely (the r13 single-pass form made this the
    de-facto behavior — collect_set drops NULLs and exploding an empty
    set drops the user; the filter below makes it the DECLARED
    contract, pinned by the NULL-generating property test).

    Returns (cohort_month, months_since, n_active, n_cohort,
    retention_ppm) sorted by (cohort_month, months_since);
    months_since=0 rows carry n_active == n_cohort by construction.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    # Filter on the RAW timestamp, not the derived month: _month() is
    # null-preserving, so the two are equivalent — but isnotnull on the
    # source column reaches the parquet scan as a pushed filter
    # (row-group skipping), while isnotnull(date_trunc(...)) stays a
    # post-scan Filter node (checked via explain("formatted")).
    base = df.where(ts.isNotNull()).select(
        F.col(user_col).alias("user"), _month(ts).alias("month")
    )
    midx = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    per_user = base.groupBy("user").agg(F.collect_set("month").alias("__months"))
    cells = (
        per_user.select(
            F.array_min("__months").alias("cohort_month"),
            F.explode("__months").alias("month"),
        )
        .select(
            "cohort_month",
            (midx(F.col("month")) - midx(F.col("cohort_month"))).alias(
                "months_since"
            ),
        )
        .groupBy("cohort_month", "months_since")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    w_cohort = Window.partitionBy("cohort_month")
    return (
        cells.withColumn(
            "n_cohort",
            F.max(
                F.when(F.col("months_since") == 0, F.col("n_active"))
            ).over(w_cohort),
        )
        .select(
            "cohort_month",
            "months_since",
            "n_active",
            "n_cohort",
            F.expr("(1000000 * n_active) div n_cohort").alias("retention_ppm"),
        )
        .orderBy("cohort_month", "months_since")
    )


def rfm_segments(
    orders: DataFrame,
    user_col: str,
    ts_col: str | Column,
    amount_col: str,
    n_tiles: int = 4,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic CRM scoring: quartile each customer on how recently,
    how often, and how much they bought, then read the three digits as
    a segment code (444 = best, 111 = churned).

    Exact across engines: recency is whole days from the customer's
    last order date to the corpus-wide max order date (DATE
    arithmetic), monetary sums DECIMAL(18,2)-cast amounts times 100
    into exact BIGINT cents (the pricing_summary money rule — float
    sums are order-dependent), and every NTILE rides a globally
    deterministic total order (metric direction, then ``user`` as the
    unique tiebreak), so tile boundaries are engine-independent.

    Precondition: ``amount_col`` and ``ts_col`` non-NULL (order rows
    always carry both) — a NULL would sort differently across engines
    (Spark places NULLS FIRST on ASC where DuckDB defaults to LAST),
    so the operator does not define tile placement for them.

    Shape: one groupBy(user) builds the per-customer triple; the max
    order date is a scalar broadcast (one-row cross join). Each NTILE
    is a TWO-PHASE DISTRIBUTED RANK (windows.global_rank_two_phase:
    range shuffle → in-partition position → broadcast partition
    offsets) plus the closed-form bucket rule — never a single-task
    ``Window.orderBy``: the per-customer frame scales linearly with the
    data (TPC-H sf100k ≈ 15B customers), so the old global window
    funneled it through one task. Rank is a pure function of the total
    order, so the rewrite is bit-identical to the window form
    (property-pinned in tests).

    Returns one row per customer: (user, recency_days, frequency,
    monetary_cents, r_score, f_score, m_score, rfm) sorted by user.
    """
    from lab_etl_batch_data_processing_pipeline__spark.operators.windows import (
        global_rank_two_phase,
        ntile_from_grank,
    )
    if not 2 <= n_tiles <= 9:
        raise ValueError(
            "n_tiles must be in 2..9: the rfm code packs one decimal "
            "digit per axis, so double-digit tiles would collide "
            "(r=1,f=11 reads as r=2,f=1)"
        )
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    base = orders.select(
        F.col(user_col).alias("user"),
        F.to_date(ts).alias("odate"),
        (F.col(amount_col).cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    anchor = base.agg(F.max("odate").alias("anchor_date"))
    per_user = base.groupBy("user").agg(
        F.max("odate").alias("last_date"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("cents").alias("monetary_cents"),
    )
    triple = per_user.crossJoin(F.broadcast(anchor)).select(
        "user",
        F.datediff(F.col("anchor_date"), F.col("last_date")).alias(
            "recency_days"
        ),
        "frequency",
        "monetary_cents",
    )
    def tile(frame: DataFrame, metric: str, desc: bool, alias: str) -> DataFrame:
        order = [
            F.col(metric).desc() if desc else F.col(metric).asc(),
            F.col("user").asc(),
        ]
        return (
            # no key_cols: the payload here is two or three LONG
            # columns per row, so carrying them through the positioned
            # checkpoint is cheaper at every scale than the narrow
            # plan's join-back (two extra full-frame shuffles per
            # tile, three tiles per call — measured +3 s at sf0.1,
            # and width-proportional rather than row-proportional
            # savings can never repay a row-proportional join). The
            # narrow plan is for WIDE payloads (text/array columns) —
            # see global_rank_two_phase's width rule.
            global_rank_two_phase(frame, order)
            .withColumn(alias, ntile_from_grank(n_tiles))
            .drop("__grank", "__gtotal")
        )

    scored = tile(triple, "recency_days", False, "__r_raw")
    scored = tile(scored, "frequency", True, "f_score")
    scored = tile(scored, "monetary_cents", True, "m_score")
    return (
        scored.select(
            "user",
            "recency_days",
            "frequency",
            "monetary_cents",
            "__r_raw",
            "f_score",
            "m_score",
        )
        # high score = good on every axis: recency tile 1 (most recent)
        # becomes n_tiles; frequency/monetary tiles already rank best
        # first, so they invert the same way.
        .select(
            "user",
            "recency_days",
            "frequency",
            "monetary_cents",
            (F.lit(n_tiles + 1) - F.col("__r_raw")).alias("r_score"),
            (F.lit(n_tiles + 1) - F.col("f_score")).alias("f_score"),
            (F.lit(n_tiles + 1) - F.col("m_score")).alias("m_score"),
        )
        .withColumn(
            "rfm",
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"),
        )
        .orderBy("user")
    )


def revenue_pareto(
    lines: DataFrame,
    entity_col: str,
    price_col: str,
    discount_col: str | None = None,
    top_frac_ppm: int = 800_000,
) -> DataFrame:
    """Pareto / contribution analysis: rank entities by revenue and mark
    the head that carries ``top_frac_ppm`` of the total — the 80/20 view
    ("which parts produce 80 % of revenue") every assortment or
    cost-allocation review starts with.

    Exact across engines: revenue goes through the pricing_summary
    money rule (DECIMAL(18,2) price × exact decimal discount factor),
    then ×100 into BIGINT cents; rank and the running total follow ONE
    deterministic total order (cents DESC, entity ASC); the head test
    is pure integer cross-multiplication (10⁶·cum ≤ frac·total, both
    sides DECIMAL(38,0) — no division, no float, no overflow at corpus
    scale).

    Shape: one hash aggregate to entity grain, then a TWO-PHASE
    DISTRIBUTED rank + running sum (windows.global_rank_two_phase with
    ``cum_col``: range shuffle → in-partition position → broadcast
    partition offsets → deterministic rank-bucket prefix sums) — never
    a single-task global window: the entity dimension is NOT bounded
    (parts and customers grow linearly with the data; TPC-H sf100k ≈
    20B parts), so the old ``Window.orderBy`` running sum funneled the
    whole aggregated frame through one task. Integer prefix sums are
    order-independent, so the rewrite is bit-identical (pinned by the
    sequential-replica property test and the unchanged DuckDB oracle).

    Returns (entity, revenue_cents, rank, cum_cents, in_head) sorted by
    rank; in_head marks rows whose RUNNING total is still within the
    fraction (the first row is always in the head if any is).
    """
    from lab_etl_batch_data_processing_pipeline__spark.operators.windows import (
        global_rank_two_phase,
    )
    price = F.col(price_col).cast("decimal(18,2)")
    if discount_col is not None:
        rev = price * (F.lit(1.00).cast("decimal(4,2)") - F.col(discount_col).cast("decimal(4,2)"))
    else:
        rev = price
    per = (
        lines.select(F.col(entity_col).alias("entity"), rev.alias("__rev"))
        .groupBy("entity")
        # round to 2dp BEFORE the cents scaling: the discount product has
        # scale 4, and a scale-4 decimal × 100 still carries fraction —
        # Spark's decimal→long cast truncates where DuckDB's rounds, so
        # the cast must see an integer-valued decimal (pricing_summary
        # rounds for the same reason)
        .agg(
            (F.round(F.sum("__rev"), 2) * 100)
            .cast("long")
            .alias("revenue_cents")
        )
    )
    d38 = "decimal(38,0)"
    ranked = global_rank_two_phase(
        per,
        [F.col("revenue_cents").desc(), F.col("entity").asc()],
        cum_col="revenue_cents",
        # (entity, revenue_cents) IS the whole frame — key_cols
        # documents the key set; the narrow plan engages with no
        # join-back (nothing to trim)
        key_cols=["revenue_cents", "entity"],
    )
    return (
        ranked.select(
            "entity",
            "revenue_cents",
            F.col("__grank").cast("int").alias("rank"),
            F.col("__gcum").alias("cum_cents"),
            (
                F.col("__gcum").cast(d38) * F.lit(1_000_000)
                <= F.col("__gsum").cast(d38) * F.lit(top_frac_ppm)
            ).alias("in_head"),
        )
        .orderBy("rank")
    )


def period_growth(
    df: DataFrame,
    ts_col: str | Column,
    amount_col: str,
) -> DataFrame:
    """Month-over-month growth of a money measure — the trend line
    every revenue dashboard opens with, exact across engines: monthly
    totals are DECIMAL(18,2)-rounded cents (the pricing_summary rule),
    the previous month comes from one LAG over the month-ordered
    totals (month-sized frame — the global window is bounded by the
    calendar), and ``growth_ppm`` = (10⁶·(cur − prev)) div prev is one
    truncating BIGINT division (both engines truncate toward zero, so
    shrinking months need no special casing). Missing-month gaps are
    honest: LAG sees the previous month WITH DATA (document or densify
    upstream if calendar adjacency matters). First month reports NULL.

    Returns (month, revenue_cents, prev_cents, growth_ppm) sorted.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    monthly = (
        df.select(
            _month(ts).alias("month"),
            F.col(amount_col).cast("decimal(18,2)").alias("__amt"),
        )
        .groupBy("month")
        .agg(
            (F.round(F.sum("__amt"), 2) * 100)
            .cast("long")
            .alias("revenue_cents")
        )
    )
    w = Window.orderBy("month")
    return (
        monthly.withColumn(
            "prev_cents", F.lag("revenue_cents").over(w)
        )
        .withColumn(
            "growth_ppm",
            F.when(
                F.col("prev_cents").isNotNull() & (F.col("prev_cents") != 0),
                F.expr(
                    "(1000000 * (revenue_cents - prev_cents))"
                    " div prev_cents"
                ),
            ),
        )
        .orderBy("month")
    )


def concentration_hhi(
    df: DataFrame,
    group_col: str | Column,
    entity_col: str,
    amount_col: str,
) -> DataFrame:
    """Herfindahl–Hirschman concentration index per group: Σ shareᵢ²
    over entities — "is this month's revenue spread across the catalog
    or carried by three SKUs", the antitrust-grade concentration
    number. Log-free exact rationals, the categorical_diversity trick
    at money precision: hhi_ppm = (10⁶·Σcᵢ²) div (Σcᵢ)² with the
    squares carried in DECIMAL(38,0) (cents² exceeds BIGINT at corpus
    scale; Spark decimal == DuckDB HUGEINT arithmetic). 10⁶/n for n
    equal entities; → 10⁶ for a monopoly.

    Shape: entity-grain cents aggregate, then a group-sized roll-up —
    two chained hash aggregates, output group-sized.

    Returns (group, n_entities, total_cents, hhi_ppm) sorted by group.
    """
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    per = (
        df.select(
            g.alias("grp"),
            F.col(entity_col).alias("ent"),
            F.col(amount_col).cast("decimal(18,2)").alias("__amt"),
        )
        .groupBy("grp", "ent")
        .agg(
            (F.round(F.sum("__amt"), 2) * 100).cast("long").alias("__c")
        )
    )
    d38 = "decimal(38,0)"
    return (
        per.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.sum("__c").alias("total_cents"),
            F.sum(F.col("__c").cast(d38) * F.col("__c").cast(d38)).alias(
                "__sumsq"
            ),
        )
        .select(
            F.col("grp").alias("group"),
            "n_entities",
            "total_cents",
            F.when(
                F.col("total_cents") != 0,
                F.expr(
                    "CAST((1000000 * __sumsq)"
                    " div (CAST(total_cents AS DECIMAL(38,0))"
                    "      * CAST(total_cents AS DECIMAL(38,0))) AS BIGINT)"
                ),
            ).alias("hhi_ppm"),
        )
        .orderBy("group")
    )
