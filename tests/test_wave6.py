"""Unit tests for the sixth-wave operators: multi-touch attribution,
first-seen rate, FD profiler, chi-square gate, winsorized stats, and the
2-D skyline.

Each test pins the semantics on a small constructed frame (the oracle
rows pin full-scale value parity; these pin the RULES on inputs where
the expected output is hand-checkable)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lab_etl_batch_data_processing_pipeline__spark.operators import (
    joins,
    profiling,
    sessions,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ------------------------------------------------- multi-touch attribution


def test_attribution_largest_remainder_conserves_ppm(spark):
    # one purchase, three touches -> 333334 + 333333 + 333333 = 1e6,
    # the +1 going to the EARLIEST touch.
    rows = [
        (1, _ts("2024-01-01 10:00:00"), "view", 1),
        (1, _ts("2024-01-01 11:00:00"), "click", 2),
        (1, _ts("2024-01-01 12:00:00"), "view", 3),
        (1, _ts("2024-01-01 13:00:00"), "purchase", 4),
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "et", "id"])
    out = {
        r.touch_type: (r.n_touches, r.n_conversions, r.credit_ppm)
        for r in sessions.multi_touch_attribution(
            df, "u", "ts", "et", "id", "purchase", lookback_hours=24
        ).collect()
    }
    # view has ranks 1 and 3: 333_334 + 333_333; click rank 2: 333_333
    assert out == {
        "view": (2, 1, 666_667),
        "click": (1, 1, 333_333),
    }
    assert sum(v[2] for v in out.values()) == 1_000_000


def test_attribution_window_is_strict_and_bounded(spark):
    rows = [
        # exactly AT the conversion instant -> excluded (strict <)
        (1, _ts("2024-01-01 13:00:00"), "click", 1),
        # one second inside the 1h lookback -> included
        (1, _ts("2024-01-01 12:00:01"), "view", 2),
        # exactly at conv - 1h -> included (>= lower bound)
        (1, _ts("2024-01-01 12:00:00"), "signup", 3),
        # one microsecond before the lower bound -> excluded
        (1, _ts("2024-01-01 11:59:59.999999"), "view", 4),
        (1, _ts("2024-01-01 13:00:00"), "purchase", 5),
        # a conversion with no touches distributes nothing
        (2, _ts("2024-01-01 13:00:00"), "purchase", 6),
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "et", "id"])
    out = {
        r.touch_type: r.credit_ppm
        for r in sessions.multi_touch_attribution(
            df, "u", "ts", "et", "id", "purchase", lookback_hours=1
        ).collect()
    }
    assert out == {"view": 500_000, "signup": 500_000}


# ------------------------------------------------------- first-seen rate


def test_first_seen_rate_new_vs_returning(spark):
    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    rows = [
        (1, d1), (2, d1),          # day 1: both new
        (1, d2), (3, d2), (3, d2), # day 2: u1 returning, u3 new (dup row)
    ]
    df = spark.createDataFrame(rows, ["u", "day"])
    out = {
        str(r.day): (r.n_active, r.n_new, r.new_ppm)
        for r in sessions.first_seen_rate(df, "u", "day").collect()
    }
    assert out == {
        "2024-01-01": (2, 2, 1_000_000),
        "2024-01-02": (2, 1, 500_000),
    }


# --------------------------------------------------------- FD profiler


def test_fd_report_holds_and_violations(spark):
    rows = [
        (1, "a", 10),
        (2, "a", 10),
        (2, "b", 11),  # lhs=2 has two rhs values -> violating group
        (3, "c", 12),
    ]
    df = spark.createDataFrame(rows, ["k", "v", "x"])
    out = {
        r.fd: (r.n_groups, r.n_violating_groups, r.n_violating_rows, r.holds)
        for r in profiling.fd_report(df, [(["k"], "v"), (["x"], "v")]).collect()
    }
    assert out["k->v"] == (3, 1, 2, False)
    assert out["x->v"] == (3, 0, 0, True)


def test_fd_report_null_rhs_never_violates(spark):
    rows = [(1, None), (1, None), (2, "a"), (2, None)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {
        r.fd: (r.n_violating_groups, r.holds)
        for r in profiling.fd_report(df, [(["k"], "v")]).collect()
    }
    # NULLs are ignored by the distinct count on both engines
    assert out["k->v"] == (0, True)


# ------------------------------------------------------ chi-square gate


def test_chi_square_independent_is_zero(spark):
    # perfectly independent 2x2: every cell O == E -> every ppm term 0
    rows = (
        [("a", 0)] * 4 + [("a", 1)] * 4 + [("b", 0)] * 4 + [("b", 1)] * 4
    )
    df = spark.createDataFrame(rows, ["x", "y"])
    out = profiling.chi_square_gate(df, "x", "y").collect()
    assert all(r.chi2_ppm == 0 for r in out)
    assert {r.a: r.n_rows for r in out} == {"a": 8, "b": 8}


def test_chi_square_exact_2x2(spark):
    # O = [[3,1],[1,3]], N=8, all margins 4:
    # per cell |O*N - r*c| = |24-16| = 8 -> 8^2*1e6 // (4*4*8) = 500000
    rows = (
        [("a", 0)] * 3 + [("a", 1)] * 1 + [("b", 0)] * 1 + [("b", 1)] * 3
    )
    df = spark.createDataFrame(rows, ["x", "y"])
    out = {r.a: r.chi2_ppm for r in profiling.chi_square_gate(df, "x", "y").collect()}
    assert out == {"a": 1_000_000, "b": 1_000_000}  # two cells each


# ----------------------------------------------------- winsorized stats


def test_winsorized_cuts_and_clamp(spark):
    # n=20 values 1..19 plus an outlier 1000:
    # pos_lo = ceil(20*5/100) = 1 -> lo_cut = 1
    # pos_hi = ceil(20*95/100) = 19 -> hi_cut = 19
    vals = list(range(1, 20)) + [1000]
    df = spark.createDataFrame([("k", v) for v in vals], ["g", "v"])
    out = profiling.winsorized_stats(df, "g", "v", p_lo=5, p_hi=95).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.lo_cut, r.hi_cut) == (20, 1, 19)
    assert r.wins_sum == sum(range(1, 20)) + 19  # outlier clamped to 19


def test_winsorized_single_row_key(spark):
    df = spark.createDataFrame([("k", 7)], ["g", "v"])
    r = profiling.winsorized_stats(df, "g", "v").collect()[0]
    assert (r.n, r.lo_cut, r.hi_cut, r.wins_sum) == (1, 7, 7, 7)


# -------------------------------------------------------------- skyline


def test_skyline_dominance_and_ties(spark):
    rows = [
        (1, 10, 100),  # skyline (biggest size)
        (2, 10, 120),  # dominated by 1 (same size, higher price)
        (3, 8, 80),    # skyline (cheaper than anything bigger)
        (4, 8, 80),    # tie with 3 on the frontier point -> also skyline
        (5, 6, 90),    # dominated by 3 (smaller size, higher price)
        (6, 6, 80),    # dominated by 3 (smaller size, same price, strict)
        (7, 4, 50),    # skyline
        (8, None, 10), # NULL dimension -> excluded
    ]
    df = spark.createDataFrame(rows, ["id", "size", "price"])
    got = sorted(
        r.id for r in joins.skyline2d(df, "size", "price").collect()
    )
    assert got == [1, 3, 4, 7]


def test_skyline_no_row_dominates_another(spark):
    import itertools

    rows = [(i, (i * 7) % 13, (i * 5) % 11) for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "size", "price"])
    sky = [(r.size, r.price) for r in joins.skyline2d(df, "size", "price").collect()]
    for a, b in itertools.permutations(sky, 2):
        dominated = (
            a[0] >= b[0] and a[1] <= b[1] and (a[0] > b[0] or a[1] < b[1])
        )
        assert not dominated, (a, b)


# ----------------------------------------------- seasonal-naive backtest


def test_seasonal_backtest_scores_only_joined_days(spark):
    d = dt.date
    rows = [
        ("k", d(2024, 1, 1), 100),
        ("k", d(2024, 1, 8), 130),   # scored vs Jan 1: AE 30
        ("k", d(2024, 1, 15), 70),   # scored vs Jan 8: AE 60
        ("k", d(2024, 1, 22), 70),   # scored vs Jan 15: AE 0
        ("k", d(2024, 2, 10), 50),   # no base 7 days back -> unscored
    ]
    df = spark.createDataFrame(rows, ["g", "day", "cents"])
    out = __import__(
        "lab_etl_batch_data_processing_pipeline__spark.operators.windows",
        fromlist=["windows"],
    ).seasonal_naive_backtest(df, "g", "day", "cents", season_days=7).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_scored, r.sum_abs_err, r.sum_actual) == (3, 90, 270)
    assert r.wape_ppm == (1_000_000 * 90) // 270


# ------------------------------------------------------- level shift


def test_level_shift_finds_the_step(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import windows

    # 8 values of 0 then 8 values of 100: the maximal |next8 - prev8|
    # is at the first high position (800 - 0).
    rows = [("k", i, i, 0 if i < 8 else 100) for i in range(16)]
    df = spark.createDataFrame(rows, ["g", "t", "id", "v"])
    out = windows.level_shift(df, "g", "t", "v", window=8, tiebreak_col="id").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.shift_ts, r.score, r.sum_prev, r.sum_next) == (8, 800, 0, 800)


def test_level_shift_short_keys_emit_nothing(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import windows

    rows = [("k", i, i, 5) for i in range(15)]  # needs 16 for both windows
    df = spark.createDataFrame(rows, ["g", "t", "id", "v"])
    assert windows.level_shift(df, "g", "t", "v", window=8).count() == 0


# ------------------------------------------------- floored running balance


def test_floored_balance_closed_form_matches_loop(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import windows

    deltas = [5, -10, 8, -6, -3, 12, -1, -20, 4]
    rows = [("u", i, d) for i, d in enumerate(deltas)]
    df = spark.createDataFrame(rows, ["g", "t", "d"])
    got = [
        r.balance
        for r in windows.floored_running_balance(df, "g", "t", "d").collect()
    ]
    bal, want = 0, []
    for d in deltas:
        bal = max(0, bal + d)
        want.append(bal)
    assert got == want


# ------------------------------------------------- equi-depth histogram


def test_equidepth_buckets_are_near_equal_and_exact(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import profiling

    vals = list(range(1, 11))  # 10 rows, k=4 -> sizes 3,2,3,2 by rank rule
    df = spark.createDataFrame([("k", v) for v in vals], ["g", "v"])
    out = profiling.equidepth_histogram(df, "g", "v", k=4).collect()
    got = [(r.bucket, r.n_rows, r.min_v, r.max_v, r.sum_v) for r in out]
    # bucket = ((rn-1)*4) div 10: rn 1-3 -> 0, rn 4-5 -> 1, 6-8 -> 2, 9-10 -> 3
    assert got == [
        (0, 3, 1, 3, 6),
        (1, 2, 4, 5, 9),
        (2, 3, 6, 8, 21),
        (3, 2, 9, 10, 19),
    ]


# ---------------------------------------------------------------- KS gate


def test_ks_gate_exact_distance(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import profiling

    # A = {1,2,3,4}, B = {3,4,5,6}: max gap at v=2 (F_a=1/2, F_b=0)
    # d_scaled = |2*4 - 0*4| = 8, ks = 0.5
    rows = [("k", "A", v) for v in [1, 2, 3, 4]] + [
        ("k", "B", v) for v in [3, 4, 5, 6]
    ]
    df = spark.createDataFrame(rows, ["g", "grp", "v"])
    out = profiling.ks_gate(df, "g", "grp", "v", "A", "B").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_a, r.n_b, r.d_scaled, r.ks_ppm, r.at_value) == (
        4, 4, 8, 500_000, 2,
    )


def test_ks_gate_identical_distributions_zero(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import profiling

    rows = [("k", g, v) for g in ["A", "B"] for v in [1, 2, 3]]
    df = spark.createDataFrame(rows, ["g", "grp", "v"])
    r = profiling.ks_gate(df, "g", "grp", "v", "A", "B").collect()[0]
    assert (r.d_scaled, r.ks_ppm) == (0, 0)
    assert r.at_value == 1  # smallest value wins the all-zero argmax


def test_ks_gate_missing_cohort_emits_nothing(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import profiling

    rows = [("k", "A", v) for v in [1, 2, 3]]
    df = spark.createDataFrame(rows, ["g", "grp", "v"])
    assert profiling.ks_gate(df, "g", "grp", "v", "A", "B").count() == 0


# ------------------------------------------------------- session depth


def test_session_depth_hist_counts_and_bounce(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import sessions

    base = 1_700_000_000
    rows = [
        # u1: one 3-event session
        (1, base, 1), (1, base + 60, 2), (1, base + 120, 3),
        # u2: two 1-event sessions (gap > 30 min)
        (2, base, 4), (2, base + 7200, 5),
        # u3: one 1-event session
        (3, base, 6),
    ]
    df = spark.createDataFrame(rows, ["u", "sec", "id"]).select(
        "u", F.col("sec").cast("timestamp").alias("ts"), "id"
    )
    out = {
        r.depth: (r.n_sessions, r.share_ppm)
        for r in sessions.session_depth_hist(
            df, "u", "ts", gap_minutes=30, tiebreak_col="id", max_depth=10
        ).collect()
    }
    assert out == {1: (3, 750_000), 3: (1, 250_000)}


# ------------------------------------------------- incremental ingest


def test_read_incremental_and_manifest(spark, tmp_path):
    from lab_etl_batch_data_processing_pipeline__spark.sources import (
        commit_manifest,
        read_incremental,
    )

    data = tmp_path / "landing"
    data.mkdir()
    manifest = str(tmp_path / "m.txt")
    df_a = spark.range(5).selectExpr("id", "id * 2 AS v")
    df_a.write.parquet(str(data / "b1"))
    got1, new1 = read_incremental(
        spark, str(data), manifest, schema=df_a.schema
    )
    assert got1.count() == 5 and len(new1) >= 1
    commit_manifest(manifest, new1)
    # nothing new -> empty frame, same schema
    got_none, new_none = read_incremental(
        spark, str(data), manifest, schema=df_a.schema
    )
    assert got_none.count() == 0 and new_none == []
    # second batch lands -> only its rows return
    spark.range(5, 8).selectExpr("id", "id * 2 AS v").write.parquet(
        str(data / "b2")
    )
    got2, new2 = read_incremental(
        spark, str(data), manifest, schema=df_a.schema
    )
    assert sorted(r.id for r in got2.collect()) == [5, 6, 7]
    commit_manifest(manifest, new2)
    # commit is idempotent / crash-safe: recommitting changes nothing
    commit_manifest(manifest, new2)
    got3, new3 = read_incremental(
        spark, str(data), manifest, schema=df_a.schema
    )
    assert new3 == []


# -------------------------------------------------------- reconciliation


def test_reconcile_totals_exact_and_mismatch(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import cleaning

    fact = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 50), (3, "B", 10)],
        ["k", "g", "total"],
    ).select("k", "g", F.col("total").cast("decimal(18,2)").alias("total"))
    lines = spark.createDataFrame(
        # k=1 reconciles (60+40), k=2 short by 5, k=3 has NO lines
        [(1, 60), (1, 40), (2, 45)],
        ["lk", "amt"],
    ).select("lk", F.col("amt").cast("decimal(18,2)").alias("amt"))
    out = {
        r.group: (r.n_facts, r.n_exact, r.n_mismatched, r.sum_abs_diff_micro)
        for r in cleaning.reconcile_totals(
            fact, lines, "k", "total", "amt",
            group_col="g", line_key_col="lk",
        ).collect()
    }
    assert out["A"] == (2, 1, 1, 5_000_000)       # k=2 off by 5.00
    assert out["B"] == (1, 0, 1, 10_000_000)      # line-less = full total


# ----------------------------------------------------- interval coverage


def test_interval_coverage_merges_and_gaps(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import ranges

    rows = [
        # [0,10) + [5,15) merge -> [0,15); [15,20) TOUCHES -> merges too
        ("k", 0, 10), ("k", 5, 15), ("k", 15, 20),
        # gap, then [30,40)
        ("k", 30, 40),
        # zero-length interval dropped (end <= start contract)
        ("k", 50, 50),
        # strictly inverted interval dropped too
        ("k", 60, 55),
    ]
    df = spark.createDataFrame(rows, ["g", "s", "e"])
    out = ranges.interval_coverage(df, "g", "s", "e").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_intervals, r.n_islands, r.covered, r.span, r.gap_total) == (
        4, 2, 30, 40, 10,
    )


# -------------------------------------------------------------- streaks


def test_event_streaks_runs_and_max(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import sessions

    rows = [
        (1, 1, 1, "a"), (1, 2, 2, "a"), (1, 3, 3, "b"), (1, 4, 4, "a"),
        (2, 1, 5, "a"), (2, 2, 6, "a"), (2, 3, 7, "a"),
    ]
    df = spark.createDataFrame(rows, ["u", "t", "id", "et"])
    out = {
        r.event_type: (r.n_events, r.n_runs, r.max_run_len)
        for r in sessions.event_streaks(df, "u", "t", "et", "id").collect()
    }
    # a: u1 runs [a,a],[a]; u2 run [a,a,a] -> 6 events, 3 runs, max 3
    assert out["a"] == (6, 3, 3)
    assert out["b"] == (1, 1, 1)
