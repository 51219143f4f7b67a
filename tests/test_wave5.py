"""Unit tests for the fifth-wave behavioral-analytics operators:
cohort retention, RFM segmentation, Markov event transitions, session
top paths, Gini–Simpson diversity, and frequent 3-itemsets.

Each test pins the semantics on a small constructed frame (the oracle
rows pin full-scale value parity; these pin the RULES on inputs where
the expected output is hand-checkable)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lab_etl_batch_data_processing_pipeline__spark.operators import (
    joins,
    metrics,
    profiling,
    sessions,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- cohort


def test_cohort_retention_basic(spark):
    # u1 first active Jan, returns Mar; u2 first active Jan only;
    # u3 first active Feb, returns Mar twice (dedup to one active month).
    rows = [
        (1, _ts("2024-01-05")),
        (1, _ts("2024-03-09")),
        (2, _ts("2024-01-20")),
        (3, _ts("2024-02-02")),
        (3, _ts("2024-03-15")),
        (3, _ts("2024-03-28")),
    ]
    df = spark.createDataFrame(rows, ["u", "ts"])
    out = metrics.cohort_retention(df, "u", "ts").collect()
    got = {
        (str(r.cohort_month), r.months_since): (
            r.n_active,
            r.n_cohort,
            r.retention_ppm,
        )
        for r in out
    }
    assert got == {
        ("2024-01-01", 0): (2, 2, 1_000_000),
        ("2024-01-01", 2): (1, 2, 500_000),
        ("2024-02-01", 0): (1, 1, 1_000_000),
        ("2024-02-01", 1): (1, 1, 1_000_000),
    }


def test_cohort_retention_month_zero_is_full(spark):
    rows = [
        (u, _ts(f"2024-0{1 + (u % 3)}-05") + dt.timedelta(days=u))
        for u in range(1, 8)
    ]
    df = spark.createDataFrame(rows, ["u", "ts"])
    out = metrics.cohort_retention(df, "u", "ts").collect()
    zero = [r for r in out if r.months_since == 0]
    assert all(r.n_active == r.n_cohort for r in zero)
    assert all(r.retention_ppm == 1_000_000 for r in zero)


# ------------------------------------------------------------------- rfm


def test_rfm_segments_scores(spark):
    # 8 customers, engineered so quartiles are unambiguous: customer i
    # ordered (9-i) times of 100.00 each, most recent order i days
    # before the anchor (customer 1 = most recent, most orders, most
    # spend -> 444; customer 8 -> 111).
    rows = []
    for i in range(1, 9):
        for j in range(9 - i):
            rows.append(
                (i, _ts("2024-06-30") - dt.timedelta(days=i + j * 30), 100.0)
            )
    df = spark.createDataFrame(rows, ["u", "ts", "amt"])
    out = {r.user: r for r in metrics.rfm_segments(df, "u", "ts", "amt").collect()}
    assert out[1].r_score == 4 and out[1].f_score == 4 and out[1].m_score == 4
    assert out[1].rfm == 444
    assert out[8].rfm == 111
    # anchor = corpus max order date = customer 1's own last order
    assert out[1].recency_days == 0 and out[8].recency_days == 7
    assert out[1].frequency == 8 and out[1].monetary_cents == 8 * 100_00
    # 8 rows into 4 tiles -> exactly 2 per tile on every axis
    for axis in ("r_score", "f_score", "m_score"):
        counts = {}
        for r in out.values():
            counts[getattr(r, axis)] = counts.get(getattr(r, axis), 0) + 1
        assert counts == {1: 2, 2: 2, 3: 2, 4: 2}


def test_rfm_deterministic_under_repartition(spark):
    rows = [
        (i, _ts("2024-01-01") + dt.timedelta(days=i % 17), float(i * 7 % 31))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "amt"])
    a = metrics.rfm_segments(df, "u", "ts", "amt").collect()
    b = metrics.rfm_segments(df.repartition(7), "u", "ts", "amt").collect()
    assert a == b


# ----------------------------------------------------------- transitions


def test_event_transitions_counts_and_ppm(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
        (2, 5, "a"), (2, 6, "c"),
    ]
    df = spark.createDataFrame(rows, ["u", "sec", "t"]).withColumn(
        "ts", F.timestamp_seconds("sec")
    )
    out = sessions.event_transitions(df, "u", "ts", "t", tiebreak_col="sec")
    got = {(r.from_type, r.to_type): (r.n_transitions, r.p_ppm) for r in out.collect()}
    # a->b twice, a->c once (a total 3); b->a once (b total 1)
    assert got == {
        ("a", "b"): (2, 666_666),
        ("a", "c"): (1, 333_333),
        ("b", "a"): (1, 1_000_000),
    }


def test_event_transitions_row_totals(spark):
    rows = [
        (i % 5, i, "xyzvw"[i % 5] + str(i % 3)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["u", "sec", "t"]).withColumn(
        "ts", F.timestamp_seconds("sec")
    )
    out = sessions.event_transitions(df, "u", "ts", "t", tiebreak_col="sec").collect()
    # per from_type, sum of ppm is within (1e6 - n_rows, 1e6]
    from collections import defaultdict

    ppm = defaultdict(int)
    n = defaultdict(int)
    for r in out:
        ppm[r.from_type] += r.p_ppm
        n[r.from_type] += 1
    for k in ppm:
        assert 1_000_000 - n[k] < ppm[k] <= 1_000_000


# ------------------------------------------------------------- top paths


def test_top_paths_splits_on_gap_and_truncates(spark):
    # user 1: six events 10s apart (one session, path truncated to 5);
    # user 2: two events 2h apart (two single-event sessions).
    rows = (
        [(1, 100 + 10 * i, "e" + str(i)) for i in range(6)]
        + [(2, 0, "x"), (2, 7200, "y")]
    )
    df = spark.createDataFrame(rows, ["u", "sec", "t"])
    out = sessions.top_paths(
        df, "u", "sec", "t", gap_minutes=30, max_len=5, k=10,
        tiebreak_col="sec",
    ).collect()
    got = {r.path: r.n_sessions for r in out}
    assert got == {"e0>e1>e2>e3>e4": 1, "x": 1, "y": 1}


def test_top_paths_k_cut_is_deterministic(spark):
    rows = [(u, s * 10_000, "t" + str(u % 4)) for u in range(30) for s in range(2)]
    df = spark.createDataFrame(rows, ["u", "sec", "t"])
    a = sessions.top_paths(df, "u", "sec", "t", k=3, tiebreak_col="sec").collect()
    b = sessions.top_paths(
        df.repartition(11), "u", "sec", "t", k=3, tiebreak_col="sec"
    ).collect()
    assert a == b and len(a) == 3


# ------------------------------------------------------------- diversity


def test_categorical_diversity_bounds(spark):
    rows = (
        [(1, "only")] * 5
        + [(2, c) for c in "abcd"]          # uniform over 4
        + [(3, "a"), (3, "a"), (3, "b")]    # 2/3, 1/3
    )
    df = spark.createDataFrame(rows, ["k", "c"])
    out = {r.key: r for r in profiling.categorical_diversity(df, "k", "c").collect()}
    assert out[1].gini_ppm == 0 and out[1].n_categories == 1
    # uniform over 4: 1 - 4*(1/16) = 3/4
    assert out[2].gini_ppm == 750_000
    # 1 - (4+1)/9 = 4/9
    assert out[3].gini_ppm == 444_444
    assert out[3].n_rows == 3


# --------------------------------------------------------------- triples


def test_basket_triples_support(spark):
    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20), (2, 30), (2, 40),
        (3, 10), (3, 20),
        (3, 10),            # duplicate line: must dedup per basket
    ]
    df = spark.createDataFrame(rows, ["b", "i"])
    out = joins.basket_triples(df, "b", "i", min_support=2).collect()
    assert [(r.item_a, r.item_b, r.item_c, r.n_baskets) for r in out] == [
        (10, 20, 30, 2)
    ]


def test_basket_triples_within_basket_only(spark):
    # items co-occur pairwise across baskets but never as a triple
    rows = [(1, 10), (1, 20), (2, 20), (2, 30), (3, 10), (3, 30)]
    df = spark.createDataFrame(rows, ["b", "i"])
    assert joins.basket_triples(df, "b", "i", min_support=1).count() == 0


# --------------------------------------------------------------- k-means


def test_kmeans_deterministic_and_partition_invariant(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import clustering

    rows = [
        (i, [float((i * 7 + j * 3) % 11) / 11.0 - 0.4 for j in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a = clustering.kmeans_assign(df, "vec_id", "embedding", k=3, iters=2).collect()
    b = clustering.kmeans_assign(
        df.repartition(7), "vec_id", "embedding", k=3, iters=2
    ).collect()
    assert a == b
    assert {r.cluster for r in a} <= {0, 1, 2}
    assert len(a) == 40


def test_kmeans_zero_iters_is_nearest_seed(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import clustering

    # two tight groups around the first two ids; iters=0 assigns to the
    # nearest SEED vector (ids 0 and 1)
    rows = [(0, [0.0, 0.0]), (1, [0.5, 0.5]),
            (2, [0.01, 0.0]), (3, [0.49, 0.5])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.id: r.cluster for r in clustering.kmeans_assign(
        df, "vec_id", "embedding", k=2, iters=0
    ).withColumnRenamed("vec_id", "id").collect()}
    assert out == {0: 0, 1: 1, 2: 0, 3: 1}


def test_kmeans_seed_rows_have_zero_distance_at_init(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import clustering

    rows = [(i, [float(i), float(-i) / 3.0]) for i in range(6)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = clustering.kmeans_assign(df, "vec_id", "embedding", k=6, iters=0)
    assert all(r.dist_sq == 0 for r in out.collect())


# ------------------------------------------------------------ linear trend


def test_linear_trend_exact_slope(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import windows

    # y = 2*hours + 5 -> slope 2.0/hour -> 2_000_000 ppm (value units)
    rows = [(1, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), float(2 * h + 5))
            for h in range(10)]
    # negative slope key: y = -3*hours
    rows += [(2, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), float(-3 * h))
             for h in range(5)]
    # single point -> den 0 -> NULL
    rows += [(3, dt.datetime(2024, 1, 1), 7.0)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = {r.key: r for r in windows.linear_trend(df, "k", "ts", "v").collect()}
    assert out[1].slope_ppm == 2_000_000
    assert out[2].slope_ppm == -3_000_000
    assert out[3].slope_ppm is None and out[3].slope_den == 0
    assert out[1].n_obs == 10


def test_linear_trend_partition_invariant(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import windows

    rows = [(i % 4, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=17 * i),
             float((i * 13) % 29) - 7.0) for i in range(120)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    a = windows.linear_trend(df, "k", "ts", "v").collect()
    b = windows.linear_trend(df.repartition(9), "k", "ts", "v").collect()
    assert a == b


# ----------------------------------------------------------------- pareto


def test_revenue_pareto_head_rule(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import metrics

    # revenues 50, 30, 15, 5 (no discount): cum shares 50%, 80%, 95%, 100%
    rows = [(1, 50.0), (2, 30.0), (3, 15.0), (4, 5.0)]
    df = spark.createDataFrame(rows, ["e", "p"])
    out = metrics.revenue_pareto(df, "e", "p", None, top_frac_ppm=800_000)
    got = [(r.entity, r.rank, r.cum_cents, r.in_head) for r in out.collect()]
    # 80% boundary is inclusive: rank 2 cum = exactly 80% -> in head
    assert got == [
        (1, 1, 5000, True),
        (2, 2, 8000, True),
        (3, 3, 9500, False),
        (4, 4, 10000, False),
    ]


def test_revenue_pareto_discount_and_ties(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import metrics

    # equal revenues tie-break by entity asc; 10% discount applies
    rows = [(2, 100.0, 0.10), (1, 100.0, 0.10), (3, 10.0, 0.0)]
    df = spark.createDataFrame(rows, ["e", "p", "d"])
    out = metrics.revenue_pareto(df, "e", "p", "d").collect()
    assert [(r.entity, r.rank, r.revenue_cents) for r in out] == [
        (1, 1, 9000), (2, 2, 9000), (3, 3, 1000)
    ]


# ----------------------------------------------------------- active users


def test_rolling_active_users_windows(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import sessions as S

    d0 = dt.date(2024, 1, 1)
    rows = [
        (1, d0), (2, d0),                      # day 0: users 1,2
        (1, d0 + dt.timedelta(days=1)),        # day 1: user 1
        (3, d0 + dt.timedelta(days=8)),        # day 8: user 3 (day0/1 outside 7d)
    ]
    df = spark.createDataFrame(rows, ["u", "day"])
    out = {str(r.day): (r.n_active_1d, r.n_active_7d, r.n_active_28d)
           for r in S.rolling_active_users(df, "u", "day").collect()}
    assert out == {
        "2024-01-01": (2, 2, 2),
        "2024-01-02": (1, 2, 2),
        # day 8: 7d window covers days 2..8 -> only user 3; 28d covers all
        "2024-01-09": (1, 1, 3),
    }


def test_rolling_active_users_dedups_multiday_users(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import sessions as S

    d0 = dt.date(2024, 3, 1)
    # one user active 5 consecutive days: every WAU count must be 1
    rows = [(1, d0 + dt.timedelta(days=i)) for i in range(5)]
    df = spark.createDataFrame(rows, ["u", "day"])
    out = S.rolling_active_users(df, "u", "day", windows_days=(7,)).collect()
    assert all(r.n_active_7d == 1 for r in out) and len(out) == 5


# --------------------------------------------------- clustering coefficient


def test_clustering_coefficients_triangle_plus_tail(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import graph

    # triangle 1-2-3 plus pendant 3-4: node 3 has deg 3, 1 triangle ->
    # 2*1e6/(3*2) = 333_333; nodes 1,2 deg 2 -> 1e6; node 4 deg 1 -> 0
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], ["s", "d"]
    )
    out = {r.node: r for r in
           graph.clustering_coefficients(edges, "s", "d").collect()}
    assert out[1].coeff_ppm == 1_000_000 and out[2].coeff_ppm == 1_000_000
    assert out[3].coeff_ppm == 333_333 and out[3].degree == 3
    assert out[4].coeff_ppm == 0 and out[4].n_triangles == 0
    assert len(out) == 4


# ----------------------------------------------------------------- benford


def test_benford_gate_counts_and_exclusions(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import profiling

    rows = [(100.0,), (19.5,), (1.2,), (0.5,), (-3.0,), (None,), (900.0,)]
    df = spark.createDataFrame(rows, ["v"])
    out = {r.digit: r for r in profiling.benford_gate(df, "v").collect()}
    assert len(out) == 9
    assert out[1].n_obs == 3          # 100.0, 19.5, 1.2
    assert out[9].n_obs == 1          # 900.0
    assert out[2].n_obs == 0
    # 0.5, -3.0, None excluded -> total 4
    assert out[1].obs_ppm == 750_000 and out[9].obs_ppm == 250_000
    assert out[1].exp_ppm == 301_030
    assert out[1].dev_ppm == abs(750_000 - 301_030)


def test_benford_exp_constants_sum_to_one(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.profiling import (
        _BENFORD_PPM,
    )

    assert sum(_BENFORD_PPM.values()) == 1_000_000


# ------------------------------------------------------------ funnel timing


def test_funnel_timing_deltas(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import sessions as S

    def e(u, sec, k):
        return (u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec), k)

    rows = [
        e(1, 0, "view"), e(1, 10, "click"), e(1, 40, "buy"),
        e(2, 0, "view"), e(2, 30, "click"),          # never buys
        e(3, 5, "click"), e(3, 6, "view"),           # click before view: no hop
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "k"])
    out = {r.stage_idx: r for r in S.funnel_timing(
        df, "u", "ts", "k", ["view", "click", "buy"]
    ).collect()}
    assert out[1].n_users == 3 and out[1].sum_delta_sec is None
    # converting hops: u1 (10s), u2 (30s) -> sum 40, avg 20_000 ms
    assert out[2].n_users == 2 and out[2].sum_delta_sec == 40
    assert out[2].avg_delta_ms == 20_000
    assert out[3].n_users == 1 and out[3].sum_delta_sec == 30
    assert out[3].avg_delta_ms == 30_000


def test_funnel_timing_empty_stage_reports_zero(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import sessions as S

    rows = [(1, dt.datetime(2024, 1, 1), "view")]
    df = spark.createDataFrame(rows, ["u", "ts", "k"])
    out = {r.stage_idx: r for r in S.funnel_timing(
        df, "u", "ts", "k", ["view", "click"]
    ).collect()}
    assert out[2].n_users == 0
    assert out[2].sum_delta_sec is None and out[2].avg_delta_ms is None


# -------------------------------------------------------------- PIT join


def test_point_in_time_join_picks_valid_version(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import scd

    dim = spark.createDataFrame(
        [
            (1, "bronze", 100, 200, 1),
            (1, "silver", 200, 500, 2),
            (1, "gold", 500, None, 3),
            (2, "bronze", 300, None, 1),
        ],
        ["k", "state", "valid_from", "valid_to", "version"],
    )
    facts = spark.createDataFrame(
        [(1, 150, "a"), (1, 200, "b"), (1, 9999, "c"),
         (2, 250, "d"), (3, 400, "e")],
        ["k", "ts", "fid"],
    )
    out = {r.fid: (r.state, r.version) for r in
           scd.point_in_time_join(facts, dim, "k", "ts").collect()}
    assert out["a"] == ("bronze", 1)
    # boundary: ts == valid_to of v1 == valid_from of v2 -> v2 (half-open)
    assert out["b"] == ("silver", 2)
    assert out["c"] == ("gold", 3)
    # fact before key 2's first version -> NULLs
    assert out["d"] == (None, None)
    # unknown key -> NULLs, row preserved
    assert out["e"] == (None, None)
    assert len(out) == 5


# ------------------------------------------------- incremental aggregate


def test_incremental_agg_equals_full_recompute(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import scd

    snap = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 200), (3, "B", 300), (4, "B", 400)],
        ["k", "g", "cents"],
    )
    # update k=2 moving it A->B with a new value; delete k=3
    changes = spark.createDataFrame(
        [(2, "B", 250, 1, "U"), (3, "B", 300, 2, "D")],
        ["k", "g", "cents", "seq", "op"],
    )
    out = {r.g: (r.n_rows, r.sum_cents) for r in
           scd.incremental_agg_maintenance(
               snap, changes, ["k"], "seq", "g", F.col("cents").cast("long")
           ).collect()}
    # applied state: k1 (A,100), k2 (B,250), k4 (B,400)
    assert out == {"A": (1, 100), "B": (2, 650)}


def test_incremental_agg_drops_emptied_group(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import scd

    snap = spark.createDataFrame([(1, "A", 10), (2, "B", 20)], ["k", "g", "cents"])
    changes = spark.createDataFrame([(1, "A", 10, 1, "D")], ["k", "g", "cents", "seq", "op"])
    out = scd.incremental_agg_maintenance(
        snap, changes, ["k"], "seq", "g", F.col("cents").cast("long")
    ).collect()
    assert [(r.g, r.n_rows, r.sum_cents) for r in out] == [("B", 1, 20)]


# ------------------------------------------------------------------ k-core


def test_kcore_peels_cascade(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import graph

    # triangle 1-2-3 with a chain 3-4-5: k=2 peels 5 (deg 1), then 4
    # (deg drops to 1), leaving the triangle; all core degrees = 2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["s", "d"]
    )
    out = {r.node: r.core_degree for r in
           graph.kcore(edges, "s", "d", k=2, rounds=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_converged_output_is_stable(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import graph

    edges = spark.createDataFrame(
        [(i, j) for i in range(5) for j in range(i + 1, 5)], ["s", "d"]
    )  # K5: every node deg 4, nothing peels
    a = graph.kcore(edges, "s", "d", k=3, rounds=2).collect()
    b = graph.kcore(edges, "s", "d", k=3, rounds=5).collect()
    assert a == b and all(r.core_degree == 4 for r in a)


# --------------------------------------------------------- weighted median


def test_weighted_median_position_rule(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import profiling

    rows = [
        # key 1: values 10(w1), 20(w1), 30(w10) -> half=6 -> median 30
        (1, 10, 1), (1, 20, 1), (1, 30, 10),
        # key 2: uniform weights -> lower median of {1,2,3,4} = 2
        (2, 1, 1), (2, 2, 1), (2, 3, 1), (2, 4, 1),
        # key 3: all-zero weights -> NULL median, total 0
        (3, 5, 0),
    ]
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    out = {r.key: (r.total_weight, r.wmedian_s) for r in
           profiling.weighted_median(df, "k", "v", "w").collect()}
    assert out[1] == (12, 30)
    assert out[2] == (4, 2)
    assert out[3] == (0, None)


def test_weighted_median_partition_invariant(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import profiling

    rows = [(i % 3, (i * 7) % 50, (i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    a = profiling.weighted_median(df, "k", "v", "w").collect()
    b = profiling.weighted_median(df.repartition(13), "k", "v", "w").collect()
    assert a == b


# ------------------------------------------------------------ growth / hhi


def test_period_growth_ppm(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import metrics

    rows = [
        (dt.datetime(2024, 1, 10), 100.0),
        (dt.datetime(2024, 2, 10), 150.0),
        (dt.datetime(2024, 3, 10), 75.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "amt"])
    out = {str(r.month): (r.revenue_cents, r.growth_ppm) for r in
           metrics.period_growth(df, "ts", "amt").collect()}
    assert out["2024-01-01"] == (10000, None)
    assert out["2024-02-01"] == (15000, 500_000)     # +50%
    assert out["2024-03-01"] == (7500, -500_000)     # -50%


def test_concentration_hhi_bounds(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import metrics

    rows = (
        [("g1", i, 25.0) for i in range(4)]     # 4 equal -> 1e6/4
        + [("g2", 1, 99.0)]                      # monopoly -> 1e6
    )
    df = spark.createDataFrame(rows, ["g", "e", "amt"])
    out = {r.group: r for r in
           metrics.concentration_hhi(df, "g", "e", "amt").collect()}
    assert out["g1"].hhi_ppm == 250_000 and out["g1"].n_entities == 4
    assert out["g2"].hhi_ppm == 1_000_000


def test_incremental_agg_with_materialized_base(spark):
    """Steady-state form: passing the previously materialized view as
    base_agg must give the same result as the bootstrap form (and is
    what makes the refresh incremental)."""
    from lab_etl_batch_data_processing_pipeline__spark.operators import scd

    snap = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 200), (3, "B", 300)], ["k", "g", "cents"]
    )
    changes = spark.createDataFrame(
        [(2, "B", 250, 1, "U")], ["k", "g", "cents", "seq", "op"]
    )
    m = F.col("cents").cast("long")
    boot = scd.incremental_agg_maintenance(snap, changes, ["k"], "seq", "g", m)
    view = (
        snap.select(F.col("g"), m.alias("__m"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("__m").alias("sum_cents"))
    )
    steady = scd.incremental_agg_maintenance(
        snap, changes, ["k"], "seq", "g", m, base_agg=view
    )
    assert boot.collect() == steady.collect()


def test_kmeans_vectorized_path_handles_empty_partitions_and_matches_replica(spark):
    """r18 optimization pin: the Arrow mapInPandas assign/update path
    (clustering._partials_fn/_assign_fn) must (a) skip empty Arrow
    batches (more partitions than rows), and (b) reproduce the exact
    integer Lloyd rule set — verified against a sequential NumPy
    replica of the same fix-point arithmetic."""
    import numpy as np

    from lab_etl_batch_data_processing_pipeline__spark.operators import clustering

    rows = [
        (i, [float((i * 5 + j) % 9) / 9.0 - 0.3 for j in range(4)])
        for i in range(6)
    ]
    # 16 partitions >> 6 rows forces empty batches through the Python path
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(16)
    out, cents = clustering.kmeans_fit(
        df, "vec_id", "embedding", k=2, iters=2, scale=1 << 10, shift=1.0
    )
    got = {r.id: (r.cluster, r.dist_sq) for r in out.collect()}

    # sequential replica: same init (k smallest ids), same assign
    # (argmin, first-min tie = smallest cid), same update (sum // n)
    scale = 1 << 10
    X = np.array(
        [[round((x + 1.0) * scale) for x in v] for _, v in rows], dtype=np.int64
    )
    C = X[:2].copy()
    for _ in range(2):
        d2 = np.array([[int(((x - c) ** 2).sum()) for c in C] for x in X])
        cl = d2.argmin(axis=1)
        for j in range(2):
            m = cl == j
            if m.any():
                C[j] = X[m].sum(axis=0) // int(m.sum())
    d2 = np.array([[int(((x - c) ** 2).sum()) for c in C] for x in X])
    cl = d2.argmin(axis=1)
    want = {i: (int(cl[i]), int(d2[i, cl[i]])) for i in range(6)}
    assert got == want


def test_kmeans_assignment_schema_preserves_id_type(spark):
    """The vectorized final pass declares its schema dynamically: a
    non-long id column must survive with its own type."""
    from lab_etl_batch_data_processing_pipeline__spark.operators import clustering

    rows = [(i, [float(i % 3), float(i % 2)]) for i in range(5)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        F.col("vec_id").cast("int").alias("vec_id"), "embedding"
    )
    out = clustering.kmeans_assign(df, "vec_id", "embedding", k=2, iters=1)
    assert dict(out.dtypes)["id"] == "int"
    assert out.count() == 5
