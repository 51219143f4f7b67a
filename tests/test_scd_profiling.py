"""SCD2 history (operators/scd.py) and skew profiling
(operators/profiling.py) unit semantics."""

from __future__ import annotations

from lab_etl_batch_data_processing_pipeline__spark.operators import profiling, scd


def test_scd2_compresses_repeats_and_versions(spark):
    df = spark.createDataFrame(
        [
            # user 1: A, A (repeat -> collapsed), B, A again (new version)
            (1, "A", 10, 100),
            (1, "A", 20, 101),
            (1, "B", 30, 102),
            (1, "A", 40, 103),
            # user 2: single state stays open
            (2, "X", 15, 104),
        ],
        "user_id long, state string, ts long, event_id long",
    )
    out = scd.scd2_history(df, "user_id", "state", "ts", ("event_id",)).collect()
    rows = [
        (r.user_id, r.state, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in out
    ]
    assert rows == [
        (1, "A", 10, 30, 1, False),
        (1, "B", 30, 40, 2, False),
        (1, "A", 40, None, 3, True),
        (2, "X", 15, None, 1, True),
    ]


def test_scd2_tiebreak_is_deterministic(spark):
    # two observations share ts=10: event_id orders them, so the state
    # stream is B(1), A(2) -> two versions, deterministic at any parallelism
    df = spark.createDataFrame(
        [(1, "B", 10, 1), (1, "A", 10, 2)],
        "user_id long, state string, ts long, event_id long",
    )
    out = scd.scd2_history(df, "user_id", "state", "ts", ("event_id",)).collect()
    assert [(r.state, r.version) for r in out] == [("B", 1), ("A", 2)]


def test_scd2_single_shuffle(spark):
    """Both window passes must share one user_id exchange."""
    df = spark.createDataFrame(
        [(1, "A", 10, 1)], "user_id long, state string, ts long, event_id long"
    )
    out = scd.scd2_history(df, "user_id", "state", "ts", ("event_id",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hashpartitioning exchange for the windows + the final range sort
    n_hash = plan.count("hashpartitioning")
    assert n_hash == 1, f"expected one window exchange, got {n_hash}:\n{plan}"


def test_key_skew_profile(spark):
    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 6 + ["b"] * 3 + ["c"] * 1],
        "k string",
    )
    out = profiling.key_skew(df, ["k"], top_k=2).collect()
    assert [(r.k, r.n_rows, r.share, r.rank, r.cum_share) for r in out] == [
        ("a", 6, 0.6, 1, 0.6),
        ("b", 3, 0.3, 2, 0.9),  # share denominators include the cut "c"
    ]


def test_scd2_null_states_are_versions_not_dropped(spark):
    """A NULL-state observation opens its own version (null-safe change
    test); the following non-NULL row is a real change, and a repeat
    after a NULL of the pre-NULL state is still a new version."""
    df = spark.createDataFrame(
        [
            (1, "A", 10, 100),
            (1, None, 20, 101),   # NULL state: its own version
            (1, None, 30, 102),   # repeat NULL: collapsed
            (1, "A", 40, 103),    # back to A: new version, not a re-emit
            # user 2 STARTS with NULL: first row kept by position
            (2, None, 15, 104),
            (2, "X", 25, 105),
        ],
        "user_id long, state string, ts long, event_id long",
    )
    out = scd.scd2_history(df, "user_id", "state", "ts", ("event_id",)).collect()
    rows = [
        (r.user_id, r.state, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in out
    ]
    assert rows == [
        (1, "A", 10, 20, 1, False),
        (1, None, 20, 40, 2, False),
        (1, "A", 40, None, 3, True),
        (2, None, 15, 25, 1, False),
        (2, "X", 25, None, 2, True),
    ]


def test_resample_ffill_semantics(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.windows import (
        resample_ffill,
    )

    rows = [
        # user 1: obs at t=5 (v=1.0), t=25 (v=2.0) -> grid 0..20 step 10
        (1, 5.0, 1.0, 100),
        (1, 25.0, 2.0, 101),
        # same-tick tie at t=5: higher event_id wins
        (1, 5.0, 9.0, 102),
        # user 2: single obs
        (2, 13.0, 7.0, 103),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts double, value double, event_id long")
    out = resample_ffill(
        df, "user_id", "ts", "value", interval_seconds=10, tiebreak_col="event_id"
    ).collect()
    got = {(r.key, r.tick_ts): (r.value, r.is_observed) for r in out}
    assert got == {
        (1, 0): (9.0, True),    # tie -> event_id 102's value
        (1, 10): (9.0, False),  # gap forward-fills
        (1, 20): (2.0, True),
        (2, 10): (7.0, True),
    }


def test_histogram_edges_and_degenerate(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.profiling import (
        histogram,
    )
    import pytest

    df = spark.createDataFrame(
        [(0.0,), (5.0,), (10.0,), (10.0,), (None,)], "v double"
    )
    out = histogram(df, "v", n_bins=2).collect()
    rows = [(r.bin, r.lo, r.hi, r.n_rows) for r in out]
    # max lands in the LAST bin (closed top edge); NULL excluded
    assert rows == [(0, 0.0, 5.0, 1), (1, 5.0, 10.0, 3)]

    # empty bins still emitted
    sparse = spark.createDataFrame([(0.0,), (100.0,)], "v double")
    out2 = histogram(sparse, "v", n_bins=4).collect()
    assert [r.n_rows for r in out2] == [1, 0, 0, 1]

    # degenerate min==max -> one bin
    const = spark.createDataFrame([(3.0,), (3.0,)], "v double")
    out3 = histogram(const, "v", n_bins=5).collect()
    assert len(out3) == 1 and out3[0].n_rows == 2

    with pytest.raises(ValueError, match="no non-NULL"):
        histogram(spark.createDataFrame([(None,)], "v double"), "v")


def test_resample_ffill_chunked_matches_plain(spark):
    """The grid-chunked skew variant (chunk_ticks=N) must equal the plain
    per-key-window form row-for-row — including observations falling in
    different chunks (carry-in), multi-chunk gaps (carry skips empty
    chunks), leading gaps (stay NULL across chunk boundaries), and
    same-tick ties."""
    from lab_etl_batch_data_processing_pipeline__spark.operators.windows import (
        resample_ffill,
    )

    rows = [
        # key 1: obs in tick 0 and tick 9 -> 8 consecutive gap ticks
        # spanning several 3-tick chunks (carry through empty chunks)
        (1, 2.0, 1.0, 1),
        (1, 95.0, 2.0, 2),
        # key 1 same-tick tie (event 3 wins)
        (1, 2.5, 9.0, 3),
        # key 2: starts mid-grid in chunk 1 (leading-gap + carry-in)
        (2, 31.0, 5.0, 4),
        (2, 74.0, 6.0, 5),
        # key 3: single observation exactly on a chunk boundary
        (3, 30.0, 7.0, 6),
        (3, 99.0, 8.0, 7),
        # key 4: NULL-valued observation at the END of a chunk must not
        # erase the chunk's earlier value from the cross-chunk carry
        # (the plain form's last(ignorenulls) skips it)
        (4, 2.0, 5.0, 8),
        (4, 15.0, None, 9),
        (4, 95.0, 6.0, 10),
    ]
    df = spark.createDataFrame(
        rows, "k long, ts double, v double, eid long"
    )
    plain = resample_ffill(
        df, "k", "ts", "v", interval_seconds=10, tiebreak_col="eid"
    ).collect()
    for n in (1, 3, 100):  # chunk sizes below/at/above every key's grid
        chunked = resample_ffill(
            df, "k", "ts", "v", interval_seconds=10, tiebreak_col="eid",
            chunk_ticks=n,
        ).collect()
        assert [tuple(r) for r in chunked] == [tuple(r) for r in plain], n


def test_apply_changelog_semantics(spark):
    """MERGE semantics: highest seq wins per key, deletes remove the
    key, upserts replace the row, untouched keys keep the snapshot row,
    and a change for a NEW key inserts it."""
    from lab_etl_batch_data_processing_pipeline__spark.operators.scd import apply_changelog

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 11.0, 1, "U"),  # update...
            (1, "a3", 12.0, 2, "U"),  # ...superseded by higher seq
            (2, "b", 20.0, 1, "D"),   # delete key 2
            (4, "d", 40.0, 1, "I"),   # insert new key
            (3, "x", 0.0, 1, "D"),    # delete then...
            (3, "c2", 31.0, 2, "U"),  # ...reinsert with higher seq
        ],
        "k long, s string, v double, seq int, op string",
    )
    out = sorted(
        tuple(r) for r in apply_changelog(snap, changes, ["k"], "seq").collect()
    )
    assert out == [(1, "a3", 12.0), (3, "c2", 31.0), (4, "d", 40.0)]


def test_apply_changelog_orderable_seq_types(spark):
    """seq_col keeps its own type — an ISO-8601 string or timestamp CDC
    ordering must work (a silent long cast would NULL it out and make
    the winner arbitrary)."""
    from lab_etl_batch_data_processing_pipeline__spark.operators.scd import apply_changelog

    snap = spark.createDataFrame([(1, "a")], "k long, s string")
    ch = spark.createDataFrame(
        [
            (1, "b", "2026-08-14T10:00:00Z", "U"),
            (1, "c", "2026-08-14T11:00:00Z", "U"),
        ],
        "k long, s string, seq string, op string",
    )
    assert [tuple(r) for r in apply_changelog(snap, ch, ["k"], "seq").collect()] == [
        (1, "c")
    ]


def test_stratified_sample_exact_and_correlations(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.cleaning import (
        stratified_sample_exact,
    )
    from lab_etl_batch_data_processing_pipeline__spark.operators.profiling import (
        numeric_correlations,
    )
    import pytest

    df = spark.createDataFrame(
        [(i, "s" + str(i % 3), float(i), float(2 * i), float(-i)) for i in range(60)],
        "id long, stratum string, x double, y double, z double",
    )
    out = stratified_sample_exact(df, ["stratum"], "id", 5)
    counts = {r.stratum: r.n for r in out.groupBy("stratum").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert counts == {"s0": 5, "s1": 5, "s2": 5}
    # deterministic: same call -> same rows; new salt -> (almost surely) different draw
    again = stratified_sample_exact(df, ["stratum"], "id", 5)
    assert sorted(r.id for r in out.collect()) == sorted(r.id for r in again.collect())
    salted = stratified_sample_exact(df, ["stratum"], "id", 5, salt="v2")
    assert sorted(r.id for r in salted.collect()) != sorted(r.id for r in out.collect())
    # small stratum survives whole
    tiny = stratified_sample_exact(df.filter("id < 2"), ["stratum"], "id", 5)
    assert tiny.count() == 2

    corr = {(r.col_a, r.col_b): r.pearson_r for r in
            numeric_correlations(df, ["x", "y", "z"]).collect()}
    assert corr[("x", "y")] == 1.0 and corr[("x", "z")] == -1.0 and corr[("y", "z")] == -1.0
    with pytest.raises(ValueError, match="two columns"):
        numeric_correlations(df, ["x"])


def test_ewma_hand_computed(spark):
    """3 events for one user, scale 256, 8-row frame: weights 2^i oldest
    first, den = 2^m - 1 — checked against hand arithmetic."""
    from lab_etl_batch_data_processing_pipeline__spark.operators.windows import ewma

    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0), (1, 3, 4.0)], ["uid", "seq", "v"]
    )
    rows = {r.seq: r for r in ewma(df, "uid", ["seq"], "v").collect()}
    # seq1: arr=[256], num=256*1, den=1
    assert (rows[1].ewma_num, rows[1].ewma_den) == (256, 1)
    # seq2: arr=[256,512], num=256+512*2=1280, den=3
    assert (rows[2].ewma_num, rows[2].ewma_den) == (1280, 3)
    # seq3: arr=[256,512,1024], num=256+1024+4096=5376, den=7
    assert (rows[3].ewma_num, rows[3].ewma_den) == (5376, 7)
    assert rows[3].ewma_ppm == int(1_000_000.0 * 5376 / 7)
    assert rows[3].n_in_window == 3


def test_ewma_frame_caps_at_window_rows(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.windows import ewma

    df = spark.createDataFrame(
        [(1, i, 1.0) for i in range(12)], ["uid", "seq", "v"]
    )
    out = ewma(df, "uid", ["seq"], "v", window_rows=4).collect()
    assert max(r.n_in_window for r in out) == 4
    for r in out:
        # constant 1.0 input -> ewma == 256/256 == 1.0 at any frame size
        assert r.ewma_num == 256 * r.ewma_den
        assert r.ewma_ppm == 1_000_000 * 256


def test_resample_interpolate_exact_and_truncating(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.windows import (
        resample_interpolate,
    )

    rows = [
        # user 1: anchors v=1.0 @ tick 0 and v=5.0 @ tick 40 -> the three
        # gap ticks divide exactly (step 1.0/tick at scale 1024)
        (1, 5.0, 1.0, 100),
        (1, 45.0, 5.0, 101),
        # user 2: 1.0 -> 2.0 over 3 ticks -> non-exact thirds, truncated
        (2, 5.0, 1.0, 102),
        (2, 35.0, 2.0, 103),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts double, value double, event_id long"
    )
    out = resample_interpolate(
        df, "user_id", "ts", "value", interval_seconds=10,
        scale=1024, tiebreak_col="event_id",
    ).collect()
    got = {(r.key, r.tick_ts): (r.value_s, r.is_observed) for r in out}
    assert got == {
        (1, 0): (1024, True),
        (1, 10): (2048, False),   # (1024*30 + 5120*10) div 40
        (1, 20): (3072, False),
        (1, 30): (4096, False),
        (1, 40): (5120, True),
        (2, 0): (1024, True),
        (2, 10): (1365, False),   # 40960 div 30 truncates
        (2, 20): (1706, False),   # 51200 div 30 truncates
        (2, 30): (2048, True),
    }


def test_conversion_funnel_anchor_rules(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.sessions import (
        conversion_funnel,
    )

    rows = [
        # u1 completes the funnel in order
        (1, 10.0, "view"), (1, 20.0, "click"), (1, 30.0, "purchase"),
        # u2: click BEFORE the first view never anchors stage 2; the
        # later purchase cannot count without a stage-2 anchor
        (2, 5.0, "click"), (2, 10.0, "view"), (2, 50.0, "purchase"),
        # u3: click at the SAME ts as the view -> strict > doesn't chain
        (3, 10.0, "view"), (3, 10.0, "click"), (3, 20.0, "purchase"),
        # u4: purchase before the first qualifying click -> stops at click
        (4, 10.0, "view"), (4, 15.0, "click"), (4, 12.0, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts double, event_type string")
    out = conversion_funnel(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()
    assert [(r.stage_idx, r.stage, r.n_users) for r in out] == [
        (1, "view", 4),
        (2, "click", 2),
        (3, "purchase", 1),
    ]


def test_rank_stats_family(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.windows import (
        rank_stats,
    )

    df = spark.createDataFrame(
        [(1, "A", 10.0), (2, "A", 20.0), (3, "A", 20.0), (4, "A", 30.0)],
        "id long, part string, v double",
    )
    out = {
        r.id: (r.bucket, r.pct_rank, r.cume_dist, r.dense_rank)
        for r in rank_stats(df, "part", ["v", "id"], n_tiles=4).collect()
    }
    # total order (v, id): 10/1, 20/2, 20/3, 30/4
    assert out == {
        1: (1, 0.0, 0.25, 1),
        2: (2, 1 / 3, 0.5, 2),
        3: (3, 2 / 3, 0.75, 3),
        4: (4, 1.0, 1.0, 4),
    }


def test_ntile_from_grank_bounds(spark):
    """n_tiles < 1 must fail fast (both directions): F.ntile raised on
    it, and the interpolated closed form would otherwise produce
    silent NULL buckets via '% 0' under non-ANSI SQL; n_tiles = 1 (the
    lower bound) stays a valid single bucket."""
    import pytest

    from lab_etl_batch_data_processing_pipeline__spark.operators import windows

    for bad in (0, -3):
        with pytest.raises(ValueError, match="n_tiles"):
            windows.ntile_from_grank(bad)
    df = spark.createDataFrame([(1, "A", 1.0), (2, "A", 2.0)],
                               "id long, part string, v double")
    out = windows.rank_stats(df, "part", ["v", "id"], n_tiles=1)
    assert {r.bucket for r in out.collect()} == {1}


def test_mad_outliers_lower_median(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.profiling import (
        mad_outliers,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
         ("b", 5.0), ("b", 5.0)],
        "k string, v double",
    )
    out = {r.key: (r.n_rows, r.med_s, r.mad_s, r.n_outliers)
           for r in mad_outliers(df, "k", "v", scale=1, k=3).collect()}
    # a: med = 3 (3rd of 5); devs sorted 0,1,1,2,97 -> mad = 1; 97 > 3
    # b: med = 5, devs 0,0 -> mad 0; nothing exceeds 0*3? 0 > 0 false
    assert out == {"a": (5, 3, 1, 1), "b": (2, 5, 0, 0)}


def test_basket_pairs_support_and_dedup(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.joins import (
        basket_pairs,
    )

    rows = [
        (1, 10), (1, 20), (1, 30), (1, 10),   # dup item counts once
        (2, 10), (2, 20),
        (3, 10), (3, 30),
    ]
    df = spark.createDataFrame(rows, "basket long, item long")
    out = {(r.item_a, r.item_b): r.n_baskets
           for r in basket_pairs(df, "basket", "item", min_support=2).collect()}
    # (10,20) in baskets 1+2; (10,30) in 1+3; (20,30) only basket 1 -> pruned
    assert out == {(10, 20): 2, (10, 30): 2}


def test_time_weighted_avg_exact(spark):
    import datetime as dt

    from lab_etl_batch_data_processing_pipeline__spark.operators.windows import (
        time_weighted_avg,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1.0, 100),
        (1, t0 + dt.timedelta(seconds=10), 3.0, 101),
        (1, t0 + dt.timedelta(seconds=30), 2.0, 102),
        (2, t0, 7.0, 103),                    # single obs -> den 0, ppm NULL
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, value double, event_id long"
    )
    out = {r.key: (r.n_obs, r.twap_num, r.twap_den, r.twap_ppm)
           for r in time_weighted_avg(
               df, "user_id", "ts", "value", scale=4, tiebreak_col="event_id"
           ).collect()}
    # v_s = 4, 12, 8; dt_ms = 10000, 20000, 0
    # num = 4*10000 + 12*20000 = 280000; den = 30000
    assert out[1] == (3, 280000, 30000, 9333333)
    assert out[2] == (1, 0, 0, None)


def test_rank_family_rewrite_keeps_output_schemas(spark):
    """The r17 two-phase rank rewrite must not move output dtypes: the
    driver's schema compare (and every downstream consumer) saw the
    window-function types (ntile/row_number -> int, percent_rank/
    cume_dist -> double, sums -> long), so the closed forms pin them."""
    from pyspark.sql import functions as F

    from lab_etl_batch_data_processing_pipeline__spark.operators import (
        metrics,
        windows,
    )

    df = spark.createDataFrame(
        [("a", 3, 1), ("a", 2, 2), ("b", 1, 3)], "part string, v int, id int"
    )
    rs = windows.rank_stats(df, "part", ["v", "id"], n_tiles=2)
    assert dict(rs.dtypes)["bucket"] == "int"
    assert dict(rs.dtypes)["pct_rank"] == "double"
    assert dict(rs.dtypes)["cume_dist"] == "double"
    assert dict(rs.dtypes)["dense_rank"] == "int"

    rfm = metrics.rfm_segments(
        spark.createDataFrame(
            [(1, "2024-01-02", 10.0), (2, "2024-02-03", 5.0)],
            "u int, ts string, amt double",
        ),
        "u",
        F.to_timestamp("ts"),
        "amt",
    )
    d = dict(rfm.dtypes)
    assert d["r_score"] == d["f_score"] == d["m_score"] == d["rfm"] == "int"
    assert d["monetary_cents"] == "bigint"

    par = metrics.revenue_pareto(
        spark.createDataFrame([("x", 10.0), ("y", 5.0)], "e string, p double"),
        "e",
        "p",
    )
    d = dict(par.dtypes)
    assert d["rank"] == "int"
    assert d["cum_cents"] == "bigint"
    assert d["in_head"] == "boolean"
