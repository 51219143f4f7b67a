from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lab_etl_batch_data_processing_pipeline__spark.operators import asof, skew


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 205), (3, "B", 50), (4, "C", 10)],
        "trade_id int, sym string, t long",
    )
    quotes = spark.createDataFrame(
        [
            ("A", 90, 10.0, 1),
            ("A", 100, 11.0, 2),   # exactly at trade 1's time -> visible
            ("A", 100, 12.0, 3),   # same ts, higher tiebreak wins
            ("A", 200, 13.0, 4),
            ("B", 60, 5.0, 5),     # after trade 3 -> not visible
        ],
        "sym string, t long, px double, qid int",
    )
    return trades, quotes


def test_asof_join_semantics(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r.trade_id: r
        for r in asof.asof_join(
            trades,
            quotes.select("sym", F.col("t").alias("qt"), "px", "qid"),
            on="sym",
            left_ts="t",
            right_ts="qt",
            right_tiebreak="qid",
        ).collect()
    }
    assert out[1].px_right == 12.0 and out[1].qid_right == 3  # at-or-before + tiebreak
    assert out[2].px_right == 13.0                 # latest earlier quote
    assert out[3].px_right is None                 # only later quotes exist
    assert out[4].px_right is None                 # no quotes for key at all
    assert len(out) == 4                           # every left row survives


def test_asof_join_is_deterministic(trades_quotes):
    trades, quotes = trades_quotes
    q = quotes.select("sym", F.col("t").alias("qt"), "px", "qid")

    def run():
        return sorted(
            map(
                str,
                asof.asof_join(
                    trades, q, on="sym", left_ts="t", right_ts="qt",
                    right_tiebreak="qid",
                ).collect(),
            )
        )

    assert run() == run()


def test_salted_agg_equals_direct_groupby(spark):
    df = spark.createDataFrame(
        [("x", 1.5)] * 500 + [("y", 2.0)] * 10 + [("z", -1.0)],
        "k string, v double",
    )
    direct = {
        r.k: (r.n, r.s)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("s"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n_rows, r.sum_v)
        for r in skew.salted_agg(df, ["k"], ["v"], salt=8).collect()
    }
    assert salted == direct
    assert salted["x"] == (500, 750.0)


def test_replicated_broadcast_join_matches_plain_join(spark):
    fact = spark.createDataFrame(
        [(1, "hot")] * 100 + [(2, "cold")], "id int, k string"
    )
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, label string")
    plain = sorted(
        (r.id, r.k, r.label) for r in fact.join(dim, "k", "left").collect()
    )
    skewed = sorted(
        (r.id, r.k, r.label)
        for r in skew.replicated_broadcast_join(fact, dim, "k", salt=4).collect()
    )
    assert skewed == plain


def test_zscore_applyinpandas_matches_window_form(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import (
        pandas_ops,
        windows,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 5.0), (5, "b", 5.0),
         (6, "c", 1.0)],
        "event_id long, k string, value double",
    )
    win = {
        r.event_id: r.zscore
        for r in windows.zscore_normalize(df, "k", "value", ["event_id"]).collect()
    }
    pdf = {
        r.event_id: r.zscore
        for r in pandas_ops.zscore_grouped(df, "k", "value", ["event_id"]).collect()
    }
    assert set(win) == set(pdf)
    for k in win:
        if win[k] is None:
            import math
            assert pdf[k] is None or math.isnan(pdf[k])  # zero-variance / singleton
        else:
            assert pdf[k] == pytest.approx(win[k], abs=1e-9)
    assert win[1] == -1.0 and win[3] == 1.0   # hand-checked group 'a'
    assert win[4] is None and win[6] is None  # zero variance, singleton


def test_bloom_semi_filter_no_false_negatives(spark):
    """Every key in the build set passes the probe; keys far outside
    mostly don't (with m=2^20 over 100 keys, a false positive in a
    200-key probe is ~impossible)."""
    from lab_etl_batch_data_processing_pipeline__spark.operators.joins import (
        bloom_filter_build,
        bloom_semi_filter,
    )

    keys = spark.range(100).withColumnRenamed("id", "k")
    words = bloom_filter_build(keys, "k")
    probe = spark.range(300).withColumnRenamed("id", "k")  # 100 in, 200 out
    kept = sorted(r.k for r in bloom_semi_filter(probe, "k", words).collect())
    assert kept[:100] == list(range(100))  # no false negatives
    assert len(kept) == 100  # no false positives at this density


def test_bloom_filter_build_is_m_bounded(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.joins import (
        bloom_filter_build,
    )

    words = bloom_filter_build(
        spark.range(50).withColumnRenamed("id", "k"), "k", m_bits=1 << 10, k=3
    )
    assert len(words) == (1 << 10) // 64
    assert sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in words) <= 150
