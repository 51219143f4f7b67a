"""Approximate-sketch operators: accuracy pinned against exact results.

No DuckDB oracle (sketches are engine-specific by design); correctness is
relative-error bounds versus the exact aggregates on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark):
    df = spark.range(0, 20_000).selectExpr("cast(id % 7919 as long) AS k")
    exact = df.select(F.countDistinct("k")).first()[0]
    approx = df.select(F.approx_count_distinct("k", rsd=0.02)).first()[0]
    assert exact == 7919
    assert abs(approx - exact) / exact < 0.06  # 3x rsd headroom


def test_approx_percentile_close_to_exact(spark):
    df = spark.range(0, 10_000).selectExpr("cast(id as double) AS v")
    approx = df.select(
        F.percentile_approx("v", [0.25, 0.5, 0.75], 10_000).alias("p")
    ).first().p
    for got, want in zip(approx, [2500, 5000, 7500]):
        assert abs(got - want) <= 10  # accuracy param bounds rank error


def test_hll_sketch_merge_across_groups(spark):
    """hll_sketch_agg/hll_union_agg: partial sketches merge to the global
    estimate — the pattern for incremental distinct counts at 100 TB."""
    df = spark.range(0, 10_000).selectExpr(
        "cast(id % 1000 as long) AS k", "cast(id % 4 as int) AS part"
    )
    partials = df.groupBy("part").agg(F.hll_sketch_agg("k").alias("sk"))
    merged = partials.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()
    assert abs(merged.est - 1000) / 1000 < 0.05
