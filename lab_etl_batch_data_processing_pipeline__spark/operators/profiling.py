"""Data-profiling helpers that feed partitioning decisions — the
pre-flight numbers SCALE.md's skew strategies (salting, AQE skew join)
act on."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew(
    df: DataFrame, cols: list[str], top_k: int = 20, round_to: int = 6
) -> DataFrame:
    """Heavy-hitter skew profile over ``cols``: the ``top_k`` heaviest
    keys as (key..., n_rows, share, rank, cum_share), heaviest first.
    rank 1's share IS the skew headline — a join/agg on this key set
    puts that fraction of all rows in one task without salting.

    Scale shape: the per-key count is the only edge-scale shuffle; the
    grand total comes back as a broadcast single-row aggregate (no
    second pass, no global window over ALL distinct keys — a
    high-cardinality key column would funnel its whole key set through
    one task otherwise); the ranking window runs after a distributed
    top-k limit, so it sees ``top_k`` rows at any input size.
    """
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    top = (
        counts.orderBy(F.desc("n_rows"), *cols)
        .limit(top_k)
        .crossJoin(F.broadcast(total))
    )
    w_rank = Window.partitionBy().orderBy(F.desc("n_rows"), *cols)
    return (
        top.select(
            *cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), round_to).alias("share"),
            F.row_number().over(w_rank).cast("int").alias("rank"),
            F.round(F.sum("n_rows").over(w_rank) / F.col("__total"), round_to).alias(
                "cum_share"
            ),
        )
        .orderBy("rank")
    )
