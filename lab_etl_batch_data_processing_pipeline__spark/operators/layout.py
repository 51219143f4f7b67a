"""Physical-layout helpers.

``ensure_parallelism`` exists because a small parquet file arrives as ONE
input split, and any operator that does heavy per-row work *before* its
first shuffle (shingling, per-gram hashing, pair scoring against a
broadcast side) then runs serially no matter how many cores the cluster
has. At real scale inputs have thousands of splits and this is a no-op
(the partition check short-circuits); on small inputs it buys full-core
parallelism for one cheap round-robin shuffle of the raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``target`` partitions (default
    ``sparkContext.defaultParallelism``) — only if it has fewer."""
    try:
        sc = df.sparkSession.sparkContext
        goal = target or sc.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:
        # Spark Connect: no RDD/SparkContext access. Real at-scale inputs
        # arrive in many splits anyway (this helper only matters for tiny
        # local files), and an unconditional repartition would force a
        # full shuffle of a possibly-huge frame — so no-op instead.
        return df
    return df if n >= goal else df.repartition(goal)
