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


def zorder_value(col_a, col_b, bits: int = 16):
    """Z-order (Morton) interleave of the low ``bits`` bits of two
    non-negative integer columns — the multi-dimensional clustering key
    behind Delta/Iceberg OPTIMIZE ZORDER, as a plain Column expression.

    Sorting (or range-partitioning) by z before a columnar write makes
    file/row-group min-max ranges narrow on BOTH dimensions at once, so
    a point/range predicate on EITHER column prunes most files at scan
    time — where a single-column sort only prunes its own column. Pure
    integer bit arithmetic (2*bits result bits, literal shift amounts
    only, so the whole key is one codegen'd expression), bit-for-bit
    reproducible on any engine.
    """
    from pyspark.sql import functions as F

    a = col_a.cast("long")
    b = col_b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Cluster-then-write: range-partition by the z-value into
    ``n_files`` and sort within each, so every output parquet file
    covers a compact z-range — i.e. a small rectangle in (col_a, col_b)
    space — and its footer min/max statistics prune scans on EITHER
    column (receipt in SCALE.md: file-level ranges vs the unclustered
    write).

    The z column is dropped before writing; it is a layout key, not
    data. repartitionByRange samples the z distribution, so files are
    balanced even when the dimensions are skewed.
    """
    from pyspark.sql import functions as F

    z = zorder_value(F.col(col_a), F.col(col_b), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
