"""Range joins, expressed as bucketed equi-joins.

The reference has only equi-joins (SURVEY.md §2.3); interval/range
predicates ("right.ts between left.start and left.end") are a north-star
operator Spark lacks natively. A naive non-equi join compiles to
BroadcastNestedLoopJoin — O(|L|x|R|) comparisons, unusable beyond toy
sizes. The scalable form bucketizes the range: explode each left row into
one row per day bucket it covers, then equi-join on the bucket. Cost is
(avg range days) x |L| exploded rows and one hash shuffle — linear, AQE
handles hot-day skew, and Catalyst keeps pushdown/pruning on both scans.

For pair-explosive workloads (many right rows per bucket), pre-aggregate
the right side per bucket first and range-join the aggregates; see
``q_orders_shipped_7d`` in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BUCKET_COL = "_bucket_day"


def date_range_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    right_day_col: str,
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` rows whose ``right_day_col`` (DateType) falls in
    ``[left.start_col, left.end_col]`` (inclusive, DateType).

    Implemented as explode-to-day-buckets + equi-join: each left row
    becomes ``datediff(end, start) + 1`` rows keyed by day. Keep ranges
    bounded (days, not years) — the fan-out factor is the range length.

    Dirty ranges (end < start, e.g. swapped or corrupt dates) produce NO
    buckets: a bare ``sequence(start, end)`` would silently generate a
    DESCENDING day sequence and join the inverted interval, so the
    sequence is guarded to valid ranges (NULL otherwise). With an outer
    ``how`` the left row is preserved via explode_outer with NULL
    matches; with inner joins it simply drops.
    """
    seq = F.when(
        F.col(end_col) >= F.col(start_col),
        F.sequence(F.col(start_col), F.col(end_col)),
    )
    explode_fn = F.explode_outer if how in ("left", "left_outer", "full", "full_outer") else F.explode
    exploded = left.select("*", explode_fn(seq).alias(BUCKET_COL))
    joined = exploded.join(
        right, exploded[BUCKET_COL] == right[right_day_col], how
    )
    return joined.drop(BUCKET_COL)


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key interval-union analysis: merge overlapping/touching
    [start, end) intervals into islands and report how much of the
    key's span is actually covered — uptime from heartbeat leases,
    watch-time from play segments, staffed-time from shifts; the
    question a plain SUM(duration) answers WRONG whenever intervals
    overlap (it double-counts).

    Exact: starts/ends must already be integers (seconds/micros — the
    caller owns the unit); the island sweep is the classic running-max
    form — an interval starts a new island iff its start exceeds the
    max end seen so far (touching intervals, start == prev end, MERGE:
    half-open semantics) — computed with one ordered window; island
    membership then reduces per (key, island) and per key with integer
    sums. Zero-length and inverted intervals (end <= start) are
    dropped.

    Shape: one shuffle on key; the running-max window, the island
    running-sum and the final aggregates all share that partitioning —
    per-key serial cost is the key's interval count (the standing
    window-skew story).

    Returns (key, n_intervals, n_islands, covered, span, gap_total)
    sorted by key — ``covered`` is the union length, ``span`` is
    max end − min start, ``gap_total = span − covered``.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(start_col).cast("long").alias("__s"),
        F.col(end_col).cast("long").alias("__e"),
    ).filter(F.col("__e") > F.col("__s"))
    order = [F.col("__s").asc(), F.col("__e").asc()]
    w_prev = (
        Window.partitionBy("key").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    from lab_etl_batch_data_processing_pipeline__spark.operators.windows import (
        island_ids,
    )

    prev_max = F.max("__e").over(w_prev)
    flagged = island_ids(
        base.withColumn(
            "__new",
            F.when(
                prev_max.isNull() | (F.col("__s") > prev_max), 1
            ).otherwise(0),
        ),
        "key",
        order,
        "__new",
    )
    islands = flagged.groupBy("key", "__island").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("__s").alias("__is"),
        F.max("__e").alias("__ie"),
    )
    return (
        islands.groupBy("key")
        .agg(
            F.sum("__n").alias("n_intervals"),
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.col("__ie") - F.col("__is")).alias("covered"),
            (F.max("__ie") - F.min("__is")).alias("span"),
        )
        .withColumn("gap_total", F.col("span") - F.col("covered"))
        .orderBy("key")
    )
