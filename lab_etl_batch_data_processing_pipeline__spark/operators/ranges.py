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

from pyspark.sql import DataFrame
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
