"""Slowly-changing-dimension (type 2) history building — the classic
warehouse-ETL operator family the reference's batch pipeline implies but
never implements: turn an event/snapshot stream of entity states into
versioned validity ranges.

Spark-first shape: everything is two window passes over ONE hash
partitioning (PARTITION BY the entity key), so the whole operator costs
a single shuffle — Catalyst reuses the exchange across window functions
with identical partitioning, and both passes stay in whole-stage
codegen. No joins, no iterative merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Compress a state stream into SCD2 validity ranges.

    Input: one row per observation (key, state, ts[, tiebreakers]).
    Output: one row per state CHANGE —
    (key, state, valid_from, valid_to, version, is_current), where
    valid_from/valid_to carry ``ts_col``'s type, valid_to is NULL for
    the open (current) version, version counts from 1 per key, and
    consecutive repeats of the same state collapse into their first
    observation (the change-data-capture convention: a dimension row is
    re-emitted only when something changed).

    ``order_cols`` break ties for observations sharing a timestamp
    (e.g. a monotonic event id) so the compression is deterministic at
    any parallelism.

    NULL states are first-class: the change test is null-safe
    (``eqNullSafe``, SQL's IS NOT DISTINCT FROM) and the first row is
    detected by position, not by ``prev IS NULL`` — so a NULL-state
    observation opens its own version instead of being silently dropped
    (and the following non-NULL row is no longer a spurious re-emit).
    """
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(key_col).orderBy(*order)
    changes = (
        df.select(key_col, state_col, ts_col, *order_cols)
        .withColumn("__prev_state", F.lag(state_col).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1)
            | ~F.col(state_col).eqNullSafe(F.col("__prev_state"))
        )
        .drop("__prev_state", "__rn")
    )
    # same partitioning + ordering as w: the exchange is reused, not re-shuffled
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        changes.select(
            F.col(key_col),
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w2).alias("valid_to"),
            F.row_number().over(w2).cast("int").alias("version"),
            F.lead(ts_col).over(w2).isNull().alias("is_current"),
        )
        .orderBy(key_col, "valid_from")
    )
