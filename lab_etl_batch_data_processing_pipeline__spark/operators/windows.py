"""Window-function operators: running totals, per-group normalization,
distribution summaries (engine extension; the reference's only window is
M7's LAG, SURVEY.md §2.5).

All single-shuffle: each operator hash-partitions once on its key and
computes every windowed column inside that partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_totals(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    amount_col: str,
) -> DataFrame:
    """Per-key cumulative sequence number and running amount sum.

    The running sum goes through DECIMAL so every prefix is exact —
    float prefix sums would drift differently per partition layout.
    """
    w_order = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.select(
        F.col(key_col),
        *[F.col(c) for c in order_cols],
        F.row_number().over(w_order).alias("seq"),
        F.round(
            F.sum(F.col(amount_col).cast("decimal(18,4)")).over(w_cum), 2
        )
        .cast("double")
        .alias("running_amount"),
    )


def zscore_normalize(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_cols: list[str],
    decimals: int = 4,
) -> DataFrame:
    """Per-group z-score of ``value_col`` ((v - mean) / sample stddev).

    Pure window form (codegen, one shuffle on the key). Groups with a
    single row or zero variance yield NULL (stddev undefined/zero).
    See pandas_ops.zscore_grouped for the applyInPandas twin.
    """
    w = Window.partitionBy(key_col)
    mean = F.avg(F.col(value_col)).over(w)
    std = F.stddev_samp(F.col(value_col)).over(w)
    return df.select(
        *[F.col(c) for c in id_cols],
        F.col(key_col),
        F.col(value_col),
        F.round(
            F.when(std != 0.0, (F.col(value_col) - mean) / std), decimals
        ).alias("zscore"),
    )
