"""Enrichment operators: dimension joins + derived columns (SURVEY.md §2.2-2.3).

Reference parity:
- J1/J4 currency join + P3 derived USD amount
  (curated_tranformation.py:157-158, :201-202) -> :func:`convert_currency`.
  The rates side is always a bounded dimension, so it is *explicitly
  broadcast* — a broadcast hash join costs zero shuffle of the fact table,
  which at 100 TB is the difference between a map-only stage and a full
  exchange of the biggest table in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EXCHANGE_RATES, EXCHANGE_RATES_ROWS
from ..sources.readers import memory_table


def default_exchange_rates(spark: SparkSession) -> DataFrame:
    """The reference's literal 3-row rates dim (curated_tranformation.py:121-125).

    Production swaps in a maintained table; this is the documented fallback.
    """
    return memory_table(spark, EXCHANGE_RATES_ROWS, EXCHANGE_RATES)


def convert_currency(
    df: DataFrame,
    rates: DataFrame,
    amount_col: str,
    output_col: str,
    currency_col: str = "currency",
    drop_rate: bool = True,
) -> DataFrame:
    """Left-join a rates dimension and derive ``amount * usd_rate``.

    Left join: rows with an unknown currency survive with a NULL USD amount
    (same propagation the reference's left join produces). The multiply is
    a plain column expression -> stays in whole-stage codegen.
    """
    out = df.join(F.broadcast(rates), on=currency_col, how="left").withColumn(
        output_col, F.col(amount_col).cast("double") * F.col("usd_rate")
    )
    return out.drop("usd_rate") if drop_rate else out


def with_derived(df: DataFrame, **exprs: F.Column) -> DataFrame:
    """Attach derived columns; thin sugar over withColumns (single projection)."""
    return df.withColumns(dict(exprs))
