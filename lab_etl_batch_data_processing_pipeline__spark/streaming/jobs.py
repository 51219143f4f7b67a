"""Streaming variants of the batch pipeline stages.

Batch operators in this engine are pure DataFrame transforms, so they
apply unchanged to streaming DataFrames; what streaming adds is source
wiring, watermarks, and output mode. These functions capture those
decisions. (Event-time windowed aggregation replaces the batch
``date_trunc`` grouping; late rows beyond the watermark are dropped.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_bookings_ingest(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "csv",
    header: bool = True,
) -> DataFrame:
    """File-source stream over a raw landing directory (Bronze ingest).

    Schema must be declared — streaming readers cannot infer. Each
    micro-batch picks up newly landed files; this is the streaming twin of
    sources.readers.read_csv.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", str(header).lower())
    return reader.load(path)


def streaming_bookings_per_window(
    bookings: DataFrame,
    time_col: str,
    window_duration: str = "7 days",
    watermark_delay: str = "1 day",
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """Streaming counterpart of metrics.popular_locations_weekly's time
    grouping: event-time tumbling window count with a watermark bound on
    state. Emits (window_start, total_bookings); append output mode once
    the watermark passes the window end.
    """
    df = bookings
    if status_col:
        df = df.filter(F.col(status_col) == confirmed_value)
    return (
        df.withWatermark(time_col, watermark_delay)
        .groupBy(F.window(F.col(time_col), window_duration).alias("w"))
        .agg(F.count(F.lit(1)).alias("total_bookings"))
        .select(F.col("w.start").alias("window_start"), "total_bookings")
    )
