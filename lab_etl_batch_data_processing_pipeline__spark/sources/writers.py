"""Sinks (SURVEY.md §2.1 S4/S5), designed for idempotent re-runs.

The reference writes every output with ``mode("append")`` (helper_func.py:44),
so re-running a job silently duplicates rows. Here the default story is:

- parquet sink, partitioned by a date-derived column for the curated layer,
  with *dynamic partition overwrite* (session.py sets
  ``spark.sql.sources.partitionOverwriteMode=dynamic``): re-running a stage
  replaces exactly the partitions it recomputes.
- ``coalesce(1)`` is an explicit opt-in for small summary extracts only
  (the reference hard-codes it for every CSV write, helper_func.py:31 —
  a single reducer is a non-starter at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv_single_file(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Small-output convenience only (presentation-layer summary tables)."""
    df.coalesce(1).write.mode(mode).option("header", "true").csv(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> None:
    """JDBC sink (helper_func.py:36-45 parity; batchsize tuned, not default)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for key, value in (properties or {}).items():
        writer = writer.option(key, value)
    writer.save()


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table.

    Two tables bucketed the same way on the join key sort-merge-join with
    ZERO exchange on either side (verified in tests/test_plans.py) — the
    co-location technique for repeated fact-fact joins at 100 TB: pay the
    shuffle once at write time, never again per query. Bucketing requires
    the table-catalog write path (``saveAsTable``), not a bare path.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
