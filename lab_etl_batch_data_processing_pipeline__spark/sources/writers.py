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
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
) -> None:
    """Parquet sink with optional data-skipping layout control.

    Parquet min/max stats only prune files/row groups when values are
    CLUSTERED; a shuffled write leaves every file spanning the full key
    range, so predicates scan everything. Two layout knobs:

    - ``cluster_by``: range-repartition on the keys then sort within
      each output task (the CLUSTER BY of warehouse DDL) — one extra
      shuffle at write time buys file-level range disjointness, so a
      point/range predicate skips whole files at read time. The receipt
      (tests/test_sources_multimodal_streaming.py) reads footer stats
      and asserts per-row-group ranges are narrow slices of the domain.
    - ``sort_by``: sortWithinPartitions only (shuffle-free) — use when
      the frame is already partitioned usefully (e.g. post-aggregate)
      and only intra-file row-group ordering is wanted.

    At 100 TB this is the difference between scanning a file and
    skipping it."""
    if cluster_by:
        df = df.repartitionByRange(*cluster_by).sortWithinPartitions(*cluster_by)
    elif sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink (zlib default) — the interchange twin of write_parquet
    for ORC-standardized estates; same idempotent-overwrite defaults."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


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


def upsert_parquet(
    spark,
    path: str,
    updates: DataFrame,
    keys: list[str],
    version_col: str,
    partition_by: list[str] | None = None,
) -> None:
    """Key-based upsert into a parquet dataset — the operational fix for
    the reference's blind ``mode("append")`` re-run duplication
    (helper_func.py:44): applying the same batch twice yields the same
    dataset.

    Merge rule: latest ``version_col`` per ``keys`` wins (ties keep the
    incoming row, so replays are idempotent). With ``partition_by``, the
    merge reads ONLY the partitions the update batch touches (a
    partition-values IN filter the scan prunes on) and dynamic partition
    overwrite rewrites exactly those — update cost scales with the
    touched slice, not the dataset.

    Caveat (standard for Hive-style partition upserts): a key whose
    partition VALUE changes in the update leaves its old row in the old
    partition; route such migrations through a full rewrite.
    """
    import os

    from pyspark.sql import Window

    if not os.path.isdir(path):
        write_parquet(updates, path, partition_by=partition_by)
        return
    existing = spark.read.parquet(path)
    if partition_by:
        touched = [
            tuple(r[c] for c in partition_by)
            for r in updates.select(*partition_by).distinct().collect()
        ]
        cond = F.struct(*[F.col(c) for c in partition_by]).isin(
            [F.struct(*[F.lit(v) for v in t]) for t in touched]
        )
        existing = existing.filter(cond)
    merged = (
        existing.select(updates.columns)
        .withColumn("__upd", F.lit(0))
        .unionByName(updates.withColumn("__upd", F.lit(1)))
        .withColumn(
            "__rn",
            F.row_number().over(
                # __upd breaks version ties toward the INCOMING row, so
                # the survivor is deterministic (replays included) at any
                # parallelism — bare desc(version) ties are arbitrary
                Window.partitionBy(*keys).orderBy(
                    F.desc(version_col), F.desc("__upd")
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__upd")
    )
    # Dynamic partition overwrite pinned PER WRITE: only partitions
    # present in `merged` are replaced. This must NOT rely on the
    # session-level conf (session.py sets it, but the driver's vanilla
    # session does not — under the STATIC default this overwrite would
    # silently wipe every untouched partition; caught by a cold-cache
    # vanilla oracle run in r9).
    writer = merged.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> dict:
    """Small-file compaction — the operational hygiene job every
    streaming sink / micro-batch upsert target eventually needs: tiny
    part-files multiply task-scheduling and footer-read overhead until
    scans are metadata-bound, so periodically rewrite the dataset into
    ~``target_file_bytes`` files.

    Shape: target file count = ceil(on-disk bytes / target) (compressed
    size is the practical proxy), one round-robin ``repartition`` write
    to a temp sibling, then an atomic-on-local-FS directory swap — the
    dataset is never half-compacted in place, and Spark never overwrites
    the directory it is reading. On an object store, swap via a metadata
    catalog (Delta/Iceberg commit) instead of rename — the compaction
    plan itself is identical.

    ``partition_by`` preserves a hive-partitioned layout: rows are
    repartitioned BY the partition columns (so each task holds whole
    partition values and writes one file per value it owns) and written
    back partitioned. Without it, a partitioned input compacts to a
    FLAT layout — the partition column survives as data, but directory
    pruning is lost; pass the partition columns when readers rely on it.

    Returns {"files_before", "files_after", "total_bytes", "target_files"}.
    """
    import glob
    import math
    import os
    import shutil

    parts_before = [
        p
        for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(p)
    ]
    if not parts_before:
        raise FileNotFoundError(f"no parquet part-files under {path}")
    total_bytes = sum(os.path.getsize(p) for p in parts_before)
    n_target = max(1, math.ceil(total_bytes / target_file_bytes))

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    shutil.rmtree(tmp, ignore_errors=True)
    if partition_by:
        writer = df.repartition(n_target, *[F.col(c) for c in partition_by]).write
        writer.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
    else:
        df.repartition(n_target).write.mode("overwrite").parquet(tmp)

    # Two-rename swap. POSIX only makes each rename atomic, not the
    # pair: a crash between them would leave no dataset at `path` (the
    # data would sit at `old`). Roll the original back on any failure of
    # the second rename so `path` is never left empty; a hard kill in
    # the window still needs a manual `mv` from `old` — documented
    # non-atomicity, same as every directory-swap compactor on a
    # non-transactional filesystem.
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        os.rename(old, path)
        raise
    shutil.rmtree(old, ignore_errors=True)

    parts_after = [
        p
        for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(p)
    ]
    return {
        "files_before": len(parts_before),
        "files_after": len(parts_after),
        "total_bytes": total_bytes,
        "target_files": n_target,
    }


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-Lines sink (one document per line, partitioned output files)
    — the corpus-export twin of read_jsonl. No coalesce: JSONL exports
    are sharded at scale like any other sink; downstream consumers glob."""
    df.write.mode(mode).json(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (Spark 4 native) — the interchange format regulated
    estates still mandate (feeds, filings, legacy B2B). NULL fields are
    omitted as elements (standard XML optionality), so a roundtrip
    needs an explicit read schema to resurrect them as NULLs."""
    (
        df.write.mode(mode)
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .format("xml")
        .save(path)
    )
