"""Schema-enforced readers (engine's source surface, SURVEY.md §2.1).

Reference parity:
- S1 JDBC scan            -> :func:`read_jdbc` (helper_func.py:55-63), with
  the partitioned-read options the reference omits (its single-connection
  JDBC scan is the documented 100-TB bottleneck, SURVEY.md §6).
- S2 schema'd CSV scan    -> :func:`read_csv` (helper_func.py:20-28)
- S3 in-memory literal    -> :func:`memory_table` (curated_tranformation.py:121-125)
- parquet is this engine's primary format (columnar scan, predicate
  pushdown + row-group skipping come free from the vectorized reader).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan; Catalyst pushes filters/projection into the scan.

    Sets ``nanosAsLong`` defensively (runtime conf): parquet files with
    TIMESTAMP(NANOS) columns otherwise fail schema conversion, since Spark
    has no nanosecond type. Affected columns surface as LongType nanos —
    convert with :func:`nanos_to_timestamp`.

    The conf is session-level by necessity — it is consulted again when
    the scan *executes*, so a set/restore scoped to this call would break
    lazy execution of the returned frame. ``session.get_spark`` declares
    it at build time; this guard only covers externally-built sessions
    (e.g. the test driver's), and is skipped when already set.
    """
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path)


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE CSV scan with explicit bad-record quarantine: returns
    ``(good, quarantine)``. ``good`` holds rows that parsed completely
    (the corrupt column is NULL, then dropped); ``quarantine`` holds the
    rest WITH their partially-parsed fields plus the raw line in
    ``corrupt_col`` — enough to route to a dead-letter sink, triage, and
    replay. This is the malformed-input contract a production ingest
    needs: FAILFAST kills the job on one bad row, DROPMALFORMED loses
    data silently; quarantine keeps the pipeline running AND the
    evidence.

    Scale shape: one scan, no extra pass — the corrupt column is
    populated by the parser itself. Spark restriction
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN): a query over the raw file
    relation may not reference ONLY the corrupt column (e.g.
    ``quarantine.select(corrupt_col)`` after pruning) — keep at least
    one real column in such aggregates, or persist the frame first.
    """
    from pyspark.sql import functions as F

    if any(f.name == corrupt_col for f in schema.fields):
        raise ValueError(f"schema already contains {corrupt_col!r}")
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    parsed = spark.read.csv(
        path,
        schema=full,
        header=header,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=corrupt_col,
    )
    good = parsed.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = parsed.filter(F.col(corrupt_col).isNotNull())
    return good, quarantine


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (Spark-native vectorized reader). Same pushdown story as
    parquet — filters/projection reach the scan, ORC stripe/row-group
    stats prune — making ORC a drop-in interchange format for warehouse
    estates that standardized on it (Hive lineage). No nanos guard
    needed: ORC timestamps are micros."""
    return spark.read.orc(path)


def nanos_to_timestamp(col):
    """Long nanos-since-epoch -> TimestampType (microsecond precision).

    Division goes through decimal, not double: nanos magnitudes (~1.7e18)
    exceed double's 2^53 integer precision, so a float divide would corrupt
    the low digits.
    """
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros((c.cast("decimal(38,0)") / 1000).cast("long"))


def ensure_timestamp(df: DataFrame, col: str):
    """Column expression yielding ``col`` as TimestampType regardless of
    the source's physical encoding of event time.

    Parquet writers disagree on timestamp representation, and a long-lived
    pipeline sees its inputs regenerated with different writers over time:
    - TIMESTAMP(NANOS) columns surface as LongType nanos under the
      ``nanosAsLong`` conf (:func:`read_parquet`) -> decimal-safe divide;
    - TIMESTAMP(MICROS)/isAdjustedToUTC=false surfaces as TIMESTAMP_NTZ ->
      the naive wall time is interpreted AS UTC via a ``timestampdiff``
      from the NTZ epoch (micros preserved). NOT ``cast("timestamp")``:
      that cast localizes in the *session* timezone, so the same input
      would yield epochs shifted by the tz offset in any consumer session
      not pinned to UTC (the driver's vanilla session, notebooks, ...);
    - already-instant TIMESTAMP passes through.

    Every branch is timezone-independent: identical epochs in any session.
    Branching on the resolved schema (not a config) keeps every consumer
    correct across input generations with zero per-row cost — the branch
    happens once at plan time.
    """
    from pyspark.sql import functions as F

    dtype = df.schema[col].dataType
    if isinstance(dtype, T.LongType):
        # The LongType contract is nanos-only (the nanosAsLong conf is
        # the only way a raw INT64 reaches us). A future generation
        # storing micros/millis as INT64 would decode to ~1970-era
        # instants and fail downstream oracles with a confusing symptom,
        # so fail the JOB loudly instead: nanos for any instant after
        # 1973 are >= 1e17, while micros stay below that until year
        # ~5138 (millis/seconds far lower). One codegen'd comparison per
        # row — noise next to the scan.
        from pyspark.sql import functions as F

        plausible_nanos = F.col(col).isNull() | (
            F.col(col) >= F.lit(100_000_000_000_000_000)
        )
        guard = F.assert_true(
            plausible_nanos,
            F.concat(
                F.lit(
                    f"ensure_timestamp: LongType column '{col}' holds "
                    "a value too small for nanos-since-epoch (micros or "
                    "millis encoding? see sources/readers.py contract): "
                ),
                F.col(col).cast("string"),
            ),
        )
        return F.when(guard.isNull(), nanos_to_timestamp(col))
    if isinstance(dtype, T.TimestampNTZType):
        return F.timestamp_micros(
            F.expr(
                "timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"
            )
        )
    return F.col(col).cast("timestamp")


def load_testdata(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load driver testdata tables from a scale-factor directory."""
    return {name: read_parquet(spark, f"{sf_dir}/{name}.parquet") for name in names}


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """CSV scan with a declared schema — inference is never used.

    Inference would require an extra full pass over 100 TB of input and can
    silently flip types between runs; a fixed StructType is both faster and
    safer (matches the reference's explicit-schema discipline).
    """
    return spark.read.option("header", str(header).lower()).schema(schema).csv(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC scan, optionally parallelized across ``num_partitions``.

    Always pass the partitioning triple for big tables: a bare JDBC read is
    one connection pulling every row through a single task.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for key, value in (properties or {}).items():
        reader = reader.option(key, value)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 32))
        )
    return reader.load()


def memory_table(
    spark: SparkSession,
    rows: Iterable[tuple],
    schema: T.StructType | Sequence[str],
) -> DataFrame:
    """Literal in-memory table (small dimensions like exchange rates)."""
    return spark.createDataFrame(list(rows), schema)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """JSON-Lines scan with a declared schema — the LLM-corpus
    interchange format (one JSON document per line; every public corpus
    release ships this way).

    Same no-inference discipline as read_csv: schema inference over
    JSONL costs a full extra pass and silently unions drifting shapes;
    a fixed StructType makes malformed rows surface as NULLs
    (columnNameOfCorruptRecord) instead of mutating the schema. JSONL is
    line-splittable, so the scan parallelizes like CSV (unlike a single
    multi-line JSON document).
    """
    return spark.read.schema(schema).json(path)


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSONL twin of :func:`read_csv_quarantine` — the format corrupt
    records actually arrive in for LLM corpora (truncated uploads,
    unescaped control characters, concatenated objects). Returns
    ``(good, quarantine)`` with the same contract: good rows parsed
    completely, quarantined rows keep partially-parsed fields plus the
    raw line for dead-letter replay. Note the JSON-source nuance: a line
    that is valid JSON but mismatches the schema TYPE of a field also
    quarantines (the parser records the raw line), while a missing field
    is just NULL — schema drift surfaces, sparse records don't. The
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction applies as for CSV.
    """
    from pyspark.sql import functions as F

    if any(f.name == corrupt_col for f in schema.fields):
        raise ValueError(f"schema already contains {corrupt_col!r}")
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    good = parsed.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = parsed.filter(F.col(corrupt_col).isNotNull())
    return good, quarantine


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: "T.StructType | None" = None,
) -> DataFrame:
    """XML scan (Spark 4 native data source — no external spark-xml
    package). Pass the schema explicitly for production reads: XML
    inference is a full extra pass AND types drift (integers that look
    like dates, empty elements as strings) — the same declared-schema
    discipline every reader in this module follows
    (helper_func.py:20-28 passes explicit schemas for the same
    reason). Row elements stream via an event parser, so files larger
    than memory scan fine, but a single XML file is ONE input split —
    at scale land many files, not one giant document."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def _read_manifest(manifest_path: str) -> "set[str]":
    """Single source of truth for the manifest's on-disk format (one
    relative file name per line, blanks ignored) — read_incremental and
    commit_manifest MUST agree on what counts as 'seen'."""
    import os

    if not os.path.isfile(manifest_path):
        return set()
    with open(manifest_path) as fh:
        return {line.strip() for line in fh if line.strip()}


def read_incremental(
    spark: SparkSession,
    data_dir: str,
    manifest_path: str,
    schema: "T.StructType | None" = None,
    fmt: str = "parquet",
    glob_pattern: str = "*.parquet",
) -> "tuple[DataFrame, list[str]]":
    """Manifest-based incremental batch ingest: read only the files in
    ``data_dir`` not yet recorded in the manifest — the batch twin of
    the file-source stream (readStream tracks seen files in its
    checkpoint; THIS makes the same exactly-once-per-file contract
    available to plain batch jobs: scheduled loads, backfills,
    re-runnable crons).

    Returns ``(df, new_files)`` — the DataFrame over the NEW files only
    (empty-but-schema'd when nothing is new, which is why ``schema`` is
    required for the empty case) and their sorted relative names. The
    caller processes df, then calls :func:`commit_manifest` with
    ``new_files`` AFTER its sink write succeeds — commit-after-write is
    what makes a crashed run re-ingest rather than silently skip
    (at-least-once across the crash, exactly-once per completed run).

    Scale notes: the manifest is file-NAME-sized (metadata scale — a
    100 TB lake is millions of names, fine as a text file or a table);
    listing is one driver-side glob, the same metadata pass any file
    source performs. Files must be immutable once landed (the universal
    lake contract — appends go in NEW files).
    """
    import glob as _glob
    import os

    seen = _read_manifest(manifest_path)
    all_files = sorted(
        os.path.relpath(p, data_dir)
        for p in _glob.glob(os.path.join(data_dir, "**", glob_pattern),
                            recursive=True)
        if os.path.isfile(p)
    )
    new_files = [f for f in all_files if f not in seen]
    if not new_files:
        if schema is None:
            raise ValueError(
                "read_incremental: no new files and no schema to build "
                "an empty frame from"
            )
        return spark.createDataFrame([], schema), []
    paths = [os.path.join(data_dir, f) for f in new_files]
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.format(fmt).load(paths)
    return df, new_files


def commit_manifest(manifest_path: str, new_files: "Sequence[str]") -> None:
    """Append ``new_files`` to the ingest manifest ATOMICALLY (write a
    merged temp file, fsync, rename) — a crash mid-commit leaves the old
    manifest intact, so the files re-ingest next run (at-least-once)
    rather than vanish (never silently-skipped)."""
    import os
    import tempfile

    merged = sorted(_read_manifest(manifest_path) | set(new_files))
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(manifest_path) or ".", suffix=".manifest.tmp"
    )
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write("\n".join(merged) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, manifest_path)
    except BaseException:
        # a failed commit must not litter the manifest dir (a stray
        # *.manifest.tmp under a broad landing glob could even be
        # picked up by a future read)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
