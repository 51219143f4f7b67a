"""Cleaning operators (SURVEY.md §2.2): dedup, date normalization,
projection/cast, schema validation.

All pure ``DataFrame -> DataFrame`` and built-in-expression only, so every
one stays inside whole-stage codegen and benefits from pushdown/pruning.

Reference parity:
- P1 exact dedup          -> :func:`dedup_exact` (curated_tranformation.py:134-137)
- key-subset dedup        -> :func:`dedup_by_keys` (engine extension: the
  reference's Glue job fuses ``dropDuplicates()`` into the scan,
  curate_data_etl_job.py:82, but offers no deterministic keyed variant)
- P4 date normalize       -> :func:`normalize_dates` (curated_tranformation.py:141-146)
- P2 projection + cast    -> :func:`project_cast` (curated_tranformation.py:148-180)
- P7 schema validation    -> :func:`validate_columns` / :func:`assert_no_nulls`
  (the reference defines validate_columns at helper_func.py:50-51 but never
  calls it; here it is a real, used gate)
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Drop fully-duplicate rows (optionally on a column subset).

    ``dropDuplicates`` is a hash aggregation on all (or subset) columns:
    partial map-side dedup, one shuffle on the dedup key, final dedup.
    Note: with ``subset``, *which* survivor row is kept is arbitrary — use
    :func:`dedup_by_keys` when the survivor must be deterministic (required
    for oracle-diff testing and reproducible pipelines).
    """
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def dedup_by_keys(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str] | None = None,
    descending: bool = False,
) -> DataFrame:
    """Keep exactly one row per key, chosen deterministically.

    Survivor = first row per key under ``order_by`` (default: all non-key
    columns ascending, nulls last). Implemented as a ranking window — one
    shuffle on ``keys``, in-partition sort, no driver involvement. At scale
    this is the same cost as ``dropDuplicates(keys)`` but reproducible.
    """
    order_cols = list(order_by) if order_by else [c for c in df.columns if c not in keys]
    ordering = [
        F.col(c).desc_nulls_last() if descending else F.col(c).asc_nulls_last()
        for c in order_cols
    ]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def normalize_dates(
    df: DataFrame,
    columns: Sequence[str],
    input_format: str = "dd/MM/yyyy",
) -> DataFrame:
    """Parse string date columns to DateType, malformed -> NULL.

    Spark 4 runs ANSI mode by default where ``to_date`` *throws* on
    malformed input; ``try_to_date`` restores null-on-malformed semantics
    without disabling ANSI globally (SURVEY.md §7.4 risk 1). The reference
    instead reformats to a 'yyyy-MM-dd' *string* (curated_tranformation.py:141-146);
    keeping a real DateType lets Catalyst fold/push date predicates and
    halves the column width.
    """
    out = df
    for column in columns:
        out = out.withColumn(column, F.try_to_date(F.col(column), input_format))
    return out


def project_cast(df: DataFrame, columns: Mapping[str, str]) -> DataFrame:
    """Project to exactly ``columns`` with ANSI-safe casts.

    ``columns`` maps output name -> "source_col:type" or just "type" (same
    name). Uses ``try_cast`` semantics via F.try_ functions where overflow
    could throw under ANSI.
    """
    exprs = []
    for out_name, spec in columns.items():
        if ":" in spec:
            src, dtype = spec.split(":", 1)
        else:
            src, dtype = out_name, spec
        exprs.append(F.col(src).try_cast(dtype).alias(out_name))
    return df.select(*exprs)


def split_to_array(df: DataFrame, column: str, delimiter: str = ",") -> DataFrame:
    """Delimited list-as-text -> trimmed ArrayType(StringType()).

    The reference stores ``amenities`` as raw text with a TODO to make it an
    array (curated_tranformation.py:21); this is that operator.
    """
    return df.withColumn(
        column,
        F.when(
            F.col(column).isNull() | (F.trim(F.col(column)) == ""), F.array().cast("array<string>")
        ).otherwise(
            F.transform(F.split(F.col(column), F.lit(delimiter)), lambda x: F.trim(x))
        ),
    )


class SchemaValidationError(ValueError):
    pass


def validate_columns(df: DataFrame, required_columns: Sequence[str]) -> DataFrame:
    """Assert required columns exist (plan-time, no job run). Returns df."""
    missing = [c for c in required_columns if c not in df.columns]
    if missing:
        raise SchemaValidationError(f"missing required columns: {missing}")
    return df


def assert_no_nulls(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Runtime data-quality gate: raise if any listed column holds a NULL.

    One aggregate job (single pass, map-side partials); at 100 TB this is a
    full scan so call it on layer boundaries, not per-operator.
    """
    counts = df.select(
        [F.sum(F.col(c).isNull().cast("long")).alias(c) for c in columns]
    ).first()
    bad = {c: counts[c] for c in columns if counts[c]}
    if bad:
        raise SchemaValidationError(f"null values in non-nullable columns: {bad}")
    return df


def profile_columns(
    df: DataFrame, columns: Sequence[str] | None = None
) -> DataFrame:
    """Per-column data-quality profile: row count, null count, exact
    distinct count — one row per column.

    Shape: cast the chosen columns to string, ``unpivot`` to
    (column_name, value) rows, then a single hash aggregate keyed by
    column_name. One shuffle whose key cardinality is the number of
    columns; the unpivot fan-out is rows x columns but each shuffled row
    is just (name, value) — at 100 TB profile a column subset or a
    ``TABLESAMPLE``, not every wide column at once. Exact distincts (not
    approx_count_distinct) so the result is engine-portable and
    oracle-checkable; swap in approx for fleet-wide monitoring.
    """
    cols = list(columns or df.columns)
    stacked = df.select(
        [F.col(c).cast("string").alias(c) for c in cols]
    ).unpivot([], cols, "column_name", "value")
    return (
        stacked.groupBy("column_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count("value")).alias("n_nulls"),
            F.countDistinct("value").alias("n_distinct"),
        )
        .orderBy("column_name")
    )


def expectation_report(
    df: DataFrame,
    rules: Sequence[Mapping],
    ref_tables: Mapping[str, DataFrame] | None = None,
) -> DataFrame:
    """Declarative data-quality expectations — the audit-table form of
    the reference's never-called validation TODO (helper_func.py:50-51),
    graduated into a reusable constraint suite (the deequ/dbt-tests
    shape, re-expressed as plain aggregates).

    ``rules`` is a sequence of dicts: ``{"name", "kind", "column",
    ...params}`` with kinds:

    - ``not_null``                        — column has no NULLs
    - ``unique``                          — no duplicate values (NULLs ignored)
    - ``in_set``      (``values``)        — value ∈ allowed set
    - ``range``       (``min``/``max``)   — min <= value <= max (either bound optional)
    - ``regex``       (``pattern``)       — value matches (NULLs violate not_null, not regex)
    - ``foreign_key`` (``ref``/``ref_column``) — value exists in ``ref_tables[ref]``;
      no hard broadcast hint by default (a hint is obeyed regardless of
      size — OOM at 100 TB for a data-scaled reference; AQE picks
      broadcast iff the distinct key set fits). Set
      ``"broadcast_ref": True`` only for bounded-by-construction
      references (enum/dimension tables)

    Returns (rule, column, kind, n_violations, passed) ordered by rule.

    Scale shape: every row-local kind (not_null/in_set/range/regex)
    compiles into ONE conditional-sum aggregate — a single pass over the
    table no matter how many such rules. ``unique`` adds one groupBy on
    its column (count>1 keys only), ``foreign_key`` one left-anti join
    per referenced dimension (broadcast when small). The report itself
    is rules-count rows.
    """
    spark = df.sparkSession
    row_local_aggs = []
    row_local_meta = []
    extra_frames = []

    for rule in rules:
        name, kind, col = rule["name"], rule["kind"], rule["column"]
        c = F.col(col)
        if kind == "not_null":
            cond = c.isNull()
        elif kind == "in_set":
            cond = c.isNotNull() & ~c.isin(list(rule["values"]))
        elif kind == "range":
            cond = F.lit(False)
            if "min" in rule:
                cond = cond | (c < F.lit(rule["min"]))
            if "max" in rule:
                cond = cond | (c > F.lit(rule["max"]))
            cond = c.isNotNull() & cond
        elif kind == "regex":
            cond = c.isNotNull() & ~c.rlike(rule["pattern"])
        elif kind == "unique":
            extra_frames.append(
                df.filter(c.isNotNull())
                .groupBy(c.alias("__v"))
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                    .cast("long")
                    .alias("n_violations")
                )
                .select(
                    F.lit(name).alias("rule"),
                    F.lit(col).alias("column"),
                    F.lit(kind).alias("kind"),
                    "n_violations",
                )
            )
            continue
        elif kind == "foreign_key":
            ref = (ref_tables or {})[rule["ref"]]
            ref_col = rule.get("ref_column", col)
            ref_keys = ref.select(F.col(ref_col).alias("__v")).distinct()
            if rule.get("broadcast_ref", False):
                ref_keys = F.broadcast(ref_keys)
            extra_frames.append(
                df.filter(c.isNotNull())
                .select(c.alias("__v"))
                .join(
                    ref_keys,
                    "__v",
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
                .select(
                    F.lit(name).alias("rule"),
                    F.lit(col).alias("column"),
                    F.lit(kind).alias("kind"),
                    "n_violations",
                )
            )
            continue
        else:
            raise ValueError(f"unknown expectation kind: {kind}")
        # coalesce: SUM over an empty table is NULL, but zero rows is
        # zero violations, not an unknown
        row_local_aggs.append(
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(name)
        )
        row_local_meta.append((name, col, kind))

    frames = list(extra_frames)
    if row_local_aggs:
        wide = df.agg(*row_local_aggs)
        frames.append(
            wide.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(n).alias("rule"),
                                F.lit(c).alias("column"),
                                F.lit(k).alias("kind"),
                                F.col(n).alias("n_violations"),
                            )
                            for n, c, k in row_local_meta
                        ]
                    )
                ).alias("e")
            ).select("e.rule", "e.column", "e.kind", "e.n_violations")
        )
    if not frames:
        raise ValueError("expectation_report: no rules given")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "rule", "column", "kind", "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("rule")


def table_manifest(
    df: DataFrame,
    cols: Sequence[str],
    table_name: str = "table",
) -> DataFrame:
    """Content manifest for a table snapshot: (table, n_rows,
    content_xor, n_nulls) — the cheap cross-engine "did the data
    change / did the migration preserve every row" fingerprint.

    Row hash = 60-bit md5 prefix of the column values joined with a
    separator (NULL -> a distinct sentinel so NULL and '' differ);
    the table digest folds row hashes with BIT_XOR — commutative and
    associative, so the digest is independent of row order, partitioning
    and parallelism, and never overflows (the reason it beats SUM:
    Spark wraps 64-bit sums while DuckDB widens to HUGEINT — an
    engine-visible divergence). XOR cancels PAIRS of identical rows, so
    n_rows rides along to catch even-multiplicity edits.

    Restrict ``cols`` to types with engine-stable string casts (ints,
    strings, dates, decimals) — float-to-string formatting differs
    between engines.
    """
    # printable sentinels: NUL/unit-separator literals don't survive
    # every engine's SQL string literal path, and the oracle must build
    # the identical concatenation
    sep = "|#|"
    null_sentinel = "[[NULL]]"
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(null_sentinel)) for c in cols
    ]
    row_h = F.conv(
        F.substring(F.md5(F.concat_ws(sep, *parts)), 1, 15), 16, 10
    ).cast("long")
    null_count = sum(
        (F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)) for c in cols),
        F.lit(0),
    )
    # empty-table aggregates return NULL; the manifest of nothing is a
    # well-defined (0, 0, 0) so empty snapshots diff cleanly
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.bit_xor(row_h), F.lit(0).cast("long")).alias("content_xor"),
        F.coalesce(null_count.cast("long"), F.lit(0).cast("long")).alias("n_nulls"),
    ).select(F.lit(table_name).alias("table"), "n_rows", "content_xor", "n_nulls")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    hash_compare: bool = False,
) -> DataFrame:
    """Keyed diff of two table snapshots: one row per key whose state
    differs — ``change_type`` ∈ {'added', 'removed', 'changed'};
    unchanged keys are absent. The change-audit primitive pipelines run
    between loads (what did this rerun actually touch?) and the
    verification step after a migration/backfill.

    ``compare_cols`` defaults to every non-key column of ``new``.
    Comparison is null-safe (a column going NULL→value or value→NULL is
    'changed'; NULL==NULL is unchanged), via one struct ``eqNullSafe``.

    Scale shape: one shuffle per side on the key (sort-merge full-outer
    join); the comparison is a map-side struct equality. With
    ``hash_compare=True`` each side shuffles (keys, xxhash64(row))
    instead of the full compared row — 8 bytes/row, the at-scale form
    for wide tables, exact up to a 2^-64-per-pair hash collision (use
    the default when the diff must be certificate-grade). Both forms
    return identical results on every fixture
    (tests/test_cleaning.py::test_snapshot_diff_hash_matches_struct).

    ``hash_compare`` supports SCALAR compare columns only: the hash
    encoding casts each column to string, which is lossy for
    array/map/struct values (distinct nested values can render
    identically, reading as 'unchanged'), so complex-typed compare
    columns raise — use the default struct form, whose ``eqNullSafe``
    compares nested values exactly.
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in set(keys)]
    if hash_compare:
        complex_cols = [
            f.name
            for f in new.select(*compare_cols).schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if complex_cols:
            raise ValueError(
                "snapshot_diff(hash_compare=True) supports scalar compare "
                f"columns only; complex-typed: {complex_cols} — use the "
                "default exact (struct) comparison for nested types"
            )
    if not compare_cols:
        # key-only tables: membership diff (added/removed only) — a
        # constant comparator keeps the plan shape without struct()/
        # xxhash64() zero-arg errors
        o = old.select(*keys, F.lit(0).alias("__o"))
        n = new.select(*keys, F.lit(0).alias("__n"))
    elif hash_compare:
        # Spark's xxhash64 SKIPS NULL children (the running hash passes
        # through unchanged), so hashing raw columns is NOT
        # position-sensitive for NULLs: ('555', NULL) and (NULL, '555')
        # would collide and a value "moving" between columns would read
        # as unchanged. Encode each column as a string with a sentinel
        # for NULL so every position always feeds the hash chain. The
        # residual risk is user data containing the sentinel itself —
        # use the exact (default) form for certificate-grade diffs.
        null_sentinel = "\x00__NULL__\x00"

        def side(df, alias):
            encoded = [
                F.coalesce(df[c].cast("string"), F.lit(null_sentinel))
                for c in compare_cols
            ]
            return df.select(*keys, F.xxhash64(*encoded).alias(alias))

        o, n = side(old, "__o"), side(new, "__n")
    else:
        o = old.select(
            *keys, F.struct(*[old[c] for c in compare_cols]).alias("__o")
        )
        n = new.select(
            *keys, F.struct(*[new[c] for c in compare_cols]).alias("__n")
        )
    # mark presence explicitly: a struct of all-NULL columns is still a
    # present row, and for hash_compare the hash itself is never NULL
    o = o.withColumn("__in_old", F.lit(True))
    n = n.withColumn("__in_new", F.lit(True))
    j = o.join(n, list(keys), "full_outer")
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(~F.col("__o").eqNullSafe(F.col("__n")), F.lit("changed"))
    )
    return (
        j.select(*keys, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: Sequence[str],
    id_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic EXACT-n sample per stratum — the eval-set/debug-
    slice builder: within each stratum rows rank by md5(salt || id) and
    the first ``n_per_stratum`` survive. Unlike ``sampleBy`` (Bernoulli,
    approximate counts, RNG-seeded) the size per stratum is exact (or
    the whole stratum when smaller), the choice is independent of data
    order and parallelism, and the md5 ranking is engine-portable, so
    the sample itself is oracle-checkable. ``salt`` rotates the sample
    without touching the data (new salt → fresh uniform draw).

    Shape: one ranking window hashed on the strata — the dedup_by_keys
    cost. Strata skew bounds apply (a single giant stratum serializes
    its ranking into one task; for top-n of a hot stratum at 100 TB,
    pre-filter with an approximate rank threshold first)."""
    rank_w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return (
        df.withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def reconcile_totals(
    fact: DataFrame,
    lines: DataFrame,
    key_col: str,
    fact_total_col: str,
    line_amount_col: str,
    group_col: str | None = None,
    line_key_col: str | None = None,
) -> DataFrame:
    """Cross-table reconciliation gate: does each fact row's stored
    total equal the sum of its detail lines? — the finance-closing /
    double-entry audit every warehouse runs between a header table and
    its line table, reported as exact mismatch mass instead of a
    row-by-row dump.

    Exact: both sides must already be DECIMAL with scale <= 6 (the
    pricing_summary money rule — cast factors BEFORE multiplying, stay
    decimal end-to-end; VALIDATED, because at scale > 6 the micro-unit
    cast would round sub-micro differences away and report mismatched
    facts as exact); the difference is computed in decimal and scaled
    to an integer micro-unit BIGINT (at scale <= 6 the product is
    integer-valued, so the cast truncates nothing and both engines
    agree bit-for-bit). Facts with NO detail lines reconcile against 0
    (their full total reports as difference — a missing-lines fact is
    the worst mismatch, not an exclusion). FAIL-CLOSED: a fact whose
    difference cannot be evaluated (NULL stored total, decimal
    overflow nulling the diff) counts as MISMATCHED — n_mismatched is
    derived as n_facts - n_exact, so the invariant
    n_exact + n_mismatched == n_facts always holds; unevaluable facts'
    unknown diff mass is excluded from sum_abs_diff_micro (documented
    under-count, never a false pass).

    Shape: one key-partitioned aggregate over lines (map-side combine),
    one key equi-join to facts, one grouped rollup — three exchanges on
    the natural keys, nothing pair-wise.

    Returns per ``group_col`` value (or one '__all__' row):
    (group, n_facts, n_exact, n_mismatched, sum_abs_diff_micro).
    """
    from pyspark.sql import types as _T

    for frame, col, side in (
        (fact, fact_total_col, "fact_total_col"),
        (lines, line_amount_col, "line_amount_col"),
    ):
        dt = frame.schema[col].dataType
        if not isinstance(dt, _T.DecimalType) or dt.scale > 6:
            raise ValueError(
                f"reconcile_totals: {side} must be DECIMAL with scale "
                f"<= 6 (got {dt.simpleString()}) — cast money columns "
                "per the pricing_summary rule first"
            )
    per_line = lines.groupBy(
        F.col(line_key_col or key_col).alias("__k")
    ).agg(F.sum(F.col(line_amount_col)).alias("__line_total"))
    g = (
        F.col(group_col)
        if group_col
        else F.lit("__all__")
    )
    joined = fact.select(
        F.col(key_col).alias("__k"),
        g.alias("group"),
        F.col(fact_total_col).alias("__fact_total"),
    ).join(per_line, "__k", "left")
    diff = F.coalesce(F.col("__line_total"), F.lit(0)) - F.col(
        "__fact_total"
    )
    marked = joined.select(
        "group",
        (diff * 1_000_000).cast("decimal(38,0)").cast("long").alias(
            "__diff_micro"
        ),
    )
    return (
        marked.groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n_facts"),
            # NULL diff falls to otherwise(0): unevaluable is NOT exact
            F.sum(
                F.when(F.col("__diff_micro") == 0, 1).otherwise(0)
            ).alias("n_exact"),
            F.sum(F.abs(F.col("__diff_micro"))).alias(
                "sum_abs_diff_micro"
            ),
        )
        # derived, not a second predicate: fail-closed by construction
        .withColumn(
            "n_mismatched", F.col("n_facts") - F.col("n_exact")
        )
        .select(
            "group", "n_facts", "n_exact", "n_mismatched",
            "sum_abs_diff_micro",
        )
        .orderBy("group")
    )
