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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
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


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC changelog onto a snapshot — the MERGE a lakehouse
    table format runs on ingest, as plain DataFrame ops: per key the
    highest-``seq_col`` change wins; an upsert replaces the row, a
    ``delete_op`` removes the key, keys without changes keep their
    snapshot row. Returns the new snapshot (snapshot's columns).

    ``changes`` must carry the snapshot's columns plus ``seq_col`` and
    ``op_col``; ``seq_col`` may be any orderable type (monotonic id,
    timestamp, ISO string — it is compared in its own type, never cast)
    and must be non-NULL and unique per key (it IS the CDC ordering —
    a NULL or tied sequence would make "latest" undefined at any
    engine).

    Shape for scale: one union + ONE ranking window hashed on the key —
    the same single-shuffle pattern as writers.upsert_parquet, extended
    with delete semantics. The snapshot side never shuffles twice, and
    at 100 TB this composes with partition pruning exactly like upsert
    (read only the partitions the change batch touches, then dynamic
    partition overwrite).
    """
    data_cols = snapshot.columns
    seq_type = changes.schema[seq_col].dataType
    # the snapshot's sentinel seq is a NULL of the CHANGES' own seq type
    # — no cast of the change sequence (a silent long cast would turn a
    # timestamp/ISO-string CDC ordering into all-NULL and make the merge
    # winner arbitrary)
    base = snapshot.select(
        *data_cols,
        F.lit(None).cast(seq_type).alias("__seq"),
        F.lit(None).cast("string").alias("__op"),
    )
    delta = changes.select(
        *data_cols,
        F.col(seq_col).alias("__seq"),
        F.col(op_col).cast("string").alias("__op"),
    )
    # changes always beat the snapshot: NULL base seq sorts last
    w = Window.partitionBy(*keys).orderBy(F.col("__seq").desc_nulls_last())
    return (
        base.unionByName(delta)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.coalesce(F.col("__op"), F.lit("")) != delete_op))
        .select(*data_cols)
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time (PIT) join: attach to every fact row the dimension
    version that was valid AT the fact's timestamp — the query SCD2
    history exists to answer ("what plan/state/price applied when this
    happened"), and the one join where using ``is_current`` instead is
    a silent correctness bug (it rewrites history).

    Validity rule: ``valid_from <= ts AND (valid_to IS NULL OR
    ts < valid_to)`` — half-open ranges exactly as scd2_history emits
    them, so each fact matches AT MOST one version per key (ranges are
    disjoint by construction); facts before the key's first version
    keep NULL dimension columns (LEFT join — honest "no state yet").

    Shape: one equi-join on the key + the range filter. The fact×
    version blowup before filtering is bounded per key by that key's
    VERSION count (state changes, not observations) — the standard PIT
    cost; keys and versions co-partition, and AQE broadcasts the
    dimension when it is small. A sort-merge as-of form only wins when
    versions-per-key is pathological; this form keeps the plan to one
    exchange pair.

    Returns all fact columns plus the dimension's non-key,
    non-validity columns, unchanged names — callers project/alias.
    """
    ts = F.col(fact_ts_col)
    dcols = [
        c
        for c in dim.columns
        if c not in (key_col, valid_from_col, valid_to_col)
    ]
    overlap = set(dcols) & set(facts.columns)
    if overlap:
        raise ValueError(
            "dimension columns collide with fact columns "
            f"{sorted(overlap)}: alias them before the PIT join "
            "(the output keeps both sides' names unchanged)"
        )
    d = dim.select(
        F.col(key_col).alias("__k"),
        F.col(valid_from_col).alias("__vf"),
        F.col(valid_to_col).alias("__vt"),
        *[F.col(c) for c in dcols],
    )
    joined = facts.join(
        d,
        (facts[key_col] == d["__k"])
        & (d["__vf"] <= ts)
        & (d["__vt"].isNull() | (ts < d["__vt"])),
        "left",
    )
    return joined.select(*facts.columns, *dcols)


def incremental_agg_maintenance(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    group_col: str,
    measure_cents: Column,
    op_col: str = "op",
    delete_op: str = "D",
    base_agg: DataFrame | None = None,
) -> DataFrame:
    """Incrementally maintain a grouped aggregate under a CDC batch —
    the materialized-view refresh a lakehouse runs on ingest: instead
    of re-aggregating the whole table after apply_changelog, subtract
    the AFFECTED KEYS' old contributions and add their new ones.

    ``base_agg`` is the PREVIOUSLY MATERIALIZED view ((group_col,
    n_rows, sum_cents) — exactly this function's own output shape);
    passing it is what makes the refresh incremental: the snapshot is
    then touched ONLY through the changed-keys semi-join, and at
    100 TB that is the difference between a full scan and
    |changed keys| rows. ``base_agg=None`` bootstraps the view with
    one full aggregate — the first-build form, NOT the steady-state
    refresh.

    Exactness is why the measure must be integral (``measure_cents`` —
    e.g. DECIMAL-cents cast to BIGINT): integer sums are associative,
    so old + (new − old-contribution) is bit-identical to a full
    recompute. Float measures would drift and the maintained view
    would diverge from its own definition — the operator refuses
    nothing, but the oracle twin IS the full recompute, so any
    non-additive measure fails loudly there.

    Rules: a key's changes resolve exactly as apply_changelog (highest
    seq wins, deletes remove the key); updates MAY move a row between
    groups (both groups adjust); groups whose row count reaches 0
    drop out of the view.

    Shape: one distinct on the change keys, one semi-join of the
    snapshot against them (the only snapshot touch — partition-prunable
    at scale), apply_changelog over that affected slice only, two
    group-sized aggregates, one outer merge.

    Returns (group, n_rows, sum_cents) sorted by group.
    """
    keys = list(keys)
    affected = changes.select(*keys).distinct()
    touched = snapshot.join(affected, keys, "left_semi")

    def agg_of(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(group_col).alias("grp"), measure_cents.alias("__m"))
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("__m").alias("sum_cents"),
            )
        )

    if base_agg is None:
        base_agg = agg_of(snapshot)
    else:
        base_agg = base_agg.select(
            F.col(group_col).alias("grp"),
            F.col("n_rows"),
            F.col("sum_cents"),
        )
    old_contrib = agg_of(touched).select(
        "grp",
        F.col("n_rows").alias("__n_old"),
        F.col("sum_cents").alias("__s_old"),
    )
    new_rows = apply_changelog(
        touched, changes, keys, seq_col, op_col=op_col, delete_op=delete_op
    )
    new_contrib = agg_of(new_rows).select(
        "grp",
        F.col("n_rows").alias("__n_new"),
        F.col("sum_cents").alias("__s_new"),
    )
    z = F.lit(0).cast("long")
    return (
        base_agg.join(old_contrib, "grp", "full")
        .join(new_contrib, "grp", "full")
        .select(
            F.col("grp").alias(group_col),
            (
                F.coalesce("n_rows", z)
                - F.coalesce("__n_old", z)
                + F.coalesce("__n_new", z)
            ).alias("n_rows"),
            (
                F.coalesce("sum_cents", z)
                - F.coalesce("__s_old", z)
                + F.coalesce("__s_new", z)
            ).alias("sum_cents"),
        )
        .filter(F.col("n_rows") > 0)
        .orderBy(group_col)
    )
