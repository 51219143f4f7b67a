"""Declarative pipeline recipes — the engine's composition surface.

The reference wires its pipeline as imperative scripts (one hard-coded
read→clean→join→write per job: curated_tranformation.py,
present_summary.py); this module re-expresses that lifecycle as DATA: a
recipe dict names its sources, a sequence of steps, and its sinks, and
:func:`run_recipe` interprets it into one lazy DataFrame DAG. Because
every step registers as a temp view, steps compose through plain SQL or
through the operator registry interchangeably, and Catalyst optimizes
ACROSS steps (a filter in step 5 still pushes into step 1's scan — the
payoff of declaring the plan instead of executing per step).

Recipe shape::

    {
      "tables": {
        "orders":   {"format": "parquet", "path": ".../orders.parquet"},
        "raw_csv":  {"format": "csv", "path": "...", "schema": "bookings"},
        "docs":     {"format": "jsonl", "path": "...",
                     "schema": "doc_id long, text string"},
      },
      "steps": [
        {"name": "cleaned", "op": "dedup_by_keys", "input": "orders",
         "args": {"keys": ["o_orderkey"]}},
        {"name": "metric",  "sql": "SELECT o_custkey AS user_id, COUNT(*) n
                                    FROM cleaned GROUP BY 1"},
      ],
      "outputs": {
        "metric": {"format": "parquet", "path": "...", "mode": "overwrite"},
      },
    }

Steps run in order; each is ONE OF ``{"sql": ...}`` (referencing any
prior step/table as a view), ``{"op": ...}`` naming a registered
operator (df-first callable; extra ``args`` pass through), or
``{"expect": ...}`` — a VALIDATION GATE::

    {"name": "orders_gate", "expect": {
        "input": "cleaned",
        "rules": [{"name": "pk", "kind": "unique", "column": "order_id"},
                  {"name": "fk", "kind": "foreign_key", "column": "cust_id",
                   "ref": "customers", "ref_column": "c_custkey"}],
        "on_fail": "raise",          # default; "report" records only
    }}

The gate runs :func:`cleaning.expectation_report` over the named input
(rule ``ref`` names resolve against prior steps/tables); with
``on_fail: "raise"`` (the default) any violated rule aborts the run
BEFORE any output is written — the read→clean→expect→write pipeline is
then fully expressible as data, with the gate's placement guaranteeing
nothing lands in the sink on dirty input. The report frame registers
under the step name either way, so a passing gate is still auditable
(and writable as an output).

``outputs`` maps step names to sinks — the only actions; everything
before stays one lazy plan per sink.

At 100 TB this is also the governance surface: recipes are reviewable,
diffable artifacts, and every operator they can invoke already carries
its own scale contract (SCALE.md) — composing them cannot introduce a
new shuffle shape that code review hasn't seen.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .. import schemas as _schemas
from ..operators import cleaning, dedup_fuzzy, enrich, joins, linkage, scd, text
from ..operators.graph import _ckpt
from ..sources import read_csv, read_jsonl, read_parquet, write_parquet
from ..sources.writers import write_csv_single_file, write_jsonl
from .corpus import corpus_prep


def _op_join(df: DataFrame, right: DataFrame, on, how: str = "left") -> DataFrame:
    return df.join(right, on=on, how=how)


def _op_filter(df: DataFrame, condition: str) -> DataFrame:
    return df.filter(condition)


def _op_select(df: DataFrame, columns: list[str]) -> DataFrame:
    return df.selectExpr(*columns)


#: df-first operator constructors a recipe step may invoke by name.
#: Deliberately explicit (no getattr dispatch): the recipe surface is a
#: reviewed allow-list, not arbitrary code execution.
OP_REGISTRY: dict[str, Callable[..., DataFrame]] = {
    "select": _op_select,
    "filter": _op_filter,
    "join": _op_join,
    "dedup_exact": cleaning.dedup_exact,
    "dedup_by_keys": cleaning.dedup_by_keys,
    "normalize_dates": cleaning.normalize_dates,
    "project_cast": cleaning.project_cast,
    "expectation_report": cleaning.expectation_report,
    "table_manifest": cleaning.table_manifest,
    "convert_currency": enrich.convert_currency,
    "curated_apartment_bookings": joins.curated_apartment_bookings,
    "doc_stats": text.doc_stats,
    "normalize_text": text.normalize_text,
    "mixture_sample": text.mixture_sample,
    "pii_scrub": text.pii_scrub,
    # training-data intake (the full funnel the hand-built training_mix
    # composition uses, so the declarative layer can express it end-to-end)
    "corpus_prep": corpus_prep,
    "decontaminate": text.decontaminate,
    "near_dup_degree": dedup_fuzzy.near_dup_degree,
    "jaccard_near_dups": dedup_fuzzy.jaccard_near_dups,
    "incremental_dedup": dedup_fuzzy.incremental_dedup,
    "tfidf_cosine_topk": text.tfidf_cosine_topk,
    "snapshot_diff": cleaning.snapshot_diff,
    "apply_changelog": scd.apply_changelog,
    "fuzzy_match_degree": linkage.fuzzy_match_degree,
}


class RecipeExpectationError(RuntimeError):
    """Raised by an ``expect`` gate whose rules are violated (on_fail =
    'raise'): the recipe aborts before any declared output executes."""


def _resolve_schema(spec_schema) -> T.StructType:
    """A table spec's schema may be a StructType, a reference-layer table
    name (schemas.RAW_TABLES), or a DDL string ("a int, b string")."""
    if isinstance(spec_schema, T.StructType):
        return spec_schema
    if spec_schema in _schemas.RAW_TABLES:
        return _schemas.RAW_TABLES[spec_schema]
    return T.StructType.fromDDL(spec_schema)


def _read_table(spark: SparkSession, name: str, spec: Mapping) -> DataFrame:
    fmt = spec.get("format", "parquet")
    if fmt == "parquet":
        return read_parquet(spark, spec["path"])
    schema = _resolve_schema(spec["schema"])
    if fmt == "csv":
        return read_csv(spark, spec["path"], schema, header=spec.get("header", True))
    if fmt == "jsonl":
        return read_jsonl(spark, spec["path"], schema)
    raise ValueError(f"recipe table {name!r}: unknown format {fmt!r}")


def run_recipe(
    spark: SparkSession, recipe: Mapping, execute_outputs: bool = True
) -> dict[str, DataFrame]:
    """Interpret a recipe: returns {step/table name: DataFrame} and (by
    default) materializes every declared output sink. Pass
    ``execute_outputs=False`` to get the lazy frames only (testing /
    dry-run / EXPLAIN review)."""
    frames: dict[str, DataFrame] = {}

    for name, spec in (recipe.get("tables") or {}).items():
        frames[name] = _read_table(spark, name, spec)
        frames[name].createOrReplaceTempView(name)

    for step in recipe.get("steps") or []:
        name = step["name"]
        if "sql" in step:
            df = spark.sql(step["sql"])
        elif "expect" in step:
            spec = step["expect"]
            refs = {
                ref: frames[ref]
                for rule in spec.get("rules", [])
                if (ref := rule.get("ref")) is not None
            }
            df = cleaning.expectation_report(
                frames[spec["input"]], spec.get("rules", []), ref_tables=refs
            )
            if spec.get("on_fail", "raise") == "raise":
                # the gate is the one place a recipe is ALLOWED to act
                # mid-plan: a failed expectation must abort before any
                # output write executes
                failed = [
                    (r["rule"], r["n_violations"])
                    for r in df.collect()
                    if not r["passed"]
                ]
                if failed:
                    raise RecipeExpectationError(
                        f"recipe gate {name!r} failed: {failed}"
                    )
        elif "op" in step:
            op = OP_REGISTRY.get(step["op"])
            if op is None:
                raise ValueError(
                    f"recipe step {name!r}: unknown op {step['op']!r} "
                    f"(allowed: {sorted(OP_REGISTRY)})"
                )
            inputs = step.get("inputs") or [step["input"]]
            dfs = [frames[i] for i in inputs]
            # frame_args maps keyword parameters to prior step/table
            # frames (e.g. corpus_prep's sketch=, decontaminate-style
            # secondary inputs) — args stays JSON-serializable.
            frame_kwargs = {
                k: frames[v] for k, v in (step.get("frame_args") or {}).items()
            }
            df = op(*dfs, **frame_kwargs, **(step.get("args") or {}))
        else:
            raise ValueError(
                f"recipe step {name!r}: needs 'sql', 'op', or 'expect'"
            )
        if step.get("checkpoint"):
            # Eager lineage cut, declared in data: a step whose output
            # feeds multiple downstream subtrees would otherwise re-run
            # per subtree (the training_mix lesson — measured 39 s vs
            # 4 s at sf0.1). localCheckpoint materializes once; the
            # blocks are GC'd with the frame.
            df = _ckpt(df)
        frames[name] = df
        df.createOrReplaceTempView(name)

    if execute_outputs:
        for name, sink in (recipe.get("outputs") or {}).items():
            df = frames[name]
            fmt = sink.get("format", "parquet")
            mode = sink.get("mode", "overwrite")
            if fmt == "parquet":
                write_parquet(
                    df,
                    sink["path"],
                    mode=mode,
                    partition_by=sink.get("partition_by"),
                )
            elif fmt == "csv_single_file":
                write_csv_single_file(df, sink["path"], mode=mode)
            elif fmt == "jsonl":
                write_jsonl(df, sink["path"], mode=mode)
            else:
                raise ValueError(f"recipe output {name!r}: unknown format {fmt!r}")
    return frames


def training_mix_recipe(
    sf_dir: str, mixture_weights, sketch_path: str | None = None
) -> dict:
    """The engine's flagship end-to-end recipe: the five-stage
    training-data intake (corpus_prep funnel -> decontamination ->
    contamination filter -> token-budget mixture sample -> final mixture
    aggregate) as a plain dict — the declarative twin of the imperative
    q_training_mix composition, value-identical by the shared oracle and
    tests/test_recipe.py. ``sketch_path`` slots a materialized
    token-sketch artifact into the funnel as a frame_arg (the bench
    path); None tokenizes inline with identical values."""
    funnel_step = {
        "name": "rtm_funnel",
        "op": "corpus_prep",
        "input": "rtm_documents",
        "args": {"min_quality": 0.5, "jaccard_threshold": 0.5},
        # same lineage cut q_training_mix does by hand
        "checkpoint": True,
    }
    recipe = {
        "tables": {
            "rtm_documents": {
                "format": "parquet",
                "path": f"{sf_dir}/documents.parquet",
            },
        },
        "steps": [
            funnel_step,
            {
                "name": "rtm_corpus",
                "sql": "SELECT doc_id, text, source FROM rtm_funnel",
            },
            {
                "name": "rtm_benchmark",
                "sql": "SELECT * FROM rtm_documents WHERE doc_id % 50 = 0",
            },
            {
                "name": "rtm_contam",
                "op": "decontaminate",
                "inputs": ["rtm_corpus", "rtm_benchmark"],
                "args": {"n": 8},
            },
            {
                "name": "rtm_clean",
                "sql": """
                    SELECT c.* FROM rtm_corpus c
                    LEFT SEMI JOIN (
                        SELECT doc_id FROM rtm_contam WHERE NOT is_contaminated
                    ) k ON c.doc_id = k.doc_id
                """,
            },
            {
                "name": "rtm_sampled",
                "op": "mixture_sample",
                "input": "rtm_clean",
                "args": {"budget_tokens": 500, "weights": mixture_weights},
            },
            {
                "name": "rtm_mix",
                "sql": """
                    SELECT source, keep_thresh,
                           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
                           SUM(n_tokens) AS tokens_kept
                    FROM rtm_sampled
                    GROUP BY source, keep_thresh
                    ORDER BY source
                """,
            },
        ],
    }
    if sketch_path is not None:
        recipe["tables"]["rtm_sketch"] = {"format": "parquet", "path": sketch_path}
        funnel_step["frame_args"] = {"sketch": "rtm_sketch"}
    return recipe
