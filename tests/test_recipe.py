"""Declarative recipe runner (plans/recipe.py): op + SQL steps compose
into one Catalyst plan, sinks materialize, and the allow-list holds."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lab_etl_batch_data_processing_pipeline__spark.plans.recipe import run_recipe

SF = "/root/testdata/sf0.001"


def test_recipe_matches_hand_written_pipeline(spark, tmp_path):
    out_dir = str(tmp_path / "metric")
    recipe = {
        "tables": {
            "orders": {"format": "parquet", "path": f"{SF}/orders.parquet"},
            "customer": {"format": "parquet", "path": f"{SF}/customer.parquet"},
        },
        "steps": [
            {
                "name": "deduped",
                "op": "dedup_by_keys",
                "input": "orders",
                "args": {"keys": ["o_orderkey"], "order_by": ["o_orderdate"]},
            },
            {
                "name": "confirmed",
                "op": "filter",
                "input": "deduped",
                "args": {"condition": "o_orderstatus = 'F'"},
            },
            {
                "name": "metric",
                "sql": """
                    SELECT c.c_mktsegment AS segment,
                           CAST(COUNT(*) AS BIGINT) AS n_orders
                    FROM confirmed o JOIN customer c
                      ON o.o_custkey = c.c_custkey
                    GROUP BY 1 ORDER BY 1
                """,
            },
        ],
        "outputs": {"metric": {"format": "parquet", "path": out_dir}},
    }
    frames = run_recipe(spark, recipe)
    got = [(r.segment, r.n_orders) for r in frames["metric"].collect()]

    # hand-written equivalent
    expected = [
        (r.segment, r.n_orders)
        for r in spark.sql(
            f"""
            SELECT c.c_mktsegment AS segment,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM (SELECT DISTINCT o_orderkey, o_custkey, o_orderstatus
                  FROM parquet.`{SF}/orders.parquet`) o
            JOIN parquet.`{SF}/customer.parquet` c
              ON o.o_custkey = c.c_custkey
            WHERE o.o_orderstatus = 'F'
            GROUP BY 1 ORDER BY 1
            """
        ).collect()
    ]
    assert got == expected
    # sink materialized and round-trips
    back = spark.read.parquet(out_dir)
    assert sorted((r.segment, r.n_orders) for r in back.collect()) == sorted(got)


def test_recipe_cross_step_pushdown(spark):
    """A filter declared in a LATER sql step must reach the step-1 scan —
    the whole point of interpreting the recipe into ONE lazy plan."""
    recipe = {
        "tables": {
            "orders": {"format": "parquet", "path": f"{SF}/orders.parquet"},
        },
        "steps": [
            {"name": "projected", "op": "select", "input": "orders",
             "args": {"columns": ["o_orderkey", "o_orderstatus"]}},
            {"name": "late_filter",
             "sql": "SELECT * FROM projected WHERE o_orderstatus = 'F'"},
        ],
    }
    frames = run_recipe(spark, recipe, execute_outputs=False)
    plan = frames["late_filter"]._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "EqualTo(o_orderstatus,F)" in plan, "late filter not pushed to scan"


def test_recipe_rejects_unknown_op(spark):
    with pytest.raises(ValueError, match="unknown op"):
        run_recipe(
            spark,
            {
                "tables": {
                    "orders": {"format": "parquet", "path": f"{SF}/orders.parquet"}
                },
                "steps": [{"name": "x", "op": "exec_arbitrary", "input": "orders"}],
            },
        )


def test_recipe_jsonl_source_and_sink(spark, tmp_path):
    src = str(tmp_path / "in.jsonl")
    dst = str(tmp_path / "out.jsonl")
    spark.createDataFrame(
        [(1, "hello world"), (2, "the cat sat")], "doc_id long, text string"
    ).write.json(src)
    recipe = {
        "tables": {
            "docs": {"format": "jsonl", "path": src,
                     "schema": "doc_id long, text string"},
        },
        "steps": [
            {"name": "stats", "op": "doc_stats", "input": "docs"},
        ],
        "outputs": {"stats": {"format": "jsonl", "path": dst}},
    }
    frames = run_recipe(spark, recipe)
    assert frames["stats"].count() == 2
    back = spark.read.json(dst)
    assert back.count() == 2 and "quality_score" in back.columns


def test_recipe_training_mix_matches_imperative(spark):
    """The declarative training_mix recipe (entry key recipe_training_mix)
    must return value-identical rows to the hand-built q_training_mix —
    the pin that the recipe interpreter (op steps, two-input steps,
    checkpoint flag, SQL steps) adds nothing and loses nothing across
    the full five-stage composition."""
    import __spark_entry__ as entrymod

    imperative = entrymod.q_training_mix(spark, SF).collect()
    declarative = entrymod.q_recipe_training_mix(spark, SF).collect()
    assert [tuple(r) for r in declarative] == [tuple(r) for r in imperative]


def test_recipe_frame_args_and_checkpoint(spark):
    """frame_args resolves keyword args to prior frames (corpus_prep's
    sketch= contract) and a checkpointed step truncates lineage while
    preserving values."""
    from lab_etl_batch_data_processing_pipeline__spark.operators import dedup_fuzzy

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "aa bb cc dd"), (3, "zz yy xx ww")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("rfa_docs")
    sketch = dedup_fuzzy.token_sketch(docs)
    sketch.createOrReplaceTempView("rfa_sketch")
    recipe = {
        "steps": [
            {"name": "rfa_s", "sql": "SELECT * FROM rfa_sketch"},
            {"name": "rfa_d", "sql": "SELECT * FROM rfa_docs"},
            {
                "name": "rfa_pairs",
                "op": "jaccard_near_dups",
                "input": "rfa_d",
                "args": {"threshold": 0.5},
                "frame_args": {"sketch": "rfa_s"},
                "checkpoint": True,
            },
        ],
    }
    frames = run_recipe(spark, recipe, execute_outputs=False)
    got = [(r.doc_id_a, r.doc_id_b) for r in frames["rfa_pairs"].collect()]
    assert got == [(1, 2)]
    # checkpointed frame has truncated lineage (no scan of the source)
    assert "Scan" not in frames["rfa_pairs"]._jdf.queryExecution().toString() or (
        "ExistingRDD" in frames["rfa_pairs"]._jdf.queryExecution().toString()
    )


def test_recipe_exposes_r8_operators(spark):
    """Every r8 operator is reachable from the declarative layer: a
    recipe step can invoke each by name (the op allow-list tracks the
    operator library — the r7-verdict recipe-gap theme)."""
    from lab_etl_batch_data_processing_pipeline__spark.plans.recipe import OP_REGISTRY

    for op in (
        "incremental_dedup", "tfidf_cosine_topk", "snapshot_diff",
        "apply_changelog", "fuzzy_match_degree", "corpus_prep",
        "decontaminate", "near_dup_degree", "jaccard_near_dups",
    ):
        assert op in OP_REGISTRY, op
    old = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    new = spark.createDataFrame([(1, "a"), (2, "c"), (3, "d")], "k long, s string")
    old.createOrReplaceTempView("r8_old")
    new.createOrReplaceTempView("r8_new")
    frames = run_recipe(
        spark,
        {
            "steps": [
                {"name": "r8_o", "sql": "SELECT * FROM r8_old"},
                {"name": "r8_n", "sql": "SELECT * FROM r8_new"},
                {
                    "name": "r8_diff",
                    "op": "snapshot_diff",
                    "inputs": ["r8_o", "r8_n"],
                    "args": {"keys": ["k"]},
                },
            ]
        },
        execute_outputs=False,
    )
    got = sorted((r.k, r.change_type) for r in frames["r8_diff"].collect())
    assert got == [(2, "changed"), (3, "added")]
