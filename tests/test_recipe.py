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


def test_recipe_expect_gate_blocks_bad_writes(spark, tmp_path):
    """A failing expect gate must abort the run BEFORE any declared
    output executes — nothing lands in the sink on dirty input."""
    from lab_etl_batch_data_processing_pipeline__spark.plans.recipe import (
        RecipeExpectationError,
    )

    out = str(tmp_path / "sink")
    recipe = {
        "tables": {
            "orders": {"format": "parquet", "path": f"{SF}/orders.parquet"}
        },
        "steps": [
            {
                "name": "gate",
                "expect": {
                    "input": "orders",
                    "rules": [
                        # o_orderstatus has values outside this set -> fails
                        {"name": "status_enum", "kind": "in_set",
                         "column": "o_orderstatus", "values": ["F"]},
                    ],
                },
            },
        ],
        "outputs": {"orders": {"format": "parquet", "path": out}},
    }
    with pytest.raises(RecipeExpectationError, match="status_enum"):
        run_recipe(spark, recipe)
    assert not os.path.exists(out)
    # report-only mode records the failure but does not abort
    recipe["steps"][0]["expect"]["on_fail"] = "report"
    frames = run_recipe(spark, recipe, execute_outputs=False)
    rep = {r["rule"]: r["passed"] for r in frames["gate"].collect()}
    assert rep == {"status_enum": False}


def test_recipe_curated_write_twin(spark, tmp_path):
    """The full reference lifecycle — read -> join/clean -> expect ->
    partitioned curated write — expressed as DATA, hash-equal to the
    imperative curated path (q_curated_join + write_parquet partition_by,
    the q_curated_partition_scan write). Pins verdict-r8 task 6."""
    import __spark_entry__ as entrymod

    decl_dir = str(tmp_path / "decl")
    recipe = {
        "tables": {
            "orders": {"format": "parquet", "path": f"{SF}/orders.parquet"},
            "customer": {"format": "parquet", "path": f"{SF}/customer.parquet"},
            "nation": {"format": "parquet", "path": f"{SF}/nation.parquet"},
            "region": {"format": "parquet", "path": f"{SF}/region.parquet"},
        },
        "steps": [
            {
                "name": "curated",
                "sql": """
                    SELECT o.o_orderkey AS order_id,
                           o.o_custkey  AS customer_id,
                           c.c_name     AS customer_name,
                           c.c_mktsegment AS segment,
                           n.n_name     AS nation,
                           r.r_name     AS region,
                           o.o_orderstatus AS order_status,
                           CAST(o.o_orderdate AS DATE) AS order_date,
                           o.o_totalprice AS total_price,
                           o.o_orderpriority AS order_priority,
                           date_format(o.o_orderdate, 'yyyy-MM') AS order_month
                    FROM orders o
                    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
                    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
                """,
            },
            {
                "name": "curated_gate",
                "expect": {
                    "input": "curated",
                    "rules": [
                        {"name": "pk_unique", "kind": "unique",
                         "column": "order_id"},
                        {"name": "pk_not_null", "kind": "not_null",
                         "column": "order_id"},
                        {"name": "cust_fk", "kind": "foreign_key",
                         "column": "customer_id", "ref": "customer",
                         "ref_column": "c_custkey"},
                    ],
                },
            },
        ],
        "outputs": {
            "curated": {
                "format": "parquet",
                "path": decl_dir,
                "partition_by": ["order_month"],
            }
        },
    }
    run_recipe(spark, recipe)

    from lab_etl_batch_data_processing_pipeline__spark.sources import write_parquet
    from pyspark.sql import functions as F

    imp_dir = str(tmp_path / "imp")
    imperative = entrymod.q_curated_join(spark, SF).withColumn(
        "order_month", F.date_format("order_date", "yyyy-MM")
    )
    write_parquet(imperative, imp_dir, partition_by=["order_month"])

    cols = sorted(imperative.columns)
    decl_rows = sorted(
        map(tuple, spark.read.parquet(decl_dir).select(*cols).collect())
    )
    imp_rows = sorted(
        map(tuple, spark.read.parquet(imp_dir).select(*cols).collect())
    )
    assert decl_rows == imp_rows and len(decl_rows) > 0
    # same partition directory layout
    decl_parts = sorted(
        d for d in os.listdir(decl_dir) if d.startswith("order_month=")
    )
    imp_parts = sorted(
        d for d in os.listdir(imp_dir) if d.startswith("order_month=")
    )
    assert decl_parts == imp_parts
