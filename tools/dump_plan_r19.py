"""Dump `.explain("formatted")` for named registry keys to plans/r19/.

Usage: python tools/dump_plan_r19.py <suffix> <key> [key ...]
Writes plans/r19/<key>_<suffix>.txt for each key (static plan of the
DataFrame the query wrapper builds at $SPARK_GRAFT_SF_DIR).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from lab_etl_batch_data_processing_pipeline__spark.session import get_spark


def formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r19",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump-r19")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        entrymod.prebuild_indexes(spark, sf_dir)
    except Exception as exc:
        print(f"WARNING: prebuild failed: {exc}", file=sys.stderr)
    registry = entrymod.queries()
    for key in keys:
        df = registry[key](spark, sf_dir)
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(df) + "\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
