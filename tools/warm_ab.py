"""Same-process warmup A/B for selected bench queries.

Usage: python tools/warm_ab.py <subset|full|none> [n_runs] [query ...]

Replicates bench.py's exact startup (same session, same warm_up), then
times each query n_runs times with the noop sink and prints one JSON
line {mode, sf_dir, queries: {name: [sec, ...]}}. Run each mode in a
fresh process — the point is comparing FIRST-run numbers under
different warm states (r6 verdict task 5: are the r5->r6 per-query
deltas fully warmup-explained?).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entrymod
from lab_etl_batch_data_processing_pipeline__spark.session import get_spark

DEFAULT_MOVERS = (
    "winnowing",
    "currency_convert",
    "jdbc_roundtrip",
    "streaming_event_counts",
)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "subset"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or list(DEFAULT_MOVERS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("warm-ab")
    spark.sparkContext.setLogLevel("ERROR")
    bench.warm_up(spark, sf_dir, mode)
    try:
        entrymod.prebuild_indexes(spark, sf_dir)
    except Exception as exc:
        print(f"WARNING: prebuild failed: {exc}", file=sys.stderr)

    registry = entrymod.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        runs = []
        for _ in range(n_runs):
            start = time.perf_counter()
            bench.materialize(registry[name](spark, sf_dir))
            runs.append(round(time.perf_counter() - start, 3))
        out[name] = runs
    print(json.dumps({"mode": mode, "sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
