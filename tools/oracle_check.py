"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry through Spark and, where an oracle exists,
through DuckDB on the same parquet tables; compares row count, column
names, and an order-insensitive value comparison (floats to 1e-9 rel).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from lab_etl_batch_data_processing_pipeline__spark.session import get_spark


def norm(v):
    """Canonicalize a value to a (type-class, value) pair.

    Type-SENSITIVE on purpose: the driver's value hash distinguishes
    dtypes that compare equal in Python (``Decimal(5) == 5`` is True,
    yet hashes differently), which is exactly how the r10
    ``events_level_shift`` red row slipped past a tuple-equality
    replica — DuckDB widens SUM(BIGINT) to HUGEINT (arrow decimal128)
    while Spark returns int64. Int widths collapse to one class (the
    driver has always accepted INT-vs-BIGINT oracles); everything else
    keeps its type tag.
    """
    import datetime
    from decimal import Decimal

    if v is None:
        return ("null", "")
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", round(v, 9))
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, datetime.datetime):
        return ("timestamp", v.isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    # Struct symmetry: Spark returns Row (a tuple subclass with fields),
    # DuckDB's to_pylist returns dict — canonicalize both to a sorted
    # (key, norm(value)) tuple so struct columns compare by field name.
    if hasattr(v, "asDict"):
        v = v.asDict()
    if isinstance(v, dict):
        return ("struct", tuple(sorted((k, norm(x)) for k, x in v.items())))
    if isinstance(v, (list, tuple)):
        return ("array", tuple(norm(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("binary", bytes(v))
    return (type(v).__name__, v)


def normalize(rows, columns):
    return sorted(
        [tuple(norm(r[c]) for c in sorted(columns)) for r in rows],
        key=lambda t: tuple(str(x) for x in t),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # Replicate the DRIVER's environment: a bare SparkSession with
        # none of session.py's confs (timezone, AQE tuning, parquet
        # nanos). Every query must survive this — the driver imports
        # __spark_entry__ with its own vanilla session.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-vanilla")
            # UI-only, no query semantics: console progress bars write
            # \r-terminated fragments that splice into the per-key OK
            # lines when a sweep's output is captured with 2>&1 — the
            # r12b receipt lost ~30 visually intact lines that way
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spark_rows = [r.asDict() for r in sdf.collect()]
        cols = sdf.columns
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(spark_rows)} rows")
            continue
        ddf = con.execute(oracles[name]).fetch_arrow_table()
        duck_cols = ddf.column_names
        duck_rows = ddf.to_pylist()
        status = []
        if sorted(cols) != sorted(duck_cols):
            status.append(f"SCHEMA spark={sorted(cols)} duck={sorted(duck_cols)}")
        if len(spark_rows) != len(duck_rows):
            status.append(f"ROWS spark={len(spark_rows)} duck={len(duck_rows)}")
        if not status:
            a = normalize(spark_rows, cols)
            b = normalize(duck_rows, cols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                status.append(f"VALUES {len([1 for x, y in zip(a, b) if x != y])} differ, e.g. {diff}")
        if status:
            failures.append(name)
            print(f"{name:28s} FAIL  {' | '.join(status)}")
        else:
            print(f"{name:28s} OK    {len(spark_rows)} rows")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
