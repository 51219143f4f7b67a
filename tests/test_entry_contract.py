"""Driver-contract invariants: entry/queries/oracle_sql shape and a fast
oracle-diff spot check (full diff lives in tools/oracle_check.py)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["week_start", "location", "total_bookings"]


def test_every_oracle_key_has_a_query():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


def test_oracle_sql_parses_in_duckdb(duck):
    for name, sql in entrymod.oracle_sql().items():
        duck.execute(f"SELECT * FROM ({sql}) LIMIT 1")


@pytest.mark.parametrize("name", ["bookings_per_user", "events_json", "doc_fingerprint"])
def test_spot_oracle_parity(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF)
    spark_rows = sorted(
        tuple(row[c] for c in sorted(sdf.columns)) for row in sdf.collect()
    )
    tbl = duck.execute(entrymod.oracle_sql()[name]).fetch_arrow_table()
    duck_rows = sorted(
        tuple(r[c] for c in sorted(tbl.column_names)) for r in tbl.to_pylist()
    )
    assert spark_rows == duck_rows
