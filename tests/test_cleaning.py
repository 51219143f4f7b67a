from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lab_etl_batch_data_processing_pipeline__spark.operators import cleaning


@pytest.fixture()
def dup_df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (1, "a", 10.0), (1, "b", 5.0), (2, "c", 7.0)],
        "id int, tag string, amount double",
    )


def test_dedup_exact_drops_full_duplicates(dup_df):
    out = cleaning.dedup_exact(dup_df)
    assert out.count() == 3


def test_dedup_exact_is_idempotent(dup_df):
    once = cleaning.dedup_exact(dup_df)
    assert cleaning.dedup_exact(once).count() == once.count()


def test_dedup_by_keys_deterministic_survivor(dup_df):
    out = cleaning.dedup_by_keys(dup_df, ["id"]).orderBy("id").collect()
    assert [(r.id, r.tag) for r in out] == [(1, "a"), (2, "c")]
    # descending flips the survivor
    out_desc = cleaning.dedup_by_keys(dup_df, ["id"], descending=True).orderBy("id").collect()
    assert [(r.id, r.tag) for r in out_desc] == [(1, "b"), (2, "c")]


def test_normalize_dates_parses_ddmmyyyy_and_nulls_malformed(spark):
    df = spark.createDataFrame(
        [("15/06/2024",), ("31/02/2024",), ("junk",), (None,)], "d string"
    )
    out = cleaning.normalize_dates(df, ["d"]).collect()
    assert str(out[0].d) == "2024-06-15"
    # malformed / impossible dates -> NULL, never an ANSI throw
    assert out[1].d is None and out[2].d is None and out[3].d is None


def test_project_cast_renames_and_casts(spark):
    df = spark.createDataFrame([("1", "x", "2.5")], "a string, b string, c string")
    out = cleaning.project_cast(df, {"a": "int", "c_num": "c:double"})
    assert out.columns == ["a", "c_num"]
    row = out.first()
    assert row.a == 1 and row.c_num == 2.5


def test_project_cast_overflow_yields_null_not_error(spark):
    df = spark.createDataFrame([("99999999999999999999",)], "a string")
    assert cleaning.project_cast(df, {"a": "int"}).first().a is None


def test_split_to_array(spark):
    df = spark.createDataFrame(
        [("gym, pool ,wifi",), ("",), (None,)], "amenities string"
    )
    rows = cleaning.split_to_array(df, "amenities").collect()
    assert rows[0].amenities == ["gym", "pool", "wifi"]
    assert rows[1].amenities == [] and rows[2].amenities == []


def test_validate_columns(spark):
    df = spark.createDataFrame([(1,)], "a int")
    cleaning.validate_columns(df, ["a"])
    with pytest.raises(cleaning.SchemaValidationError, match="missing"):
        cleaning.validate_columns(df, ["a", "zz"])


def test_assert_no_nulls(spark):
    ok = spark.createDataFrame([(1, None)], "a int, b int")
    cleaning.assert_no_nulls(ok, ["a"])
    with pytest.raises(cleaning.SchemaValidationError, match="null"):
        cleaning.assert_no_nulls(ok, ["b"])


def test_profile_columns_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (3, "b")],
        "k int, v string",
    )
    rows = {r.column_name: r for r in cleaning.profile_columns(df).collect()}
    assert rows["k"].n_rows == 4 and rows["v"].n_rows == 4
    assert rows["k"].n_nulls == 0 and rows["v"].n_nulls == 1
    assert rows["k"].n_distinct == 3
    assert rows["v"].n_distinct == 2  # NULL excluded from distincts


def test_expectation_report_counts_injected_violations(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.cleaning import (
        expectation_report,
    )

    rows = [
        (1, "F", 10.0, "1-URGENT", 100),
        (1, "F", 20.0, "2-HIGH", 101),      # duplicate key 1 (x2)
        (1, "X", -5.0, "bad", 999),         # dup + bad status + neg + regex + fk
        (None, "O", 30.0, "3-MEDIUM", 100), # null key
        (4, None, None, None, None),        # nulls are not domain violations
    ]
    df = spark.createDataFrame(
        rows, "k long, status string, amount double, prio string, fk long"
    )
    ref = spark.createDataFrame([(100,), (101,)], "rk long")
    rep = {
        r.rule: r
        for r in expectation_report(
            df,
            [
                {"name": "k_not_null", "kind": "not_null", "column": "k"},
                {"name": "k_unique", "kind": "unique", "column": "k"},
                {"name": "status_domain", "kind": "in_set", "column": "status",
                 "values": ["F", "O", "P"]},
                {"name": "amount_range", "kind": "range", "column": "amount",
                 "min": 0.0, "max": 25.0},
                {"name": "prio_regex", "kind": "regex", "column": "prio",
                 "pattern": "^[1-5]-[A-Z]+$"},
                {"name": "fk_ref", "kind": "foreign_key", "column": "fk",
                 "ref": "r", "ref_column": "rk"},
            ],
            ref_tables={"r": ref},
        ).collect()
    }
    assert rep["k_not_null"].n_violations == 1
    # three rows share k=1 -> 2 surplus rows
    assert rep["k_unique"].n_violations == 2
    assert rep["status_domain"].n_violations == 1          # 'X'; NULL ignored
    # -5.0 below min and 30.0 above max
    assert rep["amount_range"].n_violations == 2
    assert rep["prio_regex"].n_violations == 1             # 'bad'; NULL ignored
    assert rep["fk_ref"].n_violations == 1                 # 999
    assert not rep["k_unique"].passed and rep["k_not_null"].passed is False
    # a clean column passes
    clean = {
        r.rule: r
        for r in expectation_report(
            df, [{"name": "status_ok", "kind": "in_set", "column": "status",
                  "values": ["F", "O", "P", "X"]}]
        ).collect()
    }
    assert clean["status_ok"].passed


def test_expectation_report_rejects_unknown_kind(spark):
    import pytest
    from lab_etl_batch_data_processing_pipeline__spark.operators.cleaning import (
        expectation_report,
    )

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="unknown expectation kind"):
        expectation_report(df, [{"name": "x", "kind": "nope", "column": "k"}])


def test_table_manifest_detects_changes_and_ignores_order(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.cleaning import (
        table_manifest,
    )

    rows = [(1, "a"), (2, "b"), (3, None)]
    df = spark.createDataFrame(rows, "k long, v string")
    m1 = table_manifest(df, ["k", "v"], "t").first()
    assert m1.n_rows == 3 and m1.n_nulls == 1

    # row order / partitioning invariance
    m2 = table_manifest(
        spark.createDataFrame(list(reversed(rows)), "k long, v string")
        .repartition(7),
        ["k", "v"],
        "t",
    ).first()
    assert (m2.n_rows, m2.content_xor, m2.n_nulls) == (
        m1.n_rows, m1.content_xor, m1.n_nulls,
    )

    # a one-value edit flips the digest
    m3 = table_manifest(
        spark.createDataFrame([(1, "a"), (2, "B"), (3, None)], "k long, v string"),
        ["k", "v"],
        "t",
    ).first()
    assert m3.content_xor != m1.content_xor
    # NULL and empty string hash differently
    m4 = table_manifest(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "")], "k long, v string"),
        ["k", "v"],
        "t",
    ).first()
    assert m4.content_xor != m1.content_xor and m4.n_nulls == 0


def test_snapshot_diff_classification(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.cleaning import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),    # unchanged -> absent
            (2, "b", 20.0),    # NULL -> value  = changed (null-safe)
            (4, None, 40.0),   # NULL == NULL   = unchanged -> absent
            (5, "e", 50.0),    # added
        ],                     # 3 missing     = removed
        "k long, s string, v double",
    )
    got = {
        (r.k, r.change_type) for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {(2, "changed"), (3, "removed"), (5, "added")}


def test_snapshot_diff_hash_matches_struct(spark):
    """hash_compare=True (8-byte digests in the shuffle) must classify
    identically to the exact struct comparison."""
    from lab_etl_batch_data_processing_pipeline__spark.operators.cleaning import snapshot_diff

    old = spark.range(0, 200).selectExpr(
        "id AS k",
        "CASE WHEN id % 11 = 0 THEN NULL ELSE concat('s', id % 7) END AS s",
        "CAST(id % 13 AS DOUBLE) AS v",
    )
    new = spark.range(0, 210).filter("id % 17 != 0").selectExpr(
        "id AS k",
        "CASE WHEN id % 11 = 0 THEN NULL ELSE concat('s', id % 7) END AS s",
        "CAST(CASE WHEN id % 19 = 0 THEN id ELSE id % 13 END AS DOUBLE) AS v",
    )
    exact = sorted(
        (r.k, r.change_type) for r in snapshot_diff(old, new, ["k"]).collect()
    )
    hashed = sorted(
        (r.k, r.change_type)
        for r in snapshot_diff(old, new, ["k"], hash_compare=True).collect()
    )
    assert exact == hashed and exact  # non-empty and identical


def test_orc_roundtrip_preserves_values(spark, tmp_path):
    from lab_etl_batch_data_processing_pipeline__spark.sources import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a", 1.5, None), (2, None, -0.25, 7)],
        "id long, s string, v double, n int",
    )
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # partitioned form preserves hive layout
    write_orc(df, path + "2", partition_by=["id"])
    import os
    assert sorted(os.listdir(path + "2"))[0].startswith("id=")


def test_fuzzy_pairs_and_degree(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import linkage
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "B1", "cold widget"),
            (2, "B1", "bold widget"),    # dist 1 from 1
            (3, "B1", "cold gadget"),    # different noun -> different block
            (4, "B2", "cold widget"),    # different brand -> different block
            (5, "B1", "colder widgets"), # same noun? 'widgets' != 'widget' -> other block
            (6, "B1", "old widget"),     # dist 1 from both 1 and 2 (one deletion)
        ],
        "id long, brand string, name string",
    )
    blocks = ["brand", F.element_at(F.split(F.col("name"), " "), 2)]
    pairs = {
        (r.id_a, r.id_b): r.distance
        for r in linkage.fuzzy_pairs(df, "id", "name", blocks, 2).collect()
    }
    assert pairs == {(1, 2): 1, (1, 6): 1, (2, 6): 1}
    deg = {
        r.id: (r.n_matches, r.min_distance)
        for r in linkage.fuzzy_match_degree(df, "id", "name", blocks, 2).collect()
    }
    assert deg == {1: (2, 1), 2: (2, 1), 6: (2, 1)}


def test_snapshot_diff_key_only_tables(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.cleaning import snapshot_diff

    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {(r.k, r.change_type) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {(1, "removed"), (3, "added")}


def test_snapshot_diff_hash_detects_null_column_swap(spark):
    """Regression: Spark's xxhash64 skips NULL children, so raw-column
    hashing reads ('555', NULL) -> (NULL, '555') as unchanged; the
    sentinel-encoded hash must classify it 'changed' like the exact
    form."""
    from lab_etl_batch_data_processing_pipeline__spark.operators.cleaning import snapshot_diff

    old = spark.createDataFrame([(1, "555", None)], "k long, a string, b string")
    new = spark.createDataFrame([(1, None, "555")], "k long, a string, b string")
    for hc in (False, True):
        got = [
            (r.k, r.change_type)
            for r in snapshot_diff(old, new, ["k"], hash_compare=hc).collect()
        ]
        assert got == [(1, "changed")], hc


def test_snapshot_diff_hash_compare_rejects_complex(spark):
    """ADVICE r8: hash_compare string-encodes columns, which is lossy for
    nested types — complex compare columns must raise, steering callers
    to the exact struct form."""
    from lab_etl_batch_data_processing_pipeline__spark.operators.cleaning import snapshot_diff

    old = spark.createDataFrame([(1, ["a", "b"])], "k long, v array<string>")
    with pytest.raises(ValueError, match="scalar"):
        snapshot_diff(old, old, ["k"], hash_compare=True)
    # default struct form still handles nested types
    assert snapshot_diff(old, old, ["k"]).count() == 0
