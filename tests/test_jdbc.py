"""Real JDBC source/sink roundtrip (S1/S4) against embedded Derby, which
ships on Spark's classpath — no external database needed."""

from __future__ import annotations

import pytest

from lab_etl_batch_data_processing_pipeline__spark.sources import read_jdbc, write_jdbc

DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_write_then_read(spark, derby_url):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)],
        "id int, name string, score double",
    )
    write_jdbc(df, derby_url, "sink_tbl", mode="overwrite", properties=DRIVER)
    back = read_jdbc(spark, derby_url, "sink_tbl", properties=DRIVER)
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == [
        (1, "a", 1.5),
        (2, "b", 2.5),
        (3, "c", None),
    ]


def test_jdbc_append_mode_appends(spark, derby_url):
    df = spark.createDataFrame([(10, "x", 0.0)], "id int, name string, score double")
    write_jdbc(df, derby_url, "append_tbl", mode="overwrite", properties=DRIVER)
    write_jdbc(df, derby_url, "append_tbl", mode="append", properties=DRIVER)
    assert read_jdbc(spark, derby_url, "append_tbl", properties=DRIVER).count() == 2


def test_jdbc_partitioned_read(spark, derby_url):
    df = spark.range(0, 100).selectExpr("cast(id as int) AS id", "id * 2 AS v")
    write_jdbc(df, derby_url, "part_tbl", mode="overwrite", properties=DRIVER)
    back = read_jdbc(
        spark,
        derby_url,
        "part_tbl",
        properties=DRIVER,
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    # the scan really is split across 4 JDBC partitions
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
