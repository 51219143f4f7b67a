from __future__ import annotations

import tempfile

import pytest

from lab_etl_batch_data_processing_pipeline__spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "engine-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # saveAsTable targets (bucketing tests) land in a temp warehouse
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-"),
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
