from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from lab_etl_batch_data_processing_pipeline__spark.operators import ranges


def _d(s: str) -> datetime.date:
    return datetime.date.fromisoformat(s)


def test_date_range_join_inclusive_bounds_and_left_rows(spark):
    intervals = spark.createDataFrame(
        [
            (1, _d("2024-01-01"), _d("2024-01-03")),
            (2, _d("2024-02-01"), _d("2024-02-01")),  # single-day range
            (3, _d("2024-03-01"), _d("2024-03-02")),  # matches nothing
        ],
        "iv_id int, start_day date, end_day date",
    )
    points = spark.createDataFrame(
        [
            (_d("2023-12-31"), 7),  # day before interval 1 -> excluded
            (_d("2024-01-01"), 10),  # start bound inclusive
            (_d("2024-01-03"), 20),  # end bound inclusive
            (_d("2024-01-04"), 40),  # day after -> excluded
            (_d("2024-02-01"), 5),
        ],
        "day date, v int",
    )
    out = ranges.date_range_join(
        intervals, points, "start_day", "end_day", "day", how="left"
    )
    sums = {
        r.iv_id: r.total
        for r in out.groupBy("iv_id").agg(F.sum("v").alias("total")).collect()
    }
    assert sums[1] == 30  # both inclusive endpoints, inner days only
    assert sums[2] == 5
    assert sums[3] is None  # left join keeps empty intervals
    # no helper column leaks into the output
    assert ranges.BUCKET_COL not in out.columns


def test_radius_pairs_exact_recall_vs_brute_force(spark):
    """Grid blocking must lose nothing: pairs == the brute-force cross
    join at any radius (recall is geometric, exactly 1.0)."""
    from pyspark.sql import functions as F

    from lab_etl_batch_data_processing_pipeline__spark.operators import geo

    pts = spark.range(1, 200).select(
        F.col("id"),
        (F.col("id") * 7919 % 100000).alias("lat"),
        (F.col("id") * 104729 % 100000).alias("lon"),
    )
    r = 20000
    blocked = {
        (x.id_a, x.id_b, x.dist2)
        for x in geo.radius_pairs(pts, "id", "lat", "lon", r).collect()
    }
    rows = pts.collect()
    brute = {
        (a.id, b.id, (a.lat - b.lat) ** 2 + (a.lon - b.lon) ** 2)
        for a in rows
        for b in rows
        if a.id < b.id
        and (a.lat - b.lat) ** 2 + (a.lon - b.lon) ** 2 <= r * r
    }
    assert blocked == brute and len(brute) > 0
