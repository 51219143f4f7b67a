"""End-to-end CLI run: raw CSVs in, curated + presentation parquet out."""

from __future__ import annotations

import subprocess
import sys

ATTRS_CSV = """id,category,body,amenities,bathrooms,bedrooms,fee,has_photo,pets_allowed,price_display,price_type,square_feet,address,cityname,state,latitude,longitude
100,1BHK,desc,"gym,pool",1,1,10.00,true,true,$,m,500,addr,paris,fr,48.85,2.35
"""
APARTMENTS_CSV = """id,title,source,price,currency,listing_created_on,is_active,last_modified_timestamp
100,Flat A,Airbnb,100.00,USD,01/01/2024,true,05/01/2024
"""
BOOKINGS_CSV = """booking_id,user_id,apartment_id,booking_date,checkin_date,checkout_date,total_price,currency,booking_status
1,7,100,05/01/2024,10/01/2024,12/01/2024,300.00,USD,confirmed
2,7,100,15/01/2024,20/01/2024,22/01/2024,100.00,EUR,confirmed
"""


def test_cli_pipeline_end_to_end(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "apartment_attributes.csv").write_text(ATTRS_CSV)
    (raw / "apartments.csv").write_text(APARTMENTS_CSV)
    (raw / "bookings.csv").write_text(BOOKINGS_CSV)
    out = tmp_path / "lake"

    result = subprocess.run(
        [
            sys.executable,
            "-m",
            "lab_etl_batch_data_processing_pipeline__spark.run",
            "--raw-dir", str(raw),
            "--out-dir", str(out),
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
             "SPARK_GRAFT_CPUS": "4", "SPARK_SHUFFLE_PARTITIONS": "4"},
        cwd="/root/repo",
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "curated: wrote" in result.stdout
    assert "presentation: wrote 7 metric tables" in result.stdout
    assert (out / "curated" / "curated_apartment_bookings").exists()
    assert (out / "presentation" / "repeat_customer_rate_per_month").exists()

    # re-run must overwrite, not duplicate (idempotence)
    rerun = subprocess.run(
        [
            sys.executable,
            "-m",
            "lab_etl_batch_data_processing_pipeline__spark.run",
            "--raw-dir", str(raw),
            "--out-dir", str(out),
            "--curated-only",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
             "SPARK_GRAFT_CPUS": "4", "SPARK_SHUFFLE_PARTITIONS": "4"},
        cwd="/root/repo",
    )
    assert rerun.returncode == 0, rerun.stderr[-2000:]
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{out}/curated/curated_apartment_bookings/*.parquet'"
    ).fetchone()[0]
    assert n == 2  # overwrite semantics: still exactly the 2 bookings
