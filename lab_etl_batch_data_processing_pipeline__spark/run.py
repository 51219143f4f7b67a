"""CLI pipeline runner: the engine's spark-submit entry point.

Replaces the reference's two job scripts + Step Functions sequencing
(SURVEY.md §3 E1-E3) with one idempotent command:

    python -m lab_etl_batch_data_processing_pipeline__spark.run \
        --raw-dir /data/raw --out-dir /data/lake [--csv-header] \
        [--curated-only]

Reads the four raw tables (CSV with the declared reference schemas, or
parquet), runs raw -> curated -> presentation, and writes every output
table as parquet under ``<out-dir>/curated`` and ``<out-dir>/presentation``
with overwrite semantics (re-runs replace, never duplicate).
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import DataFrame, SparkSession

from . import schemas
from .plans.pipeline import curate, present
from .session import get_spark
from .sources.readers import read_csv, read_parquet
from .sources.writers import write_parquet


def _read_raw(spark: SparkSession, raw_dir: str, table: str, header: bool) -> DataFrame:
    parquet_path = os.path.join(raw_dir, f"{table}.parquet")
    if os.path.exists(parquet_path):
        return read_parquet(spark, parquet_path)
    return read_csv(
        spark, os.path.join(raw_dir, f"{table}.csv"), schemas.RAW_TABLES[table], header
    )


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--raw-dir", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument(
        "--csv-header",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="raw CSVs have a header row (disable with --no-csv-header)",
    )
    parser.add_argument(
        "--curated-only", action="store_true",
        help="run only the curation stage (E1), skip presentation metrics",
    )
    args = parser.parse_args(argv)

    spark = get_spark("lab-etl-pipeline")
    raw = {
        t: _read_raw(spark, args.raw_dir, t, args.csv_header)
        for t in ("apartment_attributes", "apartments", "bookings")
    }
    user_viewing_src = any(
        os.path.exists(os.path.join(args.raw_dir, f"user_viewing.{ext}"))
        for ext in ("csv", "parquet")
    )
    user_viewing = (
        _read_raw(spark, args.raw_dir, "user_viewing", args.csv_header)
        if user_viewing_src
        else None
    )

    curated = curate(
        spark,
        raw["apartment_attributes"],
        raw["apartments"],
        raw["bookings"],
        user_viewing,
    )
    for name, df in curated.items():
        write_parquet(df, os.path.join(args.out_dir, "curated", name))
    print(f"curated: wrote {len(curated)} tables to {args.out_dir}/curated")

    if not args.curated_only:
        metric_tables = present(
            curated["curated_apartment_bookings"], curated["apartments"]
        )
        for name, df in metric_tables.items():
            write_parquet(df, os.path.join(args.out_dir, "presentation", name))
        print(
            f"presentation: wrote {len(metric_tables)} metric tables to "
            f"{args.out_dir}/presentation"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
