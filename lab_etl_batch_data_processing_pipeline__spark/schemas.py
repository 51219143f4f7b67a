"""Schema registry: fixed, declared StructTypes for every table.

The reference declares every input schema explicitly (PySpark StructTypes
at reference spark-job/apps/curated_tranformation.py:17-69 and Postgres DDL
at scripts/init_db.sql) — schema-on-read inference is never used. This
module is the engine's single source of truth for those shapes, plus the
driver testdata tables the correctness harness runs on (TESTDATA.md).

Raw-layer date-like fields arrive as *strings* in ``dd/MM/yyyy`` and are
normalized to DateType by the cleaning layer (operators/cleaning.py), so
the raw StructTypes below keep them as StringType on purpose.
"""

from __future__ import annotations

from pyspark.sql import types as T

RAW_DATE_FORMAT = "dd/MM/yyyy"

# ---------------------------------------------------------------------------
# Reference source tables (rental marketplace).
# Parity: curated_tranformation.py:17-69; init_db.sql:11-78.
# ---------------------------------------------------------------------------

APARTMENT_ATTRIBUTES = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("category", T.StringType()),
        T.StructField("body", T.StringType()),
        # Delimited list-as-text in raw; cleaning exposes an ArrayType view.
        T.StructField("amenities", T.StringType()),
        T.StructField("bathrooms", T.IntegerType()),
        T.StructField("bedrooms", T.IntegerType()),
        T.StructField("fee", T.DecimalType(5, 2)),
        T.StructField("has_photo", T.BooleanType()),
        T.StructField("pets_allowed", T.BooleanType()),
        T.StructField("price_display", T.StringType()),
        T.StructField("price_type", T.StringType()),
        T.StructField("square_feet", T.IntegerType()),
        T.StructField("address", T.StringType()),
        T.StructField("cityname", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("latitude", T.DecimalType(9, 6)),
        T.StructField("longitude", T.DecimalType(9, 6)),
    ]
)

USER_VIEWING = T.StructType(
    [
        T.StructField("user_id", T.IntegerType(), False),
        T.StructField("apartment_id", T.IntegerType(), False),
        T.StructField("viewed_at", T.StringType()),  # dd/MM/yyyy
        T.StructField("is_wishlisted", T.BooleanType()),
        T.StructField("call_to_action", T.StringType()),
    ]
)

APARTMENTS = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("title", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("price", T.DecimalType(6, 2)),
        T.StructField("currency", T.StringType()),
        T.StructField("listing_created_on", T.StringType()),  # dd/MM/yyyy
        T.StructField("is_active", T.BooleanType()),
        T.StructField("last_modified_timestamp", T.StringType()),  # dd/MM/yyyy
    ]
)

BOOKINGS = T.StructType(
    [
        T.StructField("booking_id", T.IntegerType(), False),
        T.StructField("user_id", T.IntegerType()),
        T.StructField("apartment_id", T.IntegerType()),
        T.StructField("booking_date", T.StringType()),  # dd/MM/yyyy
        T.StructField("checkin_date", T.StringType()),  # dd/MM/yyyy
        T.StructField("checkout_date", T.StringType()),  # dd/MM/yyyy
        T.StructField("total_price", T.DecimalType(7, 2)),
        T.StructField("currency", T.StringType()),
        T.StructField("booking_status", T.StringType()),
    ]
)

# In-memory literal dimension (curated_tranformation.py:121-125); a real
# deployment swaps in a maintained dimension table via sources.memory_table.
EXCHANGE_RATES_ROWS = [("USD", 1.0), ("EUR", 1.1), ("INR", 0.012)]
EXCHANGE_RATES = T.StructType(
    [
        T.StructField("currency", T.StringType(), False),
        T.StructField("usd_rate", T.DoubleType(), False),
    ]
)

# Curated denormalized output shape (curated_tranformation.py:204-221;
# scripts/curate_db.sql:9-27): 16 columns.
CURATED_APARTMENT_BOOKINGS = T.StructType(
    [
        T.StructField("booking_id", T.IntegerType()),
        T.StructField("apartment_id", T.IntegerType()),
        T.StructField("user_id", T.IntegerType()),
        T.StructField("category", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("cityname", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("listing_created_on", T.DateType()),
        T.StructField("is_active", T.BooleanType()),
        T.StructField("booking_date", T.DateType()),
        T.StructField("checkin_date", T.DateType()),
        T.StructField("checkout_date", T.DateType()),
        T.StructField("booking_status", T.StringType()),
        T.StructField("total_price_usd", T.DoubleType()),
    ]
)

RAW_TABLES = {
    "apartment_attributes": APARTMENT_ATTRIBUTES,
    "user_viewing": USER_VIEWING,
    "apartments": APARTMENTS,
    "bookings": BOOKINGS,
}

# Columns that hold dd/MM/yyyy strings in the raw layer, per table.
RAW_DATE_COLUMNS = {
    "user_viewing": ["viewed_at"],
    "apartments": ["listing_created_on", "last_modified_timestamp"],
    "bookings": ["booking_date", "checkin_date", "checkout_date"],
}

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md / FIXTURES.md §B). Parquet carries its
# own schema; these exist for validation and documentation.
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
