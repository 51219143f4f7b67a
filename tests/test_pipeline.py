"""End-to-end raw->curated->presentation on reference-shaped literal data
(FIXTURES.md §A fixture guidance: dd/MM/yyyy strings, malformed dates,
unknown currency, duplicates, canceled bookings)."""

from __future__ import annotations

from decimal import Decimal

import pytest

from lab_etl_batch_data_processing_pipeline__spark.operators import enrich
from lab_etl_batch_data_processing_pipeline__spark.plans import run_pipeline
from lab_etl_batch_data_processing_pipeline__spark.schemas import (
    APARTMENT_ATTRIBUTES,
    APARTMENTS,
    BOOKINGS,
    CURATED_APARTMENT_BOOKINGS,
)


@pytest.fixture(scope="module")
def raw(spark):
    attrs = spark.createDataFrame(
        [
            (100, "1BHK", "desc", "gym,pool", 1, 1, None, True, True, "$", "m",
             500, "addr", "paris", "fr", None, None),
            (100, "1BHK", "desc", "gym,pool", 1, 1, None, True, True, "$", "m",
             500, "addr", "paris", "fr", None, None),  # exact duplicate
            (101, "2BHK", "desc2", "wifi", 2, 2, None, False, False, "$", "m",
             900, "addr2", "lyon", "fr", None, None),
        ],
        APARTMENT_ATTRIBUTES,
    )
    apartments = spark.createDataFrame(
        [
            (100, "Flat A", "Airbnb", Decimal("100.00"), "USD", "01/01/2024", True, "05/01/2024"),
            (101, "Flat B", "Zillow", Decimal("200.00"), "EUR", "03/01/2024", True, "05/01/2024"),
        ],
        APARTMENTS,
    )
    bookings = spark.createDataFrame(
        [
            (1, 7, 100, "05/01/2024", "10/01/2024", "12/01/2024", Decimal("300.00"), "USD", "confirmed"),
            (2, 7, 101, "15/01/2024", "20/01/2024", "22/01/2024", Decimal("100.00"), "EUR", "confirmed"),
            (3, 8, 999, "16/01/2024", "21/01/2024", "23/01/2024", Decimal("50.00"), "GBP", "confirmed"),
            (4, 9, 100, "bad-date", "17/01/2024", "18/01/2024", Decimal("80.00"), "USD", "canceled"),
        ],
        BOOKINGS,
    )
    return attrs, apartments, bookings


def test_pipeline_end_to_end(spark, raw):
    attrs, apartments, bookings = raw
    out = run_pipeline(spark, attrs, apartments, bookings)

    curated = out["curated_apartment_bookings"]
    # exact 16-column curated shape
    assert [f.name for f in CURATED_APARTMENT_BOOKINGS.fields] == curated.columns
    rows = {r.booking_id: r for r in curated.collect()}
    assert len(rows) == 4
    # currency conversion through the broadcast dim join
    assert rows[1].total_price_usd == pytest.approx(300.0)
    assert rows[2].total_price_usd == pytest.approx(110.0)  # 100 EUR * 1.1
    # unknown currency -> NULL usd amount, row survives (left join)
    assert rows[3].total_price_usd is None
    # booking to a nonexistent apartment keeps booking columns, null listing side
    assert rows[3].title is None and rows[3].cityname is None
    # malformed dd/MM/yyyy -> NULL date, not an ANSI error
    assert rows[4].booking_date is None
    # attribute dedup happened upstream of the join (no fan-out)
    assert rows[1].cityname == "paris"

    # presentation layer: all 7 metric tables materialize
    for name in [
        "average_listing_price",
        "occupancy_rate_per_month",
        "popular_cities_per_week",
        "top_listings_weekly_revenue",
        "total_bookings_per_user",
        "avg_booking_duration_per_month",
        "repeat_customer_rate_per_month",
    ]:
        assert out[name].count() >= 1, name

    # canceled booking invisible to metrics
    users = {r.user_id for r in out["total_bookings_per_user"].collect()}
    assert users == {7, 8}


def test_pipeline_rerun_is_deterministic(spark, raw):
    attrs, apartments, bookings = raw
    a = run_pipeline(spark, attrs, apartments, bookings)
    b = run_pipeline(spark, attrs, apartments, bookings)
    assert sorted(map(str, a["curated_apartment_bookings"].collect())) == sorted(
        map(str, b["curated_apartment_bookings"].collect())
    )


def test_default_exchange_rates_dimension(spark):
    rates = {r.currency: r.usd_rate for r in enrich.default_exchange_rates(spark).collect()}
    assert rates == {"USD": 1.0, "EUR": 1.1, "INR": 0.012}


def test_sql_view_parity_with_dsl_metrics(spark, raw):
    """The reference's entry form (spark.sql over temp views) and the
    engine's DataFrame DSL must agree row-for-row on every metric."""
    from lab_etl_batch_data_processing_pipeline__spark.operators import metrics_sql
    from lab_etl_batch_data_processing_pipeline__spark.plans import curate, present

    attrs, apartments, bookings = raw
    curated_tables = curate(spark, attrs, apartments, bookings)
    dsl = present(
        curated_tables["curated_apartment_bookings"], curated_tables["apartments"]
    )
    via_sql = metrics_sql.present_sql(
        spark,
        curated_tables["curated_apartment_bookings"],
        curated_tables["apartments"],
    )
    assert set(dsl) == set(via_sql)
    for name in dsl:
        a = sorted(map(str, dsl[name].collect()))
        b = sorted(map(str, via_sql[name].collect()))
        assert a == b, f"DSL vs SQL mismatch for {name}"



def test_corpus_prep_normalize_stage_collapses_byte_variants(spark):
    """normalize=True: a ZWSP-polluted, CRLF-ed copy of a document must
    collapse into its clean twin at the exact-dedup stage; without the
    stage both survive (the forever-duplicate failure mode)."""
    from lab_etl_batch_data_processing_pipeline__spark.plans.corpus import corpus_prep

    base = (
        "the quick brown fox jumps over the lazy dog and the morning is "
        "bright and the people walk to the market with the fresh bread"
    )
    polluted = base.replace("quick", "qu" + chr(0x200B) + "ick").replace(
        " and the people", " and the people\r\n"
    ).replace("jumps", "jumps ")
    other = (
        "training data pipelines need the deduplication stage and the "
        "quality gates to keep the corpus clean for the model to learn"
    )
    rows = [
        (1, base, "en", "src0"),
        (2, polluted, "en", "src0"),
        (3, other, "en", "src1"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")

    plain = corpus_prep(docs, min_quality=0.0, jaccard_threshold=0.99)
    norm = corpus_prep(docs, min_quality=0.0, jaccard_threshold=0.99, normalize=True)
    plain_ids = {r.doc_id for r in plain.collect()}
    norm_ids = {r.doc_id for r in norm.collect()}
    # byte-different -> both survive the plain funnel at this threshold
    assert plain_ids == {1, 2, 3}
    # normalized -> identical fingerprints, min doc_id survives
    assert norm_ids == {1, 3}
    # survivor text is the NORMALIZED form, schema unchanged
    out = {r.doc_id: r for r in norm.collect()}
    assert out[1].text == base
    assert set(norm.columns) == set(plain.columns)
