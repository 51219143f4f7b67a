"""Metric operators on hand-computed literal fixtures (reference shape:
bookings with confirmed/canceled statuses, FIXTURES.md §A)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lab_etl_batch_data_processing_pipeline__spark.operators import metrics

D = dt.date


@pytest.fixture(scope="module")
def bookings(spark):
    # user, apartment, booking_date, checkin, checkout, price, status
    rows = [
        # Jan: u1 books twice 10 days apart (repeat), u2 once
        (1, 100, D(2024, 1, 5), D(2024, 1, 10), D(2024, 1, 12), 100.0, "confirmed"),
        (1, 101, D(2024, 1, 15), D(2024, 1, 20), D(2024, 1, 25), 200.0, "confirmed"),
        (2, 100, D(2024, 1, 20), D(2024, 1, 28), D(2024, 1, 31), 150.0, "confirmed"),
        # canceled row must be invisible to every metric
        (3, 102, D(2024, 1, 21), D(2024, 1, 22), D(2024, 1, 23), 999.0, "canceled"),
        # Feb: u1 again 31 days after Jan 15 (NOT repeat), u3 new
        (1, 100, D(2024, 2, 15), D(2024, 2, 20), D(2024, 2, 22), 50.0, "confirmed"),
        (3, 101, D(2024, 2, 10), D(2024, 2, 11), D(2024, 2, 11), 75.0, "confirmed"),
    ]
    return spark.createDataFrame(
        rows,
        "user_id int, apartment_id int, booking_date date, checkin_date date, "
        "checkout_date date, total_price_usd double, booking_status string",
    )


def test_bookings_per_user(bookings):
    out = {
        r.user_id: (r.total_bookings, r.total_spend)
        for r in metrics.bookings_per_user(
            bookings, "user_id", "total_price_usd", "booking_status"
        ).collect()
    }
    assert out == {1: (3, 350.0), 2: (1, 150.0), 3: (1, 75.0)}


def test_avg_duration_monthly(bookings):
    out = {
        str(r.month): r.avg_duration_days
        for r in metrics.avg_duration_monthly(
            bookings, "checkin_date", "checkout_date", "booking_status"
        ).collect()
    }
    # Jan: (2 + 5 + 3) / 3 = 3.33 ; Feb: (2 + 0) / 2 = 1.0
    assert out == {"2024-01-01": 3.33, "2024-02-01": 1.0}


def test_occupancy_monthly_reference_denominator(bookings):
    out = {
        str(r.month): r
        for r in metrics.occupancy_rate_monthly(
            bookings, "checkin_date", "checkout_date", "apartment_id", "booking_status"
        ).collect()
    }
    jan = out["2024-01-01"]
    # 2 distinct apartments x 31 days = 62 available, 10 booked nights
    assert jan.total_bookings == 3
    assert jan.booked_nights == 10
    assert jan.available_nights == 62
    assert jan.occupancy_rate == round(100 * 10 / 62, 2)
    feb = out["2024-02-01"]
    assert feb.available_nights == 2 * 29  # leap February
    assert feb.booked_nights == 2


def test_popular_locations_weekly_orders_by_count(spark):
    df = spark.createDataFrame(
        [
            (D(2024, 1, 1), "paris", "confirmed"),
            (D(2024, 1, 2), "paris", "confirmed"),
            (D(2024, 1, 3), "lyon", "confirmed"),
            (D(2024, 1, 8), "lyon", "confirmed"),  # next week
            (D(2024, 1, 2), "nice", "canceled"),
        ],
        "booking_date date, cityname string, booking_status string",
    )
    rows = metrics.popular_locations_weekly(
        df, "booking_date", "cityname", "booking_status"
    ).collect()
    assert [(str(r.week_start), r.location, r.total_bookings) for r in rows] == [
        ("2024-01-01", "paris", 2),
        ("2024-01-01", "lyon", 1),
        ("2024-01-08", "lyon", 1),
    ]


def test_week_truncation_is_monday_based(spark):
    # Sunday 2024-01-07 belongs to the week starting Monday 2024-01-01
    df = spark.createDataFrame(
        [(D(2024, 1, 7), "x", "confirmed"), (D(2024, 1, 8), "x", "confirmed")],
        "booking_date date, cityname string, booking_status string",
    )
    weeks = sorted(
        str(r.week_start)
        for r in metrics.popular_locations_weekly(
            df, "booking_date", "cityname", "booking_status"
        ).collect()
    )
    assert weeks == ["2024-01-01", "2024-01-08"]


def test_avg_listing_price_weekly_active_filter(spark):
    df = spark.createDataFrame(
        [
            (D(2024, 1, 1), 100.0, True),
            (D(2024, 1, 2), 300.0, True),
            (D(2024, 1, 3), 999.0, False),
        ],
        "listing_created_on date, price_usd double, is_active boolean",
    )
    all_rows = metrics.avg_listing_price_weekly(
        df, "listing_created_on", "price_usd"
    ).collect()
    assert all_rows[0].avg_price == pytest.approx((100 + 300 + 999) / 3)
    active = metrics.avg_listing_price_weekly(
        df, "listing_created_on", "price_usd", active_col="is_active"
    ).collect()
    assert active[0].avg_price == pytest.approx(200.0)


def test_top_revenue_weekly_topk(bookings):
    out = metrics.top_revenue_weekly_topk(
        bookings,
        "booking_date",
        "apartment_id",
        F.col("total_price_usd"),
        k=1,
        status_col="booking_status",
    ).collect()
    # one winner per week, rank always 1
    assert all(r.revenue_rank == 1 for r in out)
    by_week = {str(r.week_start): (r.listing_id, r.total_revenue) for r in out}
    assert by_week["2024-01-15"] == (101, 200.0)


def test_repeat_customer_rate_monthly(bookings):
    out = {
        str(r.month): r
        for r in metrics.repeat_customer_rate_monthly(
            bookings,
            "user_id",
            "booking_date",
            tiebreak_col="apartment_id",
            status_col="booking_status",
        ).collect()
    }
    # Jan: u1's 2nd booking is 10 days after the 1st -> repeat; u2 not.
    jan = out["2024-01-01"]
    assert (jan.repeat_customers, jan.total_customers, jan.repeat_rate_pct) == (1, 2, 50.0)
    # Feb: u1's booking is 31 days after Jan 15 -> NOT repeat (boundary is <=30)
    feb = out["2024-02-01"]
    assert (feb.repeat_customers, feb.total_customers, feb.repeat_rate_pct) == (0, 2, 0.0)


def test_repeat_rate_30_day_boundary_inclusive(spark):
    df = spark.createDataFrame(
        [(1, D(2024, 1, 1), "confirmed"), (1, D(2024, 1, 31), "confirmed")],
        "user_id int, booking_date date, booking_status string",
    )
    out = metrics.repeat_customer_rate_monthly(
        df, "user_id", "booking_date", status_col="booking_status"
    ).collect()
    assert {str(r.month): r.repeat_customers for r in out} == {
        "2024-01-01": 1  # exactly 30 days apart counts as repeat
    }


def test_rolling_range_frame_ages_out_calendar_gaps(spark):
    """RANGE frames slide over calendar days: a day 10 days after the
    last activity must NOT include it (a rowsBetween frame would — rows
    frames stretch across date gaps)."""
    from lab_etl_batch_data_processing_pipeline__spark.operators import windows

    df = spark.createDataFrame(
        [
            ("A", "2024-01-01", 10.0),
            ("A", "2024-01-03", 20.0),   # within 7d of the 1st
            ("A", "2024-01-20", 40.0),   # 17 days later: alone in its frame
        ],
        "k string, d string, amt double",
    )
    out = {
        str(r.day_date): (r.rolling_amount, r.rolling_rows)
        for r in windows.rolling_window_sum(df, "k", "d", "amt", window_days=7).collect()
    }
    assert out["2024-01-01"] == (10.0, 1)
    assert out["2024-01-03"] == (30.0, 2)
    assert out["2024-01-20"] == (40.0, 1)  # old days aged out of the frame
