"""The seven canonical business metrics (SURVEY.md §2.4, M1-M7), as
parameterized DataFrame operators.

Each metric is a pure function over a "bookings-like" DataFrame with the
role columns passed explicitly, so the same operator runs on the
reference's rental schema (bookings/apartments) and on the driver testdata
(orders/lineitem) without modification. All expressions are built-in
(JVM-side, whole-stage codegen); every aggregate goes through Spark's
partial->shuffle->final hash aggregation, and outputs are small so the
trailing ``orderBy`` is cheap.

Reference parity (file:line of the original SQL):
- M1 avg_listing_price_weekly     curated_tranformation.py:184-190
- M2 occupancy_rate_monthly       present_summary.py:81-97
- M3 popular_locations_weekly     present_summary.py:99-108
- M4 top_revenue_weekly           present_summary.py:110-119 (+ explicit
                                  top-k window variant the spec implies)
- M5 bookings_per_user            present_summary.py:121-130
- M6 avg_duration_monthly         present_summary.py:132-140
- M7 repeat_customer_rate_monthly present_summary.py:142-181
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _week(col: str | Column) -> Column:
    """Monday-based week start as DateType (Spark date_trunc is Monday-based,
    matching DuckDB/Postgres — verified on boundary dates in tests)."""
    return F.to_date(F.date_trunc("week", F.col(col) if isinstance(col, str) else col))


def _month(col: str | Column) -> Column:
    return F.to_date(F.date_trunc("month", F.col(col) if isinstance(col, str) else col))


def avg_listing_price_weekly(
    listings: DataFrame,
    created_col: str,
    price_col: str,
    active_col: str | None = None,
) -> DataFrame:
    """M1: average listing price per week the listing was created.

    The reference skips the spec's "active listings" filter
    (curated_tranformation.py:184-190, SURVEY.md §2.9 quirk 4); pass
    ``active_col`` for the spec-faithful variant, None for reference parity.
    """
    df = listings.filter(F.col(active_col)) if active_col else listings
    # Money is summed as DECIMAL: float summation is order-dependent (the
    # parallel merge order changes the low bits run to run), decimal
    # summation is exact and associative — reproducible at any parallelism.
    return (
        df.groupBy(_week(created_col).alias("week_start"))
        .agg(
            (
                F.sum(F.col(price_col).cast("decimal(18,4)")).cast("double")
                / F.count(price_col)
            ).alias("avg_price")
        )
        .orderBy("week_start")
    )


def occupancy_rate_monthly(
    bookings: DataFrame,
    checkin_col: str,
    checkout_col: str,
    unit_col: str,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M2: per checkin-month, booked nights / available nights * 100.

    Denominator follows the reference exactly (present_summary.py:88-91):
    (distinct units booked that month) x days-in-month, where days-in-month
    comes from ``DAY(LAST_DAY(ANY_VALUE(checkin)))`` — deterministic because
    every row in the group shares the month. COUNT(DISTINCT) triggers
    Catalyst's expand + two-phase aggregation; fine at scale because the
    group count (months) is tiny.
    """
    df = bookings
    if status_col:
        df = df.filter(F.col(status_col) == confirmed_value)
    checkin = F.to_date(F.col(checkin_col))
    checkout = F.to_date(F.col(checkout_col))
    return (
        df.groupBy(_month(checkin_col).alias("month"))
        .agg(
            F.count(F.lit(1)).alias("total_bookings"),
            F.sum(F.datediff(checkout, checkin)).alias("booked_nights"),
            (
                F.countDistinct(unit_col)
                * F.dayofmonth(F.last_day(F.any_value(checkin)))
            ).alias("available_nights"),
        )
        .withColumn(
            "occupancy_rate",
            F.round(F.lit(100.0) * F.col("booked_nights") / F.col("available_nights"), 2),
        )
        .orderBy("month")
    )


def popular_locations_weekly(
    bookings: DataFrame,
    date_col: str,
    location_col: str,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M3: bookings per (week, location), busiest first."""
    df = bookings
    if status_col:
        df = df.filter(F.col(status_col) == confirmed_value)
    return (
        df.groupBy(_week(date_col).alias("week_start"), F.col(location_col).alias("location"))
        .agg(F.count(F.lit(1)).alias("total_bookings"))
        .orderBy("week_start", F.col("total_bookings").desc(), "location")
    )


def top_revenue_weekly(
    bookings: DataFrame,
    date_col: str,
    unit_col: str,
    revenue_expr: Column,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M4: revenue per (week, unit), highest first (reference's global-sort
    form, present_summary.py:110-119)."""
    df = bookings
    if status_col:
        df = df.filter(F.col(status_col) == confirmed_value)
    return (
        df.groupBy(_week(date_col).alias("week_start"), F.col(unit_col).alias("listing_id"))
        # Exact decimal sum (order-independent), rounded to cents; see
        # avg_listing_price_weekly for why money never sums as float.
        .agg(
            F.round(F.sum(revenue_expr.cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_revenue")
        )
        .orderBy("week_start", F.col("total_revenue").desc(), "listing_id")
    )


def top_revenue_weekly_topk(
    bookings: DataFrame,
    date_col: str,
    unit_col: str,
    revenue_expr: Column,
    k: int = 5,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M4 top-k variant: rank within each week, keep the k best.

    The spec says "top performing listings"; the reference approximates with
    a global sort. A ranking window partitioned by week does it exactly and
    scales: one shuffle on week_start, in-partition sort, early filter.
    Ties broken by listing_id for determinism.
    """
    agg = top_revenue_weekly(
        bookings, date_col, unit_col, revenue_expr, status_col, confirmed_value
    )
    w = Window.partitionBy("week_start").orderBy(
        F.col("total_revenue").desc(), F.col("listing_id").asc()
    )
    return (
        agg.withColumn("revenue_rank", F.row_number().over(w))
        .filter(F.col("revenue_rank") <= k)
        .orderBy("week_start", "revenue_rank")
    )


def bookings_per_user(
    bookings: DataFrame,
    user_col: str,
    spend_col: str | None = None,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M5: confirmed bookings (and optional total spend) per user."""
    df = bookings
    if status_col:
        df = df.filter(F.col(status_col) == confirmed_value)
    aggs = [F.count(F.lit(1)).alias("total_bookings")]
    if spend_col:
        aggs.append(
            F.round(F.sum(F.col(spend_col).cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_spend")
        )
    return (
        df.groupBy(F.col(user_col).alias("user_id")).agg(*aggs).orderBy("user_id")
    )


def avg_duration_monthly(
    bookings: DataFrame,
    checkin_col: str,
    checkout_col: str,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M6: ROUND(AVG(nights), 2) per checkin-month."""
    df = bookings
    if status_col:
        df = df.filter(F.col(status_col) == confirmed_value)
    nights = F.datediff(F.to_date(F.col(checkout_col)), F.to_date(F.col(checkin_col)))
    return (
        df.groupBy(_month(checkin_col).alias("month"))
        .agg(F.round(F.avg(nights), 2).alias("avg_duration_days"))
        .orderBy("month")
    )


def repeat_customer_rate_monthly(
    bookings: DataFrame,
    user_col: str,
    date_col: str,
    tiebreak_col: str | None = None,
    repeat_within_days: int = 30,
    status_col: str | None = None,
    confirmed_value: str = "confirmed",
) -> DataFrame:
    """M7: % of that month's users whose booking follows their previous one
    within ``repeat_within_days`` (present_summary.py:142-181).

    Stage 1 is a LAG window over (user, date) — one shuffle on user_id, the
    natural partitioning for per-user history, with an explicit tiebreak
    column so the lag is deterministic under same-day bookings. Stage 2 is a
    conditional distinct count per month (NULLs from the CASE drop out of
    COUNT(DISTINCT), matching the reference SQL).
    """
    df = bookings
    if status_col:
        df = df.filter(F.col(status_col) == confirmed_value)
    order_cols = [F.col(date_col).asc()]
    if tiebreak_col:
        order_cols.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    date = F.to_date(F.col(date_col))

    flagged = df.select(
        F.col(user_col).alias("user_id"),
        date.alias("booking_date"),
        F.lag(date).over(w).alias("prev_booking_date"),
    ).withColumn(
        "is_repeat",
        F.when(
            F.col("prev_booking_date").isNotNull()
            & (F.datediff(F.col("booking_date"), F.col("prev_booking_date")) <= repeat_within_days),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return (
        flagged.groupBy(_month("booking_date").alias("month"))
        .agg(
            F.countDistinct(
                F.when(F.col("is_repeat") == 1, F.col("user_id"))
            ).alias("repeat_customers"),
            F.countDistinct("user_id").alias("total_customers"),
        )
        .withColumn(
            "repeat_rate_pct",
            F.round(
                F.lit(100.0) * F.col("repeat_customers") / F.col("total_customers"), 2
            ),
        )
        .orderBy("month")
    )

