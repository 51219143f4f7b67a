"""SQL-view parity for the metric layer.

Note the ``100.0D`` literals: Spark SQL parses a bare ``100.0`` as
DECIMAL(4,1) while the DataFrame DSL's ``F.lit(100.0)`` is DOUBLE — the
D suffix keeps both entry forms type-identical.

The reference computes its metrics as ``spark.sql`` strings over temp
views (present_summary.py:81-181, via createOrReplaceTempView — S7 in
SURVEY.md §2.1). This module preserves that entry form: the same M1-M7
semantics as `metrics.py`, as SQL text over a registered curated view.
Both forms compile to the same Catalyst logical plan shape; the test
suite asserts DSL == SQL results row-for-row.

SQL here targets the *curated* schema (booking_date/checkin_date/... as
real DATE columns), so no parsing appears in the metric text — cleaning
happens upstream, once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CURATED_VIEW = "apartment_bookings_v"

METRIC_SQL: dict[str, str] = {
    # M1 runs on the listings view (price_usd derived upstream).
    "average_listing_price": """
        SELECT to_date(date_trunc('week', listing_created_on)) AS week_start,
               CAST(SUM(CAST(price_usd AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(price_usd) AS avg_price
        FROM {listings}
        GROUP BY week_start ORDER BY week_start
    """,
    "occupancy_rate_per_month": """
        SELECT to_date(date_trunc('month', checkin_date)) AS month,
               COUNT(*) AS total_bookings,
               SUM(datediff(checkout_date, checkin_date)) AS booked_nights,
               COUNT(DISTINCT apartment_id)
                 * day(last_day(any_value(checkin_date))) AS available_nights,
               ROUND(100.0D * SUM(datediff(checkout_date, checkin_date))
                     / (COUNT(DISTINCT apartment_id)
                        * day(last_day(any_value(checkin_date)))), 2)
                 AS occupancy_rate
        FROM {curated}
        WHERE booking_status = 'confirmed'
        GROUP BY 1 ORDER BY 1
    """,
    "popular_cities_per_week": """
        SELECT to_date(date_trunc('week', booking_date)) AS week_start,
               cityname AS location,
               COUNT(*) AS total_bookings
        FROM {curated}
        WHERE booking_status = 'confirmed'
        GROUP BY 1, 2
        ORDER BY 1, total_bookings DESC, 2
    """,
    "top_listings_weekly_revenue": """
        SELECT to_date(date_trunc('week', booking_date)) AS week_start,
               apartment_id AS listing_id,
               CAST(ROUND(SUM(CAST(total_price_usd AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total_revenue
        FROM {curated}
        WHERE booking_status = 'confirmed'
        GROUP BY 1, 2
        ORDER BY 1, total_revenue DESC, 2
    """,
    "total_bookings_per_user": """
        SELECT user_id, COUNT(*) AS total_bookings
        FROM {curated}
        WHERE booking_status = 'confirmed'
        GROUP BY user_id ORDER BY user_id
    """,
    "avg_booking_duration_per_month": """
        SELECT to_date(date_trunc('month', checkin_date)) AS month,
               ROUND(AVG(datediff(checkout_date, checkin_date)), 2)
                 AS avg_duration_days
        FROM {curated}
        WHERE booking_status = 'confirmed'
        GROUP BY 1 ORDER BY 1
    """,
    # M7: same three-stage CTE shape as the reference SQL.
    "repeat_customer_rate_per_month": """
        WITH ordered AS (
          SELECT user_id, booking_date,
                 LAG(booking_date) OVER (
                   PARTITION BY user_id
                   ORDER BY booking_date, booking_id) AS prev_booking_date
          FROM {curated}
          WHERE booking_status = 'confirmed'
        ), flagged AS (
          SELECT *,
                 CASE WHEN prev_booking_date IS NOT NULL
                       AND datediff(booking_date, prev_booking_date) <= 30
                      THEN 1 ELSE 0 END AS is_repeat
          FROM ordered
        )
        SELECT to_date(date_trunc('month', booking_date)) AS month,
               COUNT(DISTINCT CASE WHEN is_repeat = 1 THEN user_id END)
                 AS repeat_customers,
               COUNT(DISTINCT user_id) AS total_customers,
               ROUND(100.0D * COUNT(DISTINCT CASE WHEN is_repeat = 1 THEN user_id END)
                     / COUNT(DISTINCT user_id), 2) AS repeat_rate_pct
        FROM flagged GROUP BY 1 ORDER BY 1
    """,
}


def run_metric_sql(
    spark: SparkSession,
    name: str,
    curated: DataFrame,
    listings: DataFrame | None = None,
) -> DataFrame:
    """Run ONE metric through the temp-view SQL entry point (S7).

    Registers only the views the caller supplies; each METRIC_SQL entry
    references exactly one of {curated}/{listings}, so the other
    placeholder resolves to a never-read view name.
    """
    curated.createOrReplaceTempView(CURATED_VIEW)
    if listings is not None:
        listings.createOrReplaceTempView("listings_v")
    return spark.sql(METRIC_SQL[name].format(curated=CURATED_VIEW, listings="listings_v"))


def present_sql(
    spark: SparkSession,
    curated: DataFrame,
    listings: DataFrame,
) -> dict[str, DataFrame]:
    """Run all 7 metrics through the SQL entry point (temp-view parity)."""
    curated.createOrReplaceTempView(CURATED_VIEW)
    listings.createOrReplaceTempView("listings_v")
    return {
        name: spark.sql(sql.format(curated=CURATED_VIEW, listings="listings_v"))
        for name, sql in METRIC_SQL.items()
    }
