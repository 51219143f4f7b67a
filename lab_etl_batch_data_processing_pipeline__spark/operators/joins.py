"""Join operators (SURVEY.md §2.3): the curated denormalization chain.

The reference's curated layer is a left-deep chain of left equi-joins
(J2 bookings⟕apartments, J3 ⟕apartment_attributes, J4 ⟕exchange_rates;
curated_tranformation.py:193-202). Outer-join order is semantic — Catalyst
does not reorder it — so the chain is kept left-deep as written.

Scale notes baked in:
- bounded dimensions are broadcast (no shuffle of the fact side);
- fact⟕fact joins are left to sort-merge + AQE (which switches to
  broadcast/skew-split at runtime when sizes allow);
- join keys are equi-keys on int/bigint columns, the cheapest shuffle keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def left_join_chain(
    base: DataFrame,
    *joins: tuple[DataFrame, Column | Sequence[str] | str, bool],
) -> DataFrame:
    """Fold ``(right, on, broadcast)`` triples into a left-deep chain of
    left equi-joins. ``on`` may be a Column condition or using-column name(s)."""
    out = base
    for right, on, use_broadcast in joins:
        right_side = F.broadcast(right) if use_broadcast else right
        out = out.join(right_side, on=on, how="left")
    return out


def curated_apartment_bookings(
    bookings: DataFrame,
    apartments: DataFrame,
    attributes: DataFrame,
    rates: DataFrame,
    broadcast_listings: bool = True,
) -> DataFrame:
    """The reference's curated join table, 16-column shape
    (curated_tranformation.py:193-221; curate_db.sql:9-27).

    Inputs are the *cleaned* tables (dates already DateType, rows deduped).
    rates is bounded by construction (currency cardinality) — always
    hard-hinted. apartments/attributes are listing-CATALOG-sized: pass
    ``broadcast_listings=False`` when the catalog scales past broadcast
    range — F.broadcast is obeyed regardless of size, so the hard hint
    would OOM where AQE would have degraded gracefully to sort-merge (or
    still broadcast at runtime if the catalog fits).
    """
    b = bookings.alias("b")
    hint = F.broadcast if broadcast_listings else (lambda df: df)
    a = hint(apartments.alias("a"))
    attr = hint(attributes.alias("attr"))
    # Rename the rates key so the join condition is alias-unambiguous (the
    # reference's dotted-string drop of join byproducts silently no-ops,
    # curate_data_etl_job.py:180 — proper Column references avoid that bug).
    r = rates.withColumnRenamed("currency", "__rate_ccy")

    joined = (
        b.join(a, F.col("b.apartment_id") == F.col("a.id"), "left")
        .join(attr, F.col("a.id") == F.col("attr.id"), "left")
        .join(F.broadcast(r), F.col("b.currency") == F.col("__rate_ccy"), "left")
    )

    return joined.select(
        F.col("b.booking_id").alias("booking_id"),
        F.col("b.apartment_id").alias("apartment_id"),
        F.col("b.user_id").alias("user_id"),
        F.col("attr.category").alias("category"),
        F.col("attr.body").alias("body"),
        F.col("attr.cityname").alias("cityname"),
        F.col("attr.state").alias("state"),
        F.col("a.title").alias("title"),
        F.col("a.source").alias("source"),
        F.col("a.listing_created_on").alias("listing_created_on"),
        F.col("a.is_active").alias("is_active"),
        F.col("b.booking_date").alias("booking_date"),
        F.col("b.checkin_date").alias("checkin_date"),
        F.col("b.checkout_date").alias("checkout_date"),
        F.col("b.booking_status").alias("booking_status"),
        (F.col("b.total_price").cast("double") * F.col("usd_rate")).alias("total_price_usd"),
    )
