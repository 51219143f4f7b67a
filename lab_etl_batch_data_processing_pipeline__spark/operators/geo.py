"""Spatial radius join — grid-cell blocking + exact integer verify.

The spatial analogue of the dedup blocking family (engine extension; the
reference stores latitude/longitude DecimalType(9,6) on
apartment_attributes — `curated_tranformation.py:33-34` — but never
queries them): find all point pairs within a radius without the O(n²)
cross join, by snapping points to a grid of radius-sized cells and
equi-joining each point against its 3x3 cell neighborhood — any pair
within ``radius`` must fall in adjacent cells, so candidate recall is
exactly 1.0 (no probabilistic trade; geometry, not hashing).

Distances are *planar microdegrees* in pure BIGINT arithmetic
(dlat² + dlon² <= r², exact on any engine). For city-scale radii the
planar approximation's error vs great-circle distance is the usual
cos(latitude) longitude compression — callers wanting metric-true
radii pre-scale the longitude column; the verify stays integer. A
haversine verify is a drop-in replacement but its trig produces
last-ulp differences across engines, which is why the oracle-checked
form is integer-planar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .layout import ensure_parallelism


def radius_pairs(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_udeg: int,
    sort: bool = True,
) -> DataFrame:
    """Self-join pairs (id_a, id_b, dist2) with planar microdegree
    distance² <= radius² (id_a < id_b, each undirected pair once).

    Scale shape: ONE equi-join keyed by grid cell. Side A replicates
    9x (its 3x3 neighborhood — the explode is of a constant 9-element
    offset array, not data); side B contributes one row per point
    keyed by its own cell. Candidates per point = population of the
    3x3 neighborhood — at uniform density that is ~9 * n * (r/extent)²,
    linear in n for a fixed radius; a dense "city" cell is the same
    hot-block story as the dedup family (AQE skew split applies, and
    the cell key is data-derived so a pathological all-one-point cell
    is a data property, not a hash artifact).
    """
    pts = ensure_parallelism(points).select(
        F.col(id_col).alias("__id"),
        F.col(lat_col).cast("long").alias("__lat"),
        F.col(lon_col).cast("long").alias("__lon"),
    )
    cell_lat = F.floor(F.col("__lat") / radius_udeg)
    cell_lon = F.floor(F.col("__lon") / radius_udeg)
    offsets = F.expr(
        "array(-1,0,1)"
    )
    a = (
        pts.withColumn("__dlat", F.explode(offsets))
        .withColumn("__dlon", F.explode(offsets))
        .select(
            "__id",
            "__lat",
            "__lon",
            (cell_lat + F.col("__dlat")).alias("__cl"),
            (cell_lon + F.col("__dlon")).alias("__cn"),
        )
        .alias("a")
    )
    b = pts.select(
        F.col("__id").alias("__bid"),
        F.col("__lat").alias("__blat"),
        F.col("__lon").alias("__blon"),
        cell_lat.alias("__cl"),
        cell_lon.alias("__cn"),
    ).alias("b")
    dlat = F.col("a.__lat") - F.col("__blat")
    dlon = F.col("a.__lon") - F.col("__blon")
    dist2 = dlat * dlat + dlon * dlon
    out = (
        a.join(b, on=["__cl", "__cn"])
        .filter(F.col("a.__id") < F.col("__bid"))
        # r² as a PYTHON int so the literal lands as a LongType — two
        # IntegerType lits would overflow int32 at city-scale radii
        .filter(dist2 <= F.lit(radius_udeg * radius_udeg))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("__bid").alias("id_b"),
            dist2.alias("dist2"),
        )
    )
    return out.orderBy("id_a", "id_b") if sort else out


def radius_degree(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_udeg: int,
) -> DataFrame:
    """Per-point neighbor report: (id, n_neighbors, min_dist2) — the
    corpus-sized collapse of :func:`radius_pairs` (pair lists are
    quadratic in local density; the degree pins the identical pair
    space — see dedup_fuzzy.near_dup_degree for the argument)."""
    pairs = radius_pairs(
        points, id_col, lat_col, lon_col, radius_udeg, sort=False
    )
    sides = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col), "dist2"
    )
    return (
        sides.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            F.min("dist2").alias("min_dist2"),
        )
        .orderBy(id_col)
    )
