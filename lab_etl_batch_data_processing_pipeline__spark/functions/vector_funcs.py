"""Vector Column-expression builders for embedding columns (array<float>).

Everything here is built from Spark's higher-order array functions
(``zip_with`` + ``aggregate``) so the arithmetic runs JVM-side inside
codegen — no Python per row, no UDF serialization. The fold is sequential
left-to-right in index order, which makes results bit-deterministic
(important for oracle-diff testing and reproducible top-k ranking).

For very wide vectors (>1k dims) a vectorized Pandas UDF over Arrow
batches can win on raw FLOPs; operators/similarity.py keeps that as the
documented alternative path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| * |b|); NULL if either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)
