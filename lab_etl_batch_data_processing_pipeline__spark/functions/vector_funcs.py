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


def dot_product_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Bit-identical twin of :func:`dot_product` for arrays of KNOWN
    uniform length ``dim``, built as a straight-line expression instead
    of a higher-order fold. HOF lambdas (``aggregate``/``zip_with``) are
    CodegenFallback — interpreted per element, measured ~25 µs per
    64-dim pair in the semantic_dedup gate's pair join — while 64
    unrolled ``element_at`` terms compile into whole-stage codegen.
    The sum is the same left-associated sequence of IEEE additions in
    index order, each term the same double product of individually
    cast elements, so results match :func:`dot_product` bit for bit
    (pinned by tests); null elements propagate identically (a null
    term poisons the running sum in both forms). ONLY valid when every
    row's arrays have exactly ``dim`` elements — the caller must probe
    (min size == max size == dim) first; a shorter array would raise
    under ANSI element_at where the fold form yields null."""
    acc: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + (
            F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
        )
    return acc
