"""LLM training-corpus preparation pipeline (north-star flagship).

The standard pre-training data funnel, composed from this engine's
operators, all Catalyst-optimizable:

  documents
    → quality gate        (doc_stats score >= min_quality; cheap per-row
                           projection, applied FIRST so every later stage
                           touches fewer rows)
    → exact dedup         (md5 fingerprint, deterministic min-doc_id
                           survivor; shuffles 16-byte digests, not bodies)
    → near-dup removal    (blocked token-set Jaccard pairs; the LOWER
                           doc_id of each pair survives)

Every stage is SQL-expressible, so the whole funnel is oracle-checked
end-to-end (query key ``corpus_prep``). At 100 TB the same composition
holds — the stages are each one shuffle, and the funnel order minimizes
the bytes entering each shuffle.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import cleaning, dedup_fuzzy, text


def _unpersist_with(result: DataFrame, cached: DataFrame) -> DataFrame:
    """Release ``cached`` when ``result`` is garbage-collected.

    A plan-internal ``persist()`` has no natural unpersist point — the
    caller consumes the returned frame lazily, possibly many times. Tying
    the release to the result's lifetime gives exactly the right scope:
    the cache lives while the result is reachable, and a long-lived
    session does not accumulate dead cache entries (CacheManager entries
    are never GC'd on their own).
    """

    def release(cached=cached):
        try:
            cached.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release

    weakref.finalize(result, release)
    return result


def corpus_prep(
    documents: DataFrame,
    min_quality: float = 0.7,
    jaccard_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("lang", "source"),
    max_dup_2gram_frac: float | None = None,
) -> DataFrame:
    """Return the cleaned corpus: columns (doc_id, text, *keep_cols,
    quality_score), quality-gated, exact- and near-deduplicated.

    ``max_dup_2gram_frac`` optionally adds the Gopher-style repetition
    gate (text.repetition_stats) to the cheap per-row filter stage:
    boilerplate/spam docs leave the funnel before any shuffle happens.
    """
    stats = text.doc_stats(documents, id_col, text_col).select(
        "doc_id", "quality_score"
    )
    kept = (
        documents.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"), *keep_cols
        )
        .join(stats, "doc_id")
        .filter(F.col("quality_score") >= min_quality)
    )
    if max_dup_2gram_frac is not None:
        rep = text.repetition_stats(documents, id_col, text_col).select(
            "doc_id", "dup_2gram_frac"
        )
        kept = (
            kept.join(rep, "doc_id")
            .filter(F.col("dup_2gram_frac") <= max_dup_2gram_frac)
            .drop("dup_2gram_frac")
        )

    fingerprinted = kept.join(
        text.fingerprint(kept, "doc_id", "text"), "doc_id"
    )
    # The exact-deduped set feeds three consumers (both sides of the
    # near-dup self-join and the final anti-join); persisting it avoids
    # re-running the quality gate + dedup chain per consumer. Storage is
    # the post-gate corpus projection — the smallest frame in the funnel.
    exact_unique = (
        cleaning.dedup_by_keys(fingerprinted, ["fingerprint"], order_by=["doc_id"])
        .drop("fingerprint")
        .persist()
    )

    # sort=False: the pairs feed a distinct + anti-join, and a sorted
    # pair list would range-sample (= re-execute) the pair pipeline.
    near_pairs = dedup_fuzzy.jaccard_near_dups(
        exact_unique, "doc_id", "text", threshold=jaccard_threshold, sort=False
    )
    # Persisted for the same reason as exact_unique: the terminal orderBy
    # range-samples its child, which would otherwise execute the whole
    # near-dup pair pipeline a second time just to pick sort boundaries.
    # The cache holds doc ids only — the smallest frame in the funnel.
    to_drop = near_pairs.select(F.col("doc_id_b").alias("doc_id")).distinct().persist()
    result = exact_unique.join(to_drop, "doc_id", "left_anti").orderBy("doc_id")
    return _unpersist_with(_unpersist_with(result, exact_unique), to_drop)
