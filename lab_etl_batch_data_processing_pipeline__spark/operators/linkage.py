"""Record linkage / fuzzy entity matching — blocked edit-distance join.

The entity-resolution primitive (Fellegi-Sunter blocking tradition, as
in Dedupe/Splink/record-linkage toolkits): candidate pairs come from an
equi-join on cheap blocking keys, then an edit-distance verify keeps
pairs within ``max_distance``. Catalyst turns the block join into an
ordinary shuffled hash join, and ``levenshtein`` is a JVM codegen'd
built-in — no UDF anywhere.

Scale design:
- The pair space is Σ_b |block|² — blocking-key design is the cost AND
  recall lever (same contract as dedup_fuzzy.jaccard_near_dups; use
  jaccard_block_stats-style pre-flight accounting on the block columns
  when in doubt).
- Two output-invariant prunes run before any edit distance: a length
  prune (| |a|-|b| | > d cannot match) and Spark's 3-arg
  ``levenshtein(a, b, threshold)`` which abandons the DP early once the
  distance exceeds d (returns -1, filtered out) — at a 100 TB entity
  table this is the difference between O(len²) per candidate and
  O(len·d).
- The degree form never materializes the pair list (quadratic in match
  density): one explode + hash aggregate, output is entity-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .layout import ensure_parallelism


def fuzzy_pairs(
    records: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence,
    max_distance: int = 2,
    sort: bool = True,
) -> DataFrame:
    """Self-linkage pairs: (id_a, id_b, distance) for records sharing
    every blocking key whose ``text_col`` edit distance <= max_distance
    (id_a < id_b, each undirected pair once). ``block_cols`` entries may
    be column names or Column expressions (e.g. a derived phonetic/token
    key); a NULL blocking value drops the record from the pair space
    (SQL NULL-join semantics — same contract as jaccard blocking)."""
    records = ensure_parallelism(records)
    blocks = [
        (F.col(c) if isinstance(c, str) else c).alias(f"__blk{i}")
        for i, c in enumerate(block_cols)
    ]
    prepared = records.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__txt"),
        F.length(F.col(text_col)).alias("__len"),
        *blocks,
    )
    a, b = prepared.alias("a"), prepared.alias("b")
    cond = (F.col("a.__id") < F.col("b.__id"))
    for i in range(len(block_cols)):
        cond &= F.col(f"a.__blk{i}") == F.col(f"b.__blk{i}")
    dist = F.levenshtein(F.col("a.__txt"), F.col("b.__txt"), max_distance)
    out = (
        a.join(b, on=cond)
        # length prune: cheaper than any DP and output-invariant
        .filter(
            F.abs(F.col("a.__len") - F.col("b.__len")) <= F.lit(max_distance)
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            dist.alias("distance"),
        )
        # 3-arg levenshtein returns -1 once the running distance exceeds
        # the threshold — keep only true matches
        .filter((F.col("distance") >= 0) & (F.col("distance") <= max_distance))
    )
    return out.orderBy("id_a", "id_b") if sort else out


def fuzzy_match_degree(
    records: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence,
    max_distance: int = 2,
) -> DataFrame:
    """Per-record fuzzy-match summary: (id, n_matches, min_distance) —
    the entity-sized report a resolution pipeline consumes (which
    records have how many look-alikes), without materializing the pair
    list (quadratic in match density: 220 k pairs from 20 k parts on the
    sf0.1 fixture). Records with no match are absent. Same explode +
    map-side-combine collapse as dedup_fuzzy.near_dup_degree."""
    pairs = fuzzy_pairs(
        records, id_col, text_col, block_cols, max_distance, sort=False
    )
    sides = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col), "distance"
    )
    return (
        sides.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("distance").alias("min_distance"),
        )
        .orderBy(id_col)
    )
