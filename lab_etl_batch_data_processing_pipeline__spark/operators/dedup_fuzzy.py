"""Near-duplicate detection operators (north-star extension): blocked
n-gram Jaccard, MinHash + LSH banding, SimHash.

Design for 100 TB: never form the O(n^2) pair space. Every operator here
generates candidate pairs through an equi-join on a blocking/bucket key
(Catalyst turns that into an ordinary shuffled hash join), then verifies
only the candidates.

- :func:`jaccard_near_dups`     deterministic blocking + exact Jaccard
  verify; fully SQL-expressible (oracle-checkable).
- :func:`minhash_signatures` / :func:`minhash_near_dups`   classic
  shingle -> minhash -> band -> bucket-join LSH.
- :func:`simhash` token-hash sign-sum sketch; hamming-close pairs are
  near-dups.

MinHash and SimHash each have two hashing modes:

- ``portable=True`` (default): the base hash is md5-derived (first 60
  bits of the digest), re-seeded with an inlined universal-hash family
  ``(a_i * h + b_i) mod (2^31 - 1)``. Every term is plain integer
  arithmetic on a standard md5, so any engine reproduces the sketches
  bit-for-bit — this is what makes the operators oracle-checkable
  (same pattern as the md5 winnowing fingerprints below).
- ``portable=False``: xxhash64 (JVM-side, no digest-string step) — the
  fast path when cross-engine reproducibility is not required.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text_funcs import normalized_text
from .layout import ensure_parallelism

#: Modulus of the portable universal-hash family: the Mersenne prime
#: 2^31 - 1. Base hashes and multipliers are < 2^31, so a_i * h < 2^62
#: never overflows a signed 64-bit long (ANSI-mode safe in Spark, and
#: identical in any engine with int64 arithmetic).
MINHASH_P = 2_147_483_647


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the portable hash family.

    Derived from md5 of fixed strings (no RNG state), so the Spark
    expression and any oracle SQL can inline the exact same literals.
    """
    pairs = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"minhash-a-{i}".encode()).hexdigest()[:15], 16)
        b = int(hashlib.md5(f"minhash-b-{i}".encode()).hexdigest()[:15], 16)
        pairs.append((a % (MINHASH_P - 1) + 1, b % MINHASH_P))
    return pairs


def _md5_hash31(col):
    """Portable 31-bit base hash: first 60 md5 bits mod (2^31 - 1)."""
    return (
        F.conv(F.substring(F.md5(col), F.lit(1), F.lit(15)), 16, 10).cast("long")
        % MINHASH_P
    )


def _token_set(text_col):
    """Distinct lowercase whitespace tokens (the comparison universe)."""
    return F.array_distinct(
        F.filter(F.split(F.lower(text_col), r"\s+"), lambda x: x != F.lit(""))
    )


def jaccard_block_tok(toks):
    """Jaccard blocking token: MIN over the token array of md5(token) —
    a 1-hash MinHash band. Uniformly distributed across documents (unlike
    any positional token choice) and engine-portable. NULL for an empty
    token array."""
    return F.array_min(F.transform(toks, lambda t: F.md5(t)))


def jaccard_near_dups(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    length_bucket: int = 10,
) -> DataFrame:
    """Near-dup pairs by exact token-set Jaccard, with deterministic blocking.

    Blocking key = (distinct-token-count bucket, min-md5-token): two docs
    can only pair if they share both. That keeps the join an equi-join (one
    shuffle on the block key) and bounds the verify set; Jaccard is then
    computed exactly with integer set arithmetic. Docs whose Jaccard >=
    threshold but which land in different blocks are missed — that recall
    trade-off is what MinHash-LSH (below) fixes probabilistically at scale.

    The block token is the MIN over the doc's tokens of md5(token) — a
    1-hash MinHash band. For a candidate pair the collision probability
    equals its Jaccard (fine above any useful threshold), while the key
    itself is uniformly distributed: no "every document starting with
    'the' shares a block" hot key, which is what a positional key degrades
    to at corpus scale (one straggler block with quadratic verify cost).
    md5 (not xxhash64) keeps the key engine-portable for the oracle.
    """
    documents = ensure_parallelism(documents)
    raw_toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    toks = F.array_distinct(raw_toks)
    prepared = documents.select(
        F.col(id_col).alias("doc_id"),
        # The verify stage intersects 64-bit token hashes, not strings:
        # long equality beats string hashing per comparison, and set SIZES
        # are collision-exact for any real vocabulary (p ~ n^2/2^64).
        F.array_distinct(
            F.transform(toks, lambda t: F.xxhash64(t))
        ).alias("tok_set"),
        F.floor(F.size(toks) / length_bucket).alias("len_bucket"),
        # An empty/whitespace-only doc yields NULL, which drops the doc
        # from the pair space via the equi-join (SQL NULL-join semantics).
        jaccard_block_tok(toks).alias("block_tok"),
    )
    a = prepared.alias("a")
    b = prepared.alias("b")
    sa, sb = F.size(F.col("a.tok_set")), F.size(F.col("b.tok_set"))
    pairs = a.join(
        b,
        on=(
            (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.block_tok") == F.col("b.block_tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
        ),
        # Size-ratio prune (output-invariant): J(A,B) <= min/max of the set
        # sizes, so pairs failing min >= t*max can never reach the
        # threshold. Two int comparisons kill a candidate before the
        # intersection is computed. The 1e-6 slack keeps pairs whose true
        # Jaccard sits just under t but ROUNDS to t (the filter downstream
        # compares the 6dp-rounded value).
    ).filter(
        F.least(sa, sb) >= F.lit(threshold - 1e-6) * F.greatest(sa, sb)
    )
    # array_intersect is hash-based (O(|a|+|b|)); inputs are already
    # distinct so its size is exactly |A∩B|.
    inter = F.size(F.array_intersect(F.col("a.tok_set"), F.col("b.tok_set")))
    union = sa + sb - inter
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_id_a", "doc_id_b")
    )


def _shingles(text_col, n: int = 3):
    """Word n-gram shingle set over normalized text (distinct)."""
    toks = F.filter(F.split(normalized_text(text_col), " "), lambda x: x != F.lit(""))
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def minhash_signatures(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_size: int = 3,
    portable: bool = True,
) -> DataFrame:
    """Per-document MinHash signature: array of ``num_hashes`` minima.

    Each shingle is hashed once (md5-derived 31-bit when ``portable``,
    xxhash64 otherwise); the signature element i is the min over the
    doc's shingle set of the i-th re-seeded hash. Computed as two
    chained projections with higher-order functions — no shuffle, no
    UDF, no exploding the shingle set into rows (an explode would
    multiply the scan by ~|shingles|).

    The whole signature comes from ONE fold over the shingle array
    (``aggregate`` with an array-of-minima accumulator): each shingle is
    string-hashed once, then cheaply re-seeded per slot with pure
    integer arithmetic. Two rejected formulations, both measured: the
    per-seed ``array_min(transform(...))`` form re-evaluates the shingle
    construction per seed after projection collapsing (~30x slower at 5k
    docs); an explode + groupBy with num_hashes ``min`` columns triggers
    a wide-aggregate codegen blowup (~25s of fixed compile cost per
    query regardless of data size).
    """
    documents = ensure_parallelism(documents)
    sh = _shingles(F.col(text_col), shingle_size)
    if portable:
        params = F.array(
            *[
                F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
                for a, b in minhash_params(num_hashes)
            ]
        )
        sig = F.aggregate(
            F.transform(sh, _md5_hash31),
            F.expr(f"array_repeat({MINHASH_P}L, {num_hashes})"),
            lambda acc, h: F.zip_with(
                acc, params, lambda m, p: F.least(m, (p["a"] * h + p["b"]) % MINHASH_P)
            ),
        )
    else:
        max_long = (1 << 63) - 1
        seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
        sig = F.aggregate(
            F.transform(sh, lambda s: F.xxhash64(s)),
            F.expr(f"array_repeat({max_long}L, {num_hashes})"),
            lambda acc, h: F.zip_with(
                acc, seeds, lambda m, i: F.least(m, F.xxhash64(h, i))
            ),
        )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        sig.alias("signature"),
        F.size(sh).alias("n_shingles"),
    )


def minhash_near_dups(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    threshold: float = 0.5,
    portable: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band signatures, bucket-join, verify.

    rows-per-band r = num_hashes/bands; candidate probability for true
    Jaccard s is 1-(1-s^r)^bands (the classic S-curve). The banding explode
    produces ``bands`` rows per doc (bounded fan-out), the bucket join is an
    equi-join on (band_id, band_hash), and verification re-estimates
    similarity from the full signatures (estimated Jaccard = fraction of
    matching signature slots).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    sigs = minhash_signatures(
        documents, id_col, text_col, num_hashes, shingle_size, portable
    )

    band_hash_fn = F.md5 if portable else F.xxhash64
    banded = sigs.select(
        "doc_id",
        "signature",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda band: F.struct(
                    band.alias("band_id"),
                    band_hash_fn(
                        F.concat_ws(
                            "|",
                            F.transform(
                                F.slice(F.col("signature"), band * r + 1, r),
                                lambda x: x.cast("string"),
                            ),
                        ),
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "signature", "band.band_id", "band.band_hash")

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            on=(
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
            lambda m: m == 1,
        )
    ) / F.lit(float(num_hashes))
    return (
        candidates.select(
            "doc_id_a", "doc_id_b", F.round(est, 6).alias("est_jaccard")
        )
        .filter(F.col("est_jaccard") >= threshold)
        .orderBy("doc_id_a", "doc_id_b")
    )


def simhash(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = True,
) -> DataFrame:
    """SimHash over the token set: bit b of the sketch is the sign of
    the sum over tokens of (+1 if token-hash bit b else -1).

    ``portable=True``: 60-bit sketch from the first 60 md5 bits of each
    token — engine-independent, oracle-checkable. Shape: explode tokens
    to rows, explode 60 bit positions, hash-aggregate the per-(doc, bit)
    sign sums, then fold the signs back into one long. Two shuffles on
    tiny rows (docs × 60 groups after map-side combine), and the
    expression stays small — a HOF fold carrying a 60-counter array
    accumulator was measured bit-identical but pays ~7 s of one-time
    whole-stage-codegen compilation for the giant generated class
    (near janino's method-size cliff), which dominates any single run.
    ``shiftright``/``shiftleft`` take column shift distances only in
    their SQL form, hence the F.expr fragments.

    ``portable=False``: 63-bit sketch from xxhash64 via one HOF fold
    (63 not 64 so the fold ``acc*2 + bit`` never overflows a signed
    long under ANSI mode) — compact enough to codegen cheaply. Near-dups
    have hamming-close sketches; pairing is a bucket join on sketch
    prefixes (not materialized here).
    """
    toks = _token_set(F.col(text_col))
    if portable:
        tok_hashes = F.transform(
            toks,
            lambda t: F.conv(F.substring(F.md5(t), F.lit(1), F.lit(15)), 16, 10).cast(
                "long"
            ),
        )
        base = ensure_parallelism(
            documents.select(F.col(id_col).alias("doc_id"), tok_hashes.alias("hs"))
        )
        sums = (
            base.select("doc_id", F.explode("hs").alias("h"))
            .select(
                "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(59))).alias("b")
            )
            .groupBy("doc_id", "b")
            .agg(
                F.sum(
                    F.when(F.expr("(h >> (59 - b)) & 1") == 1, 1).otherwise(-1)
                ).alias("s")
            )
        )
        sketches = sums.groupBy("doc_id").agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(1L, 59 - b)")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("simhash")
        )
        # Empty/whitespace-only docs have no token rows: restore them with
        # the all-negative-sums sketch (0), matching the fold semantics.
        return (
            documents.select(F.col(id_col).alias("doc_id"))
            .join(sketches, "doc_id", "left")
            .na.fill(0, ["simhash"])
        )
    bit_idx = F.sequence(F.lit(0), F.lit(62))
    bit_sums = F.reverse(
        F.aggregate(
            F.transform(toks, lambda t: F.xxhash64(t)),
            F.expr("array_repeat(0, 63)"),
            lambda acc, h: F.zip_with(
                acc,
                bit_idx,
                lambda s, b: s + F.when(F.bit_get(h, b) == 1, 1).otherwise(-1),
            ),
        )
    )
    sketch = F.aggregate(
        bit_sums,
        F.lit(0).cast("long"),
        lambda acc, s: acc * 2 + F.when(s > 0, 1).otherwise(0),
    )
    return documents.select(F.col(id_col).alias("doc_id"), sketch.alias("simhash"))


def winnowing_fingerprints(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): hash every
    k-char gram of the normalized text, keep the minimum hash per sliding
    window of ``window`` grams, emit the distinct selected hashes.

    Guarantees every match of length >= k+window-1 shares a fingerprint,
    while storing only ~2/(window+1) of the gram hashes. Output is one row
    per (doc_id, fingerprint) — join on fingerprint to find copy spans.
    Hashes are md5 prefixes (strings) so the operator is engine-portable
    and oracle-checkable, unlike xxhash-based sketches.

    Shape: posexplode grams to rows, then the per-window minimum is a
    window-function ``min`` over ``ROWS BETWEEN CURRENT ROW AND window-1
    FOLLOWING``. The all-array form (array_min over slice inside a
    transform lambda) re-evaluates the whole gram array per window after
    Catalyst alias inlining — O(n^2) hashes per document — and the row
    form also distributes: per-doc work is bounded, the shuffle key is
    doc_id, and long documents never build giant in-memory arrays.
    """
    norm = normalized_text(F.col(text_col))
    n_grams = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    grams = (
        ensure_parallelism(documents).select(
            F.col(id_col).alias("doc_id"),
            norm.alias("_norm"),
            n_grams.alias("n_grams"),
        )
        .select(
            "doc_id",
            "_norm",
            "n_grams",
            F.explode(F.sequence(F.lit(1), F.col("n_grams"))).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            "n_grams",
            F.md5(F.col("_norm").substr(F.col("pos"), F.lit(k))).alias("gram"),
        )
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return (
        grams.select(
            "doc_id",
            "pos",
            "n_grams",
            F.min("gram").over(win).alias("fingerprint"),
        )
        .filter(F.col("pos") <= F.greatest(F.col("n_grams") - (window - 1), F.lit(1)))
        .select("doc_id", "fingerprint")
        .distinct()
    )
