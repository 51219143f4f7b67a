"""Text-analysis operators over a documents table (north-star extension:
language ID, quality scoring, token counting, fingerprinting).

The reference has no text surface; these are the LLM-training-data
operators a 100-TB pipeline needs. Everything is built-in expressions in a
single projection per operator — no UDFs, no shuffles except where an
aggregation is the point (fingerprint clustering).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .layout import ensure_parallelism
from ..functions.text_funcs import (
    DEFAULT_STOPWORDS,
    normalized_text,
    punct_count,
    stopword_count,
    token_count,
)

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately deterministic and SQL-expressible (oracle-parity).
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
}


def doc_stats(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Per-document structural stats: chars, tokens, stopword/punct profile,
    and a [0,1] quality score.

    Quality score: penalizes ultra-short docs, punctuation soup, and
    stopword-free word salad — the standard cheap pre-filters in front of
    an LLM training corpus. Integer arithmetic + one division each, so the
    values are deterministic across engines.
    """
    text = F.col(text_col)
    n_tokens = token_count(text)
    n_stop = stopword_count(text, stopwords)
    n_punct = punct_count(text)
    n_chars = F.length(text)
    return documents.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 4).alias("avg_token_len"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(
            F.least(
                F.lit(1.0),
                (F.least(n_tokens, F.lit(50)) / F.lit(50.0)) * 0.5
                + (F.lit(1.0) - F.least(n_punct / F.greatest(n_chars, F.lit(1)), F.lit(1.0))) * 0.3
                + F.least(n_stop / F.greatest(n_tokens, F.lit(1)) * F.lit(5.0), F.lit(1.0)) * 0.2,
            ),
            4,
        ).alias("quality_score"),
    )


def language_id(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Marker-word language heuristic: score each language by marker hits in
    the token stream, pick the best scorer ('und' when nothing matches).

    A real deployment swaps in a fastText/CLD3 model via a Pandas UDF; the
    heuristic keeps the operator dependency-free and oracle-checkable while
    exercising the identical Spark plumbing (projection over token arrays).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))
    scores = {
        lang: F.size(
            F.filter(toks, lambda x: F.array_contains(F.array(*[F.lit(m) for m in markers]), x))
        )
        for lang, markers in LANG_MARKERS.items()
    }
    # Highest score wins; deterministic tie-break by language code order.
    best = F.lit(0)
    for score in scores.values():
        best = F.greatest(best, score)
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return documents.select(
        F.col(id_col).alias("doc_id"),
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)],
        pred.alias("lang_pred"),
    )


def fingerprint(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Canonical-text MD5 fingerprint per document (exact-dup key).

    MD5 over the normalized text is engine-portable (same digest in Spark,
    DuckDB, Postgres), unlike xxhash64/murmur which differ per engine.
    """
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalized_text(F.col(text_col))).alias("fingerprint"),
    )


def exact_dup_clusters(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Group documents by content fingerprint: one row per distinct content,
    with its cluster size and canonical (minimum) doc id.

    This is exact dedup as a *report*; `cleaning.dedup_by_keys` on the
    fingerprint column is the destructive form. One hash-shuffle on the
    16-byte digest — the cheapest possible exact-dedup key at 100 TB
    (shuffles 16 bytes + id instead of full documents).
    """
    return (
        fingerprint(documents, id_col, text_col)
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .orderBy("canonical_doc_id")
    )


def token_frequencies(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary: token -> document-occurrence count.

    explode + hash aggregate; the shuffle key is the token (high
    cardinality, well distributed). ``min_count`` prunes the long tail
    after partial aggregation, so the filter costs nothing extra.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    return (
        ensure_parallelism(documents).select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.col("n_occurrences").desc(), "token")
    )


def word_ngrams(
    documents: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Word n-gram frequencies across the corpus (space-joined grams).

    The gram array is built per-row with one sequence+transform pass (no
    row explosion until the final ungrouped explode), then hash-aggregated.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    # Guard: Spark sequence(1, 0) would generate a *descending* [1, 0];
    # docs shorter than n tokens must yield an empty gram list instead.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return (
        ensure_parallelism(documents).select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.col("n_occurrences").desc(), "ngram")
    )


def pmi_collocations(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-k adjacent-word collocations by association lift — the PMI
    ranking (PMI = log2 lift; log is monotonic, so ranking by lift IS
    ranking by PMI, and skipping the log keeps the score engine-exact):
    (w1, w2, pair_count, lift_ppm, rank).

    lift(x, y) = P(x, y) / (P(x) P(y)) = c_xy * N / (c_x * c_y), the
    classic collocation-extraction statistic ("new york" scores high
    because its parts rarely appear apart). ``min_count`` drops the
    rare-pair noise that dominates raw PMI (a pair seen once between two
    hapaxes has maximal lift but zero evidence).

    ``lift_ppm`` = floor(1e6 * lift) with the ratio computed in IEEE
    doubles under a FIXED parenthesization — (c_xy * N) / (c_x * c_y),
    each operand an exactly-representable integer — so any engine
    produces bit-identical doubles and floor (unlike round) has no
    half-way semantics to disagree on. The repo's usual fixed-point
    integer SUM trick doesn't apply here: c_xy*N*1e6 overflows BIGINT
    at corpus scale, while the double path never accumulates error
    across rows (one mul, one div per output row).

    Scale shape: one explode+agg for unigram counts (vocab-sized), one
    for adjacent pairs (bigram-vocab-sized, min_count pruned AFTER
    partial aggregation so the filter is free), two equi-joins of the
    pruned pair table against the unigram table (vocab-scaled shuffle,
    no broadcast hint — vocabulary is unbounded), N as a broadcast
    one-row aggregate, and a TakeOrdered top-k instead of a global
    sort. No step is corpus-quadratic.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    base = ensure_parallelism(documents).select(toks.alias("t"))
    uni = (
        base.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = uni.agg(F.sum("c").cast("long").alias("n"))
    idx = F.when(
        F.size(F.col("t")) >= 2, F.sequence(F.lit(1), F.size(F.col("t")) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = (
        base.select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i).alias("w1"),
                        F.element_at(F.col("t"), i + 1).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    a = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    b = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    lift = (
        pairs.join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("c_xy").alias("pair_count"),
            F.floor(
                F.lit(1000000.0)
                * (
                    (F.col("c_xy").cast("double") * F.col("n").cast("double"))
                    / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
                )
            )
            .cast("long")
            .alias("lift_ppm"),
        )
    )
    from pyspark.sql import Window

    # TakeOrdered top-k FIRST (per-partition heads merged on the driver,
    # no global shuffle), then rank the bounded k-row frame — the
    # single-partition global window only ever sees top_k rows.
    top = lift.orderBy(F.col("lift_ppm").desc(), "w1", "w2").limit(top_k)
    w = Window.orderBy(F.col("lift_ppm").desc(), "w1", "w2")
    return top.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).orderBy("rank")


def tfidf(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(doc, token) TF-IDF weights: (doc_id, token, tf, df, tfidf).

    Two shuffles: one hash aggregate keyed by (doc, token) for term
    frequencies, one by token for document frequencies; the df table is
    vocabulary-sized and joins back broadcast-style under AQE. IDF here is
    the *rational* form (N+1)/(df+1) — ln-free, so the weight is exact
    integer arithmetic + one correctly-rounded double division and
    reproducible across engines (classic ``ln`` idf is a one-line swap;
    libm implementations differ in the last ulp, which flips rankings).

    The corpus size N enters the plan as a broadcast single-row
    aggregate (cross join), not a driver-side ``docs.count()`` — a
    scalar pre-count is a full extra pass over the corpus, which at
    100 TB doubles the scan cost just to fetch one constant.
    """
    docs = ensure_parallelism(documents)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    term_rows = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("token")
    )
    tf = term_rows.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (
                F.col("tf")
                * ((F.col("n_docs") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)))
            ).alias("tfidf"),
        )
    )


def tfidf_cosine_topk(
    documents: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Sparse TF-IDF cosine top-k — document similarity WITHOUT dense
    embeddings: (doc_id, neighbor_id, cosine_sim, sim_rank), the classic
    sparse similarity join (inverted-index form). Candidate pairs come
    from an equi-join on TOKEN (docs sharing no token never meet), so
    the pair space is Σ_t df(t)² over the retained vocabulary, not
    |docs|² — the frequency-pruning lever ``max_df_frac`` drops
    stop-like tokens (df > frac·N) that blow that sum up quadratically
    while contributing near-zero weight. df=1 tokens are dropped too.
    Pruning DEFINES the similarity metric: dropped tokens are excluded
    from the norms as well as the pair space, so cosine values are
    pruned-vocabulary cosine (the oracle computes the same metric), not
    the full-vocabulary values — df=1 tokens cannot create a pair, but
    keeping them would shrink every cosine of the docs containing them.

    Weights are tf/(df+1) — the rational-idf :func:`tfidf` weight with
    the constant (N+1) factor dropped, which cancels in cosine.
    EVERY aggregated quantity is an integer: per-token contributions
    round to 2⁻²⁰-grain fixed-point (``round(w·w′·2²⁰)``, exact dyadic
    scaling) and SUM as longs, so dot products and norms are
    order-invariant and engine-portable — a float SUM over shuffled
    partials would differ from the oracle in the last ulp and flip
    rounded boundaries. Overflow bound: terms ≤ (max tf)²·2²⁰, safe for
    any real tf under ~10⁵.

    Shuffles: (doc, token) tf aggregate, token df aggregate
    (vocabulary-sized, AQE-broadcast back), the token equi-join, one
    (doc_a, doc_b) dot aggregate, and the per-doc ranking window.
    At 100 TB the df table is the only state that must stay bounded —
    exactly the vocabulary, which max_df_frac already curates.
    """
    docs = ensure_parallelism(documents)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    term_rows = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("token")
    )
    tf = term_rows.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scale = F.lit(float(1 << 20))
    w = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .filter(
            (F.col("df") > 1)
            & (F.col("df") <= F.lit(max_df_frac) * F.col("n_docs"))
        )
        .select(
            "doc_id",
            "token",
            (F.col("tf").cast("double") / (F.col("df") + F.lit(1))).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sum(F.round(F.col("w") * F.col("w") * scale).cast("long")).alias("__n2")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            on=(
                (F.col("a.token") == F.col("b.token"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
            ),
        )
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(
            F.sum(
                F.round(F.col("a.w") * F.col("b.w") * scale).cast("long")
            ).alias("__dot")
        )
    )
    sym = dots.select(
        F.col("da").alias("doc_id"), F.col("db").alias("neighbor_id"), "__dot"
    ).unionByName(
        dots.select(
            F.col("db").alias("doc_id"), F.col("da").alias("neighbor_id"), "__dot"
        )
    )
    na = norms.select(F.col("doc_id"), F.col("__n2").alias("__na"))
    nb = norms.select(
        F.col("doc_id").alias("neighbor_id"), F.col("__n2").alias("__nb")
    )
    scored = (
        sym.join(na, "doc_id")
        .join(nb, "neighbor_id")
        .select(
            "doc_id",
            "neighbor_id",
            F.round(
                F.col("__dot").cast("double")
                / F.sqrt(
                    F.col("__na").cast("double") * F.col("__nb").cast("double")
                ),
                6,
            ).alias("cosine_sim"),
        )
    )
    from pyspark.sql import Window

    rank_w = Window.partitionBy("doc_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("sim_rank", F.row_number().over(rank_w))
        .filter(F.col("sim_rank") <= k)
        .orderBy("doc_id", "sim_rank")
    )


def split_assign(
    documents: DataFrame,
    id_col: str = "doc_id",
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test assignment from the row id alone.

    The id (+ optional salt) is md5-hashed and the first 4 hex chars are
    compared against cumulative-weight boundaries *as strings* — a pure
    projection (no shuffle, no RNG, no state), so the split is stable
    across runs, engines, partitionings and cluster sizes, and any row's
    assignment can be re-derived later. Boundary granularity is 1/65536.
    """
    total = sum(w for _, w in weights)
    bounds: list[tuple[str, str]] = []
    cum = 0.0
    for name, w in weights:
        cum += w / total
        bounds.append((name, format(min(int(cum * 65536), 65535), "04x")))
    h = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 4
    )
    # build lowest-bound-innermost: h < bound_i picks range i, else falls
    # through to the next range; the last range is the unconditional tail
    assign = F.lit(bounds[-1][0])
    for name, bound in reversed(bounds[:-1]):
        assign = F.when(h < F.lit(bound), F.lit(name)).otherwise(assign)
    return documents.withColumn("split", assign)


def _word_gram_array(text_col, n: int):
    """Space-joined word n-gram array (same short-doc guard as word_ngrams).

    The token array is LET-BOUND via ``transform(array(toks), t -> ...)``
    before the per-index lambda: Catalyst's projection collapse inlines
    aliases and CSE does not cross lambda scopes, so referencing ``toks``
    directly inside ``transform(idx, i -> slice(toks, i, n))`` re-runs
    the whole tokenizer per gram index — O(tokens²) per document
    (measured: 40 s for a map-only stats projection at sf0.1, vs ~1 s
    with the binding; same alias-inlining cliff as the round-1 winnowing
    receipt in SCALE.md)."""
    toks = F.filter(F.split(F.lower(text_col), r"\s+"), lambda x: x != F.lit(""))

    def grams_of(t):
        idx = F.when(
            F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))

    return F.element_at(F.transform(F.array(toks), grams_of), 1)


def repetition_stats(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition quality signals, one projection per doc:
    duplicate-line fraction and duplicate word-2/3-gram fractions
    (``1 - distinct/total``). High values mean boilerplate/spam — the
    standard cheap gate before an LLM training corpus.

    Pure per-row HOF arithmetic: no shuffle, no UDF, linear in text
    length, so the operator is a map-only stage at any corpus size.
    Fractions are 6dp-rounded integer-ratio divisions — engine-exact.

    The (lines, g2, g3) arrays pass through a one-element ``explode`` —
    a Generate node Catalyst will not collapse projections through — so
    each array is built exactly once per row no matter how many stat
    expressions read it (alias-inlining otherwise re-runs the gram
    builders per reference; see _word_gram_array).
    """
    text = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    bundled = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array(
                F.struct(
                    lines.alias("lines"),
                    _word_gram_array(text, 2).alias("g2"),
                    _word_gram_array(text, 3).alias("g3"),
                )
            )
        ).alias("s"),
    )

    def dup_frac(arr):
        n = F.size(arr)
        return F.when(n > 0, F.round(1 - F.size(F.array_distinct(arr)) / n, 6)).otherwise(
            F.lit(0.0)
        )

    s = F.col("s")
    return bundled.select(
        "doc_id",
        F.size(s["lines"]).alias("n_lines"),
        dup_frac(s["lines"]).alias("dup_line_frac"),
        F.size(s["g2"]).alias("n_2grams"),
        dup_frac(s["g2"]).alias("dup_2gram_frac"),
        dup_frac(s["g3"]).alias("dup_3gram_frac"),
    )


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination by n-gram overlap: per document, how many
    of its word n-grams appear in ANY benchmark document (the standard
    13-gram eval-contamination check).

    Shape for 100 TB: both sides shingle to *distinct md5 gram digests*
    (16-byte keys, never gram text) and meet in an equi-join on the
    digest. The benchmark side is eval-suite-sized — broadcast by default,
    so the corpus never shuffles; set ``broadcast_benchmark=False`` to
    fall back to a shuffled join for giant benchmark sets. Docs with zero
    overlap survive via the left join with count 0.
    """
    doc_grams = ensure_parallelism(documents).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_word_gram_array(F.col(text_col), n))).alias(
            "gram"
        ),
    ).select("doc_id", F.md5("gram").alias("gram_md5"))
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(_word_gram_array(F.col(text_col), n))).alias(
                "gram"
            )
        )
        .select(F.md5("gram").alias("gram_md5"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    hits = (
        doc_grams.join(bench_grams, "gram_md5", "inner")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    totals = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.array_distinct(_word_gram_array(F.col(text_col), n))).alias(
            "n_grams"
        ),
    )
    return (
        totals.join(hits, "doc_id", "left")
        .na.fill(0, ["n_contaminated"])
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            F.when(
                F.col("n_grams") > 0,
                F.round(F.col("n_contaminated") / F.col("n_grams"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination_frac"),
            (F.col("n_contaminated") > 0).alias("is_contaminated"),
        )
    )


#: PII patterns deliberately RE2-safe (no backrefs/lookaround) so the same
#: regex text runs on Spark (java.util.regex) and DuckDB (RE2) identically.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
)


def pii_scrub(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Redact emails / SSNs / phone numbers and count what was removed:
    (doc_id, text, n_email, n_ssn, n_phone). Pure regexp projection —
    map-only at any scale; swap in an NER model via mapInPandas when
    regex precision isn't enough (the operator contract is identical).

    Order matters: email runs before phone so `user@host` digits can't
    be half-eaten by the phone pattern; patterns are applied to the
    progressively-scrubbed text.
    """
    counts = []
    scrubbed = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(scrubbed, F.lit(pat)).alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return documents.select(
        F.col(id_col).alias("doc_id"),
        scrubbed.alias("text"),
        *counts,
    )


def temperature_weights(
    raw_sizes: dict[str, float], temperature: float
) -> dict[str, float]:
    """Temperature-scale mixture weights from raw source sizes: the
    standard multilingual/data-mixing knob (w_s ∝ size_s^(1/T), the
    UNIMAX / mT5 sampling-temperature formulation, public method).

    T=1 reproduces natural proportions; T→∞ approaches uniform; T<1
    sharpens toward the biggest sources. Computed driver-side from the
    dimension-sized per-source totals (one number per source), then fed
    to :func:`mixture_sample` as explicit weights — the scaling itself
    never touches data-scale frames.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    scaled = {
        s: float(v) ** (1.0 / temperature)
        for s, v in raw_sizes.items()
        if v > 0
    }
    total = sum(scaled.values())
    if total <= 0:
        raise ValueError("temperature_weights: no source with positive size")
    return {s: v / total for s, v in scaled.items()}


def source_token_totals(
    documents: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> dict[str, int]:
    """Per-source token totals as a plain dict (dimension-sized collect:
    one row per source) — the input to :func:`temperature_weights`."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    rows = (
        documents.select(F.col(source_col).alias("source"), F.size(toks).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("source_tokens"))
        .collect()
    )
    return {r.source: int(r.source_tokens) for r in rows}


def mixture_sample(
    documents: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    salt: str = "",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Token-budget mixture sampling: divide a global token budget
    across sources via deterministic hash-Bernoulli downsampling.

    The classic pre-training "data mixing" step. ``weights`` sets each
    source's target share of the budget (``budget * w_s / sum(w)``) —
    the production form, where web/code/reference corpora get tuned
    proportions; a source missing from the dict gets weight 0 and is
    excluded entirely. With ``weights=None`` each source gets an equal
    share ``budget_tokens / n_sources``; a source whose corpus
    exceeds its share is downsampled at rate ``share / source_tokens``
    (capped at 1.0 — under-represented sources pass through whole; this
    samples, it does not upsample). The keep decision reuses
    :func:`split_assign`'s machinery — the 16-bit md5 prefix of the doc
    id as a uniform variate against an integer threshold
    ``floor(rate * 65536)`` — so the sample is a pure projection
    decision: stable across runs, engines, partitionings and cluster
    sizes, and any document's in/out status can be re-derived later.

    Scale: one hash aggregate over (source) for token totals (tiny,
    one row per source), a single-partition window over that dimension
    frame to count sources (n_sources rows, not data rows), and a
    broadcast join of the per-source thresholds back onto the corpus —
    the corpus itself never shuffles. Expected kept tokens per
    downsampled source = share * (1 ± O(1/sqrt(n_docs))); the budget is
    a statistical target, not an exact cut (an exact cut would need a
    global sort by hash — one extra range shuffle — for no training
    benefit).

    Returns the sampled documents with ``n_tokens`` and the per-source
    ``keep_thresh`` attached (thresh//65536 is the realized rate).
    """
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    docs = documents.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.size(toks).alias("n_tokens"),
    )
    per_source = docs.groupBy("source").agg(
        F.sum("n_tokens").alias("source_tokens")
    )
    # Single-partition window over the SOURCE DIMENSION (n_sources rows),
    # not the corpus — the cheap way to divide the budget without a
    # driver-side collect. With explicit weights the share is a pure
    # literal expression (total weight is a Python-side constant).
    if weights is not None:
        total_w = float(sum(weights.values()))
        if total_w <= 0:
            # share would be budget * (w / 0.0) -> NaN, and F.least(1.0,
            # NaN) is 1.0 (Spark orders NaN above all doubles) — every
            # source would be kept whole, the opposite of "weight 0 is
            # excluded". Refuse loudly instead.
            raise ValueError(
                "mixture_sample: weights must sum to > 0 "
                f"(got {total_w} from {len(weights)} entries)"
            )
        wmap = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv]
        )
        share = F.lit(float(budget_tokens)) * (
            F.coalesce(wmap[F.col("source")], F.lit(0.0)) / F.lit(total_w)
        )
    else:
        n_sources = F.count(F.lit(1)).over(Window.partitionBy())
        share = F.lit(float(budget_tokens)) / n_sources
    rate = F.least(F.lit(1.0), share / F.col("source_tokens"))
    thresholds = per_source.select(
        "source",
        "source_tokens",
        F.floor(rate * 65536).cast("long").alias("keep_thresh"),
    )
    u16 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.join(F.broadcast(thresholds), "source")
        .where(u16 < F.col("keep_thresh"))
        .select("doc_id", "source", "n_tokens", "keep_thresh")
    )


def pack_offsets(
    documents: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
) -> DataFrame:
    """Sequence-packing offsets: place a (deterministically shuffled)
    corpus end-to-end on a global token axis and assign each document its
    start offset and training-sequence bin ``floor(offset / seq_len)`` —
    the final packing step before emitting fixed-length training
    sequences (documents crossing a boundary split at emit time).

    The global running token sum is a TWO-PHASE PREFIX SUM, never a
    single-task global window (``Window.orderBy`` with no partition key
    funnels 100 TB through one task):

    1. within-bucket cumulative sums — one window per md5-derived bucket
       (``buckets``-way parallel, deterministic assignment);
    2. per-bucket totals (``buckets`` rows) get their own running offsets
       in a trivially-small single-partition window, then broadcast back.

    Offsets follow the global order (bucket, md5(id), id); using the md5
    as the sort key doubles as the corpus shuffle every training run
    wants. Every step is engine-portable: the oracle reproduces the whole
    thing with one ``SUM() OVER (ORDER BY ...)``.
    """
    from pyspark.sql import Window

    if not 1 <= buckets <= 256:
        # the bucket derives from ONE md5 byte, so >256 silently caps
        # effective parallelism at 256 — make the parameter honest
        raise ValueError(
            f"buckets must be in [1, 256] (one md5 byte drives the "
            f"assignment), got {buckets}"
        )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    h = F.md5(F.col(id_col).cast("string"))
    # Bucket = leading md5 byte floor-divided into `buckets` ranges: a
    # MONOTONE function of sort_key, so bucket-major order == global
    # order and phase-2 offsets can simply accumulate bucket totals.
    docs = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        h.alias("sort_key"),
        F.floor(
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int") / (256 / buckets)
        ).cast("int").alias("bucket"),
    )
    in_bucket = Window.partitionBy("bucket").orderBy("sort_key", "doc_id")
    docs = docs.withColumn(
        "cum_in_bucket", F.sum("n_tokens").over(in_bucket)
    )
    totals = docs.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    # single-partition window over `buckets` ROWS (the dimension), not docs
    running = Window.partitionBy().orderBy("bucket")
    offsets = totals.withColumn(
        "bucket_offset",
        F.coalesce(
            F.sum("bucket_tokens").over(
                running.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("bucket", "bucket_offset")
    return (
        docs.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("bucket_offset") + F.col("cum_in_bucket") - F.col("n_tokens"))
            .alias("start_offset"),
        )
        .withColumn(
            "seq_bin", F.floor(F.col("start_offset") / seq_len).cast("long")
        )
    )


def chunk_documents(
    documents: DataFrame,
    max_tokens: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    sort: bool = True,
) -> DataFrame:
    """Context-window chunking: split each document into fixed-token
    windows with ``overlap`` tokens of stride overlap — the step between
    a cleaned corpus and an embedding/pretraining batch (RAG indexes and
    context-bounded training both consume chunks, not documents).

    Output: (doc_id, chunk_id, n_tokens, chunk_text), chunk_id counting
    from 1; the final chunk may be short; empty documents produce no
    chunks. Map-only: tokenization, window starts (one ``sequence`` per
    doc), and slicing happen in a single projection with the token array
    let-bound once (the _word_gram_array pattern — referencing the
    tokenizer inside the per-window lambda would re-run it per window),
    then one Generate (explode). Fan-out is ceil(n_tokens/stride) rows
    per doc — bounded, and no shuffle at any size.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}")
    stride = max_tokens - overlap
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )

    def chunks_of(t):
        starts = F.when(
            F.size(t) > 0, F.sequence(F.lit(1), F.size(t), F.lit(stride))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            starts,
            lambda s, i: F.struct(
                (i + 1).cast("int").alias("chunk_id"),
                F.size(F.slice(t, s, max_tokens)).alias("n_tokens"),
                F.concat_ws(" ", F.slice(t, s, max_tokens)).alias("chunk_text"),
            ),
        )

    bound = F.element_at(F.transform(F.array(toks), chunks_of), 1)
    out = documents.select(
        F.col(id_col).alias("doc_id"), F.explode(bound).alias("c")
    ).select("doc_id", "c.chunk_id", "c.n_tokens", "c.chunk_text")
    # sort=False for pipeline use: a mid-pipeline orderBy range-samples
    # its child, re-executing the (possibly expensive) upstream once
    # more just to pick sort boundaries — the jaccard_near_dups lesson
    return out.orderBy("doc_id", "chunk_id") if sort else out


#: Codepoints stripped by normalize_text, kept as ONE list each so the
#: Spark (java.util.regex \uXXXX) and DuckDB (RE2 \x{XXXX}) character
#: classes are rendered from the same source and can never drift.
#: Zero-width + bidi controls: the classic invisible-character pollution
#: in scraped corpora. C0 controls except tab/newline, plus DEL.
ZW_CODEPOINTS = (
    0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF, 0x200E, 0x200F,
    0x202A, 0x202B, 0x202C, 0x202D, 0x202E,
)
CTRL_CODEPOINTS = (
    tuple(range(0x00, 0x09)) + (0x0B, 0x0C) + tuple(range(0x0E, 0x20)) + (0x7F,)
)


def java_class(codepoints) -> str:
    """Render a java.util.regex character class for Spark."""
    return "[" + "".join(f"\\u{c:04x}" for c in codepoints) + "]"


def re2_class(codepoints) -> str:
    """Render the equivalent RE2 character class for DuckDB oracles."""
    return "[" + "".join(f"\\x{{{c:04X}}}" for c in codepoints) + "]"


ZERO_WIDTH_CLASS = java_class(ZW_CODEPOINTS)
CONTROL_CLASS = java_class(CTRL_CODEPOINTS)


def normalize_text(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unicode canonicalization — the corpus-prep stage that runs BEFORE
    any hashing/dedup/tokenization (two byte-different spellings of the
    same string otherwise land in different dedup buckets forever):

    1. count + strip zero-width/bidi controls and C0 controls
       (regexp projections, JVM whole-stage codegen),
    2. canonicalize newlines (CRLF/CR -> LF),
    3. collapse horizontal whitespace runs to one space, trim ends,
    4. Unicode NFC composition — Spark has no built-in normalizer, so
       this one step is an Arrow-batched pandas_udf (the documented
       slow-path rule: built-ins where possible, vectorized Python only
       where the engine genuinely lacks the primitive).

    Returns (doc_id, norm_text, n_zero_width, n_control, changed).
    Map-only at any scale: one projection, no shuffle; the pandas_udf
    processes Arrow record batches so peak memory is one batch.

    DuckDB twin: nfc_normalize over the same regexp chain — parity is
    exercised on the fixture corpus (ASCII: identity, changed=false) and
    the non-trivial behavior is pinned by golden non-ASCII unit tests
    (tests/test_text_quality.py), mirroring the pii_scrub pattern.
    """
    def _nfc_batch(series):
        import unicodedata

        return series.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    # non-decorator form: the module's `from __future__ import annotations`
    # turns type hints into strings, which pandas_udf's hint inference
    # rejects; an explicit SCALAR udf sidesteps inference entirely.
    nfc = F.pandas_udf(_nfc_batch, "string")

    raw = F.col(text_col)
    stripped = F.regexp_replace(
        F.regexp_replace(raw, ZERO_WIDTH_CLASS, ""), CONTROL_CLASS, ""
    )
    unixed = F.regexp_replace(stripped, "\r\n?", "\n")
    collapsed = F.trim(F.regexp_replace(unixed, "[ \t]+", " "))
    norm = nfc(collapsed)
    return ensure_parallelism(documents).select(
        F.col(id_col).alias("doc_id"),
        norm.alias("norm_text"),
        F.regexp_count(raw, F.lit(ZERO_WIDTH_CLASS)).alias("n_zero_width"),
        F.regexp_count(raw, F.lit(CONTROL_CLASS)).alias("n_control"),
        (~norm.eqNullSafe(raw)).alias("changed"),
    )


def char_lm_familiarity(
    documents: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing_k: int = 10,
) -> DataFrame:
    """Character n-gram LM familiarity — quality scoring one step past
    the doc_stats heuristics: each char n-gram g gets the corpus-trained
    conditional probability P(last char | prefix) = C(g)/C(prefix), and
    a document scores the average over its grams. Gibberish, mojibake
    and wrong-charset text contain char transitions the corpus rarely
    makes, so they score low — the classic KenLM-filter signal, here
    self-trained on the corpus with no model artifact to ship.

    ``smoothing_k`` is the add-k denominator smoothing
    (P = C(g)/(C(prefix)+k)) — WITHOUT it a singleton gram in a
    singleton context scores a perfect 1.0, so unique gibberish would
    out-score common prose (measured: shuffled chars 0.67 vs English
    0.55 unsmoothed; 0.03 vs 0.33 with k=10). Integer k keeps the
    arithmetic engine-stable.

    Numeric shape chosen for CROSS-ENGINE bit-stability: probabilities
    are floored to integer micro-probs (floor(1e6 * C(g)/C(prefix))), a
    doc aggregates them with an exact integer SUM, and only the final
    single division + round is floating point — no order-dependent
    float summation anywhere, so the DuckDB oracle hash-matches at any
    parallelism.

    Returns (doc_id, n_grams, sum_micro_p, avg_char_prob). Scale: one
    explode shuffle on gram for counting; the gram-probability table is
    alphabet^n-bounded (tiny relative to corpus) and broadcast back, so
    the corpus-side join never shuffles.
    """
    # 1-element explode = Generate barrier: without it Catalyst inlines
    # lower(text) into EVERY per-gram lambda element (O(len) work per
    # gram -> O(len^2) per doc; measured 4.7 s vs 2.1 s per pass at
    # sf0.1) — same trap repetition_stats documents.
    lowered = ensure_parallelism(documents).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(F.lower(F.col(text_col)))).alias("__t"),
    )
    t = F.col("__t")
    length = F.length(t)
    grams_expr = F.when(
        length >= n,
        F.transform(
            F.sequence(F.lit(1), length - n + 1),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    docs = lowered.select("doc_id", grams_expr.alias("grams"))
    grams = docs.select("doc_id", F.explode("grams").alias("gram"))
    gram_counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c_gram"))
    prefix_counts = gram_counts.groupBy(
        F.substring("gram", 1, n - 1).alias("prefix")
    ).agg(F.sum("c_gram").alias("c_prefix"))
    probs = gram_counts.join(
        prefix_counts, F.substring("gram", 1, n - 1) == F.col("prefix")
    ).select(
        "gram",
        F.floor(
            F.lit(1_000_000) * F.col("c_gram")
            / (F.col("c_prefix") + F.lit(smoothing_k))
        ).cast("long").alias("micro_p"),
    )
    scored = (
        grams.join(F.broadcast(probs), "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("micro_p").alias("sum_micro_p"),
        )
    )
    base = docs.select("doc_id")
    return (
        base.join(scored, "doc_id", "left")
        .na.fill(0, ["n_grams", "sum_micro_p"])
        .select(
            "doc_id",
            "n_grams",
            "sum_micro_p",
            F.when(
                F.col("n_grams") > 0,
                F.round(
                    F.col("sum_micro_p") / (F.col("n_grams") * F.lit(1_000_000.0)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("avg_char_prob"),
        )
    )


def pack_bins(
    documents: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> DataFrame:
    """Bin-packing sequence packer: first-fit-decreasing into bins of
    ``seq_len`` tokens — the padding-waste-minimizing packer production
    training pipelines use, complementing :func:`pack_offsets` (which
    packs in stream order: simple, exact offsets, but a long doc after
    short ones strands capacity).

    Distributed shape: docs hash into ``num_buckets`` INDEPENDENT packing
    domains (bucket = md5(doc_id) mod B — a pure projection, stable at
    any parallelism); each bucket runs local FFD in one Arrow-batched
    ``applyInPandas`` group. The group carries only (doc_id, n_tokens)
    — ~12 bytes/doc, never text — so at a billion docs and B=1024 a
    bucket is ~12 MB of state; size B so bucket token mass / seq_len
    bins fit comfortably. Within-bucket order is (n_tokens DESC, doc_id)
    — fully deterministic. Bin ids are namespaced bucket * 2^32 + local.

    Docs longer than seq_len get a bin of their own (truncation belongs
    upstream in chunk_documents). The any-fit guarantee — every bin but
    one ends more than half full — bounds bins at
    floor(2*total/seq_len)+1 per bucket, which the ``pack_bins`` summary
    row turns into an oracle-checkable invariant.

    Returns (doc_id, n_tokens, bucket, bin_id).
    """
    import pandas as pd

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    docs = ensure_parallelism(documents).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
            .cast("long") % num_buckets
        ).cast("int").alias("bucket"),
    )

    def ffd(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []
        assigned = []
        bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        base = bucket << 32
        for n in pdf["n_tokens"]:
            n = int(n)
            placed = None
            for i, fill in enumerate(fills):
                if fill + n <= seq_len:
                    placed = i
                    break
            if placed is None:
                fills.append(n)
                placed = len(fills) - 1
            else:
                fills[placed] += n
            assigned.append(base + placed)
        pdf["bin_id"] = pd.Series(assigned, dtype="int64")
        return pdf[["doc_id", "n_tokens", "bucket", "bin_id"]]

    return docs.groupBy("bucket").applyInPandas(
        ffd, "doc_id long, n_tokens int, bucket int, bin_id long"
    )


def pack_bins_summary(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-bucket packing audit over :func:`pack_bins` output:
    (bucket, n_docs, total_tokens, bins_ok) where bins_ok asserts the
    three invariants any correct any-fit packing satisfies —
    max bin fill <= seq_len (given no oversized docs),
    n_bins >= ceil(total/seq_len) (volume lower bound), and
    n_bins <= floor(2*total/seq_len)+1 (the more-than-half-full
    guarantee). A DuckDB oracle recomputes n_docs/total_tokens exactly
    and asserts TRUE, so a packing regression (lost doc, overfilled or
    fragmented bins) hash-mismatches without the oracle having to
    replay FFD."""
    bins = packed.groupBy("bucket", "bin_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.count(F.lit(1)).alias("n_in_bin"),
    )
    per_bucket = bins.groupBy("bucket").agg(
        F.sum("n_in_bin").alias("n_docs"),
        F.sum("fill").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_bins"),
        F.max("fill").alias("max_fill"),
    )
    lb = F.ceil(F.col("total_tokens") / F.lit(seq_len))
    ub = F.floor(F.lit(2) * F.col("total_tokens") / F.lit(seq_len)) + 1
    return per_bucket.select(
        "bucket",
        "n_docs",
        "total_tokens",
        (
            (F.col("max_fill") <= F.lit(seq_len))
            & (F.col("n_bins") >= lb)
            & (F.col("n_bins") <= ub)
        ).alias("bins_ok"),
    ).orderBy("bucket")
