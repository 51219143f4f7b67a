"""Trainable quality classifier — the model-based corpus gate.

The heuristic gates (text.doc_stats quality_score, repetition_stats,
char_lm_familiarity) are fixed formulas; the other standard corpus-intake
stage is a TRAINED quality scorer (the fasttext-style classifier of
GPT-3/LLaMA data pipelines: learn from weak labels, score everything,
gate on the score). This module provides that stage as a deterministic,
in-Spark implementation:

- features: hashed char n-gram counts (the fasttext trick — no
  vocabulary state, fixed ``dim`` buckets, counts capped so no single
  doc dominates a gradient);
- model: logistic regression with a HARD-SIGMOID link
  sigma(z) = clamp(z/4 + 1/2, 0, 1), full-batch gradient descent,
  fixed iteration count, power-of-two learning rate;
- arithmetic: EVERY aggregated quantity is an integer. Weights live at
  fixed-point scale 2^20, per-row gradient contributions are exact
  products of longs, and sums are long sums — so training is
  order-invariant: reruns, different partitionings, and different
  cluster sizes produce BIT-IDENTICAL weights. A float implementation
  (Spark MLlib's LogisticRegression included) is not: float gradient
  sums over shuffled partials drift in the last ulp and the drift
  compounds per iteration. Determinism is what makes the scorer an
  *engine-stable artifact* — scores can be hash-pinned, cached, and
  diffed across runs. The hard-sigmoid link exists for the same reason:
  exp() would reintroduce platform-dependent libm bits.

Scale shape: the sparse feature matrix (doc_id, bucket, cnt) is built
once (one map-side explode + one aggregate) and localCheckpointed;
each iteration is two shuffles over it (doc-keyed score aggregate,
bucket-keyed gradient aggregate) plus a dim-sized driver collect —
the same data movement as MLlib's treeAggregate LR, with dim bounding
all driver state. Long-sum gradient overflow bound: |err| <= 2^20,
cnt <= cap, so ~2^40 headroom of corpus rows per bucket; beyond that
shard the gradient aggregate (documented, not needed at any tested SF).

Reference scope note: the reference pipeline has no ML surface at all
(SURVEY.md §2.8); this operator is part of the training-data extension
the north star prescribes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import normalized_text
from .layout import ensure_parallelism
from .graph import _ckpt

#: fixed-point scale of weights / probabilities (2^-20 grain — the same
#: grain the tfidf/char-LM fixed-point sums use)
SCALE = 1 << 20

#: fixed-point scale of feature values (2^-10 grain frequencies)
FEAT_SCALE = 1 << 10

#: ONE-HOT length-bucket boundaries (in n-grams, ~sqrt(2)-spaced):
#: exactly one length feature fires per doc (the bucket its gram count
#: falls in). One-hot, not cumulative steps: step features all fire
#: together and are heavily collinear with the bias, which blows up the
#: top Hessian eigenvalue and makes fixed-rate full-batch GD oscillate
#: between the all-positive and all-negative classifiers (measured);
#: a one-hot basis keeps features orthogonal and still expresses any
#: length gate to bucket resolution. A single linear length feature is
#: rejected for the conditioning reason on the other side: it needs
#: weight magnitudes inversely proportional to the class gap, which a
#: fixed small iteration budget won't reach.
LEN_STEPS = (16, 23, 32, 45, 64, 91, 128, 181, 256, 362, 512, 724, 1024)


def hashed_char_ngram_features(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    dim: int = 512,
) -> DataFrame:
    """Sparse hashed frequency features: (doc_id, bucket, cnt) — one row
    per (document, occupied bucket). Buckets 0..dim-1 hold the hashed
    char n-gram FREQUENCY profile (``bucket = xxhash64(gram) % dim``,
    ``cnt = gram_count / total_grams`` at fixed-point scale 2^10) — the
    gram block of each doc's feature vector has unit L1 mass, the same
    as the one-hot length block and the bias, so no block dominates the
    update direction (an upscaled gram block was measured to drive a
    collective common-mode oscillation); buckets ``dim + k`` are ONE-HOT length
    buckets — exactly one fires per doc: k indexes the largest
    LEN_STEPS boundary <= gram count (k=0 also covers docs shorter
    than LEN_STEPS[0]). Frequencies rather
    than raw counts make the profile scale-free — a linear model can
    then express the ratio-style signals (punctuation density, stopword
    density) quality is actually made of, with the one length slot
    carrying document size; raw-count features just re-measure length
    in every bucket.

    Map-side explode + one hash aggregate; no vocabulary state anywhere
    (the hashing trick), so the feature space is identical on every
    engine run and corpus shard. The 1-element-explode Generate barrier
    materializes the normalized text once per row (the measured
    HOF-inlining footgun would otherwise re-run the regex per gram).
    All values are exact integers (integer div), so every downstream
    sum is order-invariant.
    """
    norm = normalized_text(F.col(text_col))
    base = ensure_parallelism(documents).select(
        F.col(id_col).alias("doc_id"), F.explode(F.array(norm)).alias("t")
    )
    n_grams = F.when(
        F.length("t") >= n, F.sequence(F.lit(1), F.length("t") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    rows = base.select(
        "doc_id",
        F.size(n_grams).cast("long").alias("total"),
        F.explode(
            F.transform(
                n_grams,
                lambda i: F.pmod(
                    F.xxhash64(F.col("t").substr(i, F.lit(n))), F.lit(dim)
                ),
            )
        ).alias("bucket"),
    )
    freq = rows.groupBy("doc_id", "bucket").agg(
        F.expr(f"CAST(count(*) * {FEAT_SCALE} AS LONG) div first(total)")
        .alias("cnt")
    )
    bucket_idx = sum(
        (F.col("total") >= s).cast("int") for s in LEN_STEPS[1:]
    )
    length_onehot = (
        rows.groupBy("doc_id")
        .agg(F.first("total").alias("total"))
        .select(
            "doc_id",
            (F.lit(dim) + bucket_idx).cast("long").alias("bucket"),
            F.lit(FEAT_SCALE).cast("long").alias("cnt"),
        )
    )
    return freq.unionByName(length_onehot)


def _dense_features(features: DataFrame, labels: DataFrame) -> DataFrame:
    """(doc_id, y, feats array<struct<bucket,cnt>>) — the per-doc dense
    form iterations fold over map-side. The array is sorted by bucket so
    the in-row fold order (and thus every sum) is canonical."""
    return (
        features.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("bucket", "cnt"))
            ).alias("feats")
        )
        .join(
            labels.select("doc_id", F.col("y").cast("long").alias("y")),
            "doc_id",
        )
    )


def _z_expr(weights: list[int]):
    """Fixed-point margin z_s = sum(w[bucket] * cnt_stored) as a single
    HOF fold over the per-doc feature array (weights inlined as a
    literal array — dim-bounded, no join). ``cnt_stored`` is the
    UNCENTERED relative frequency; see :func:`_centered_margin`."""
    w_arr = F.array(*[F.lit(int(w)) for w in weights])
    return F.aggregate(
        F.col("feats"),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.element_at(w_arr, (s["bucket"] + 1).cast("int")) * s["cnt"],
    )


# NOTE on a rejected design: centering gram features (f - uniform share)
# looks like the textbook conditioning fix, but its gradient correction
# applies one identical common-mode term to every gram slot — the 512
# slots then drift in lockstep and act as a 512x-amplified bias, which
# is exactly the runaway eigendirection centering was meant to remove
# (measured: the trained model collapses to one class with a huge
# effective bias). Raw sparse features + per-feature support
# normalization + a decaying step converge instead.


def train_quality_classifier(
    features: DataFrame,
    labels: DataFrame,
    dim: int = 512,
    n_iter: int = 12,
    lr_shift: int = 1,
) -> list[int]:
    """Fit the hard-sigmoid logistic model; returns ``dim + len(LEN_STEPS) + 1``
    fixed-point weights (scale 2^20; slots dim..dim+len(LEN_STEPS)-1 the
    length steps', the last one the bias) as plain ints — a tiny, engine-portable
    artifact (store it next to the IVF/PQ indexes).

    ``features`` = (doc_id, bucket, cnt) from
    :func:`hashed_char_ngram_features` (same ``dim``); ``labels`` =
    (doc_id, y) with y in {0, 1}. Full-batch updates, ``n_iter`` fixed
    iterations, initial learning rate 2^-``lr_shift`` halved each
    quarter of the iteration budget. All sums are long sums
    and the driver update uses exact integer floor division, so the
    returned weights are bit-identical across reruns and partitionings
    (module docstring).

    Per-iteration data movement: the margin and error are MAP-SIDE folds
    over the checkpointed per-doc feature arrays (weights ride along as
    a dim-sized literal array — no join, no doc-keyed shuffle); the only
    shuffle is the bucket-keyed gradient aggregate, dim-bounded on the
    reduce side. The error column is materialized through a 1-element
    explode before the gradient transform references it — the Generate
    barrier that stops Catalyst inlining the whole margin fold once per
    feature element (the measured O(nnz^2) HOF footgun).
    """
    # bias slot = last, value 1.0 at feature scale, on every doc
    n_slots = dim + len(LEN_STEPS) + 1
    feats_b = features.select("doc_id", "bucket", "cnt").unionByName(
        labels.select(
            "doc_id",
            F.lit(n_slots - 1).cast("long").alias("bucket"),
            F.lit(FEAT_SCALE).cast("long").alias("cnt"),
        )
    )
    dense = _ckpt(_dense_features(feats_b, labels))
    n_docs = dense.count()
    # Diagonal preconditioning, per feature: a sparse slot touches only
    # its support's docs, so the full-batch (1/n) normalization scales
    # its effective rate by support/n (for the one-hot length buckets a
    # 1/13-ish crawl — measured to need ~50+ iterations). Dividing each
    # slot's gradient by its own SUPPORT count makes every update a
    # mean-error step of O(1) — the same per-feature normalization
    # fasttext gets implicitly from per-example SGD. Exact integer
    # counts; determinism untouched.
    support = {
        r["bucket"]: r["n"]
        for r in feats_b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if n_docs == 0:
        return [0] * n_slots
    weights = [0] * n_slots
    half = SCALE // 2
    # z_s carries scale SCALE * FEAT_SCALE (weights x frequencies):
    # p_s = clamp(z_real/4 + 1/2) at SCALE  ->  div by 4 * FEAT_SCALE
    err_template = (
        F.greatest(
            F.lit(0).cast("long"),
            F.least(
                F.lit(SCALE).cast("long"),
                F.expr(f"__z div {4 * FEAT_SCALE}") + F.lit(half),
            ),
        )
        - F.col("y") * F.lit(SCALE)
    )
    for it in range(n_iter):
        step = dense.select(
            "feats",
            "y",
            F.explode(F.array(_z_expr(weights))).alias("__z"),
        ).select(
            "feats", F.explode(F.array(err_template)).alias("err_s")
        )
        grad_rows = (
            step.select(
                F.explode(
                    F.transform(
                        "feats",
                        lambda s: F.struct(
                            s["bucket"].alias("bucket"),
                            (s["cnt"] * F.col("err_s")).alias("g"),
                        ),
                    )
                ).alias("gb")
            )
            .groupBy(F.col("gb.bucket").alias("bucket"))
            .agg(F.sum("gb.g").alias("g"))
            .collect()
        )
        grad = {r.bucket: r.g for r in grad_rows}
        # grad_s scale = SCALE * FEAT_SCALE (err x feature); w scale =
        # SCALE  ->  divide the FEAT_SCALE back out with n and lr.
        # The step HALVES each quarter of the budget: the hard-sigmoid
        # loss is piecewise-linear, so fixed-step full-batch GD rides a
        # limit cycle around the optimum (measured: the all-positive /
        # all-negative classifier alternates with iteration count); a
        # decaying step is the standard subgradient-method fix and is
        # deterministic by construction.
        shift = lr_shift + (4 * it) // n_iter
        weights = [
            w
            - (
                grad.get(b, 0)
                // (max(support.get(b, n_docs), 1) << shift)
                // FEAT_SCALE
            )
            for b, w in enumerate(weights)
        ]
    return weights


def score_quality(features: DataFrame, weights: list[int]) -> DataFrame:
    """Score docs with trained weights: (doc_id, score_s, pred) where
    ``score_s`` is the fixed-point margin z_s (scale 2^20 — positive
    means predicted-quality) and ``pred`` = z_s >= 0. Scoring is ONE
    codegen'd projection + hash aggregate: z_s = SUM over the doc's
    feature rows of w[bucket] * cnt, plus the bias term w[last] *
    FEAT_SCALE folded in as a literal after the aggregate. Every term
    is an exact long product and long sums are order-invariant, so this
    is bit-identical to the r18 sorted-array fold form (pinned by
    tests) while skipping that form's three extra passes: the distinct
    + union that appended a per-doc bias ROW, the collect_list +
    array_sort into the dense form, and the per-element interpreted
    higher-order fold (``aggregate`` HOFs are CodegenFallback — the
    kmeans lesson, guide §4.2; measured 3.0 s -> ~2.0 s at sf0.1 as the
    quality_classifier scoring phase). ``weights`` is the train output
    (bias last); docs are those present in ``features`` — a doc shorter
    than the n-gram width yields no feature rows and cannot be scored
    (training still covers it through the bias row added per LABELED
    doc)."""
    w_arr = F.array(*[F.lit(int(w)) for w in weights])
    term = F.element_at(w_arr, (F.col("bucket") + 1).cast("int")) * F.col("cnt")
    bias = int(weights[-1]) * FEAT_SCALE
    return (
        features.select("doc_id", term.alias("__t"))
        .groupBy("doc_id")
        .agg((F.sum("__t") + F.lit(bias)).cast("long").alias("score_s"))
        .select("doc_id", "score_s", (F.col("score_s") >= 0).alias("pred"))
    )
