"""operators/quality.py — deterministic trainable quality classifier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lab_etl_batch_data_processing_pipeline__spark.operators import quality, text


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _labels(docs):
    return text.doc_stats(docs).select(
        "doc_id", (F.col("quality_score") >= 0.8).cast("int").alias("y")
    )


def test_training_is_bit_deterministic(spark, corpus):
    """The whole point of the integer-GD design: two independent fits on
    the same corpus return identical weight vectors."""
    labels = _labels(corpus)
    w1 = quality.train_quality_classifier(
        quality.hashed_char_ngram_features(corpus), labels, n_iter=4
    )
    w2 = quality.train_quality_classifier(
        quality.hashed_char_ngram_features(corpus), labels, n_iter=4
    )
    assert w1 == w2
    assert len(w1) == 512 + len(quality.LEN_STEPS) + 1


def test_learns_separable_classes(spark):
    """Capacity check on a cleanly separable synthetic corpus: punct-soup
    docs vs plain prose, labels provided directly — the model must fit
    its own training set essentially perfectly."""
    rows = [(i, "!!! ??? %%% !!! ??? %%% !!! ??? " * 4, 0) for i in range(10)]
    rows += [
        (10 + i, "the quick brown fox jumps over the lazy dog again " * 3, 1)
        for i in range(10)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in rows], "doc_id long, y int"
    )
    feats = quality.hashed_char_ngram_features(docs)
    w = quality.train_quality_classifier(feats, labels)
    scored = quality.score_quality(feats, w).join(labels, "doc_id")
    acc = scored.select(
        F.avg((F.col("pred").cast("int") == F.col("y")).cast("int"))
    ).first()[0]
    assert acc == 1.0


def test_real_fixture_accuracy_floor(spark, corpus):
    """Per-class accuracy on the weak-label task must clear the gate
    floor the registry row asserts (measured 0.93-0.99)."""
    labels = _labels(corpus)
    feats = quality.hashed_char_ngram_features(corpus)
    w = quality.train_quality_classifier(feats, labels)
    per = (
        quality.score_quality(feats, w)
        .join(labels, "doc_id")
        .groupBy("y")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("pred").cast("int") == F.col("y")).cast("int")).alias(
                "n_ok"
            ),
        )
        .collect()
    )
    assert len(per) == 2
    for r in per:
        assert r.n_ok >= 0.8 * r.n, (r.y, r.n_ok, r.n)


def test_feature_shape(spark):
    """Gram block has unit L1 mass semantics, exactly one one-hot length
    bucket fires, and short/empty docs are safe."""
    docs = spark.createDataFrame(
        [(1, "abcdef " * 50), (2, "ab"), (3, "")],
        "doc_id long, text string",
    )
    f = quality.hashed_char_ngram_features(docs, dim=64)
    rows = f.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    onehot_1 = [r for r in by_doc[1] if r.bucket >= 64]
    assert len(onehot_1) == 1 and onehot_1[0].cnt == quality.FEAT_SCALE
    gram_mass = sum(r.cnt for r in by_doc[1] if r.bucket < 64)
    assert abs(gram_mass - quality.FEAT_SCALE) <= 64  # integer-div loss
    # docs shorter than n chars yield no feature rows at all (documented:
    # they cannot be scored; training still covers them via the bias row)
    assert 2 not in by_doc and 3 not in by_doc


def test_score_quality_matches_r18_fold_form(spark, corpus):
    """r19 optimization pin: scoring as one codegen'd SUM aggregate
    (w[bucket]*cnt summed per doc + literal bias) is bit-identical to
    the r18 sorted-array interpreted-fold form — long products and long
    sums are order-invariant, so the two plans must agree exactly on
    every doc, including the pred boolean at the z == 0 boundary."""
    labels = _labels(corpus)
    feats = quality.hashed_char_ngram_features(corpus)
    w = quality.train_quality_classifier(feats, labels, n_iter=4)
    # the r18 form, verbatim: bias row unioned per doc, dense sorted
    # array, HOF fold via _z_expr
    feats_b = feats.select("doc_id", "bucket", "cnt").unionByName(
        feats.select("doc_id")
        .distinct()
        .select(
            "doc_id",
            F.lit(len(w) - 1).cast("long").alias("bucket"),
            F.lit(quality.FEAT_SCALE).cast("long").alias("cnt"),
        )
    )
    dense = feats_b.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("bucket", "cnt"))).alias("feats")
    )
    old = dense.select(
        "doc_id", F.explode(F.array(quality._z_expr(w))).alias("score_s")
    ).select("doc_id", "score_s", (F.col("score_s") >= 0).alias("pred"))
    new = quality.score_quality(feats, w)
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0
