from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lab_etl_batch_data_processing_pipeline__spark.operators import (
    sessions,
    similarity,
    text,
)

TS = dt.datetime


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions split by a >30min gap
        (1, 1, TS(2024, 1, 1, 10, 0, 0), "view"),
        (2, 1, TS(2024, 1, 1, 10, 10, 0), "click"),
        (3, 1, TS(2024, 1, 1, 12, 0, 0), "view"),
        # user 2: single event
        (4, 2, TS(2024, 1, 1, 9, 0, 0), "view"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_sessionize_gap_assignment(events):
    out = sessions.sessionize(events, "user_id", "ts", gap_minutes=30).collect()
    seqs = {r.event_id: r.session_seq for r in out}
    assert seqs == {1: 1, 2: 1, 3: 2, 4: 1}


def test_session_stats(events):
    out = sessions.session_stats(events, "user_id", "ts", gap_minutes=30).collect()
    rows = {(r.user_id, r.session_seq): (r.n_events, r.duration_sec) for r in out}
    assert rows == {(1, 1): (2, 600), (1, 2): (1, 0), (2, 1): (1, 0)}


def test_session_gap_boundary_exclusive(spark):
    # gap exactly == threshold stays in the same session (strict >)
    df = spark.createDataFrame(
        [(1, 1, TS(2024, 1, 1, 0, 0, 0)), (2, 1, TS(2024, 1, 1, 0, 30, 0))],
        "event_id long, user_id long, ts timestamp",
    )
    out = sessions.sessionize(df, "user_id", "ts", gap_minutes=30).collect()
    assert {r.session_seq for r in out} == {1}


def test_user_engagement(events):
    out = {r.user_id: r for r in sessions.user_engagement(
        events, "user_id", "ts", "event_type").collect()}
    assert out[1].n_events == 3 and out[1].n_event_types == 2
    assert out[1].span_sec == 7200
    assert out[2].span_sec == 0


def test_token_frequencies(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "A c")], "doc_id long, text string"
    )
    out = {r.token: r.n_occurrences for r in text.token_frequencies(df).collect()}
    assert out == {"a": 3, "b": 1, "c": 1}  # lowercased across docs


def test_word_ngrams_and_short_doc_guard(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "solo")], "doc_id long, text string"
    )
    out = {r.ngram: r.n_occurrences for r in text.word_ngrams(df, n=2).collect()}
    assert out == {"x y": 1, "y z": 1}  # 1-token doc contributes nothing


def test_label_centroids(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),
            (1, [0.0, 2.0], 1),
            (2, [10.0, 10.0], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.label: r for r in similarity.label_centroids(df).collect()}
    assert out[1].centroid == [0.5, 1.0]
    assert out[1].n_vectors == 2
    assert out[2].centroid == [10.0, 10.0]


def test_tfidf_rational_weights(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import text as t

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "c c c")],
        "doc_id long, text string",
    )
    rows = {(r.doc_id, r.token): r for r in t.tfidf(docs).collect()}
    # N=3; token 'a' in 2 docs -> idf (3+1)/(2+1); tf of 'a' in doc 1 is 2
    assert rows[(1, "a")].tf == 2 and rows[(1, "a")].df == 2
    assert abs(rows[(1, "a")].tfidf - 2 * (4 / 3)) < 1e-12
    assert rows[(3, "c")].tf == 3 and rows[(3, "c")].df == 2


def test_split_assign_deterministic_and_proportional(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators import text as t

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in t.split_assign(df).collect()}
    b = {r.doc_id: r.split for r in t.split_assign(df).collect()}
    assert a == b  # stable across runs
    from collections import Counter

    counts = Counter(a.values())
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 5000 < 0.85
    assert 0.07 < counts["val"] / 5000 < 0.13
    # salt reshuffles membership but keeps proportions
    salted = {r.doc_id: r.split for r in t.split_assign(df, salt="v2").collect()}
    assert salted != a


def test_pmi_collocations_planted_pair(spark):
    """A pair whose parts never appear apart ranks first; lift for it is
    N / c_xy (since c_x = c_y = c_xy); common-word pairs score ~1x."""
    from lab_etl_batch_data_processing_pipeline__spark.operators.text import (
        pmi_collocations,
    )

    # "san francisco" 6 times, parts never apart; filler of common words
    filler = "the cat sat on the mat " * 30
    docs = spark.createDataFrame(
        [(i, filler + "san francisco " * 3) for i in range(2)],
        ["doc_id", "text"],
    )
    out = pmi_collocations(docs, min_count=5, top_k=10).collect()
    assert out[0].w1 == "san" and out[0].w2 == "francisco"
    n_total = 2 * (6 * 30 + 6)  # 366 tokens per doc
    assert out[0].pair_count == 6
    # c_x = c_y = c_xy = 6 -> lift = c_xy*N/(c_x*c_y) = N / 6
    assert out[0].lift_ppm == 1_000_000 * n_total // 6
    # ranks are 1..k with non-increasing lift
    lifts = [r.lift_ppm for r in out]
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    assert lifts == sorted(lifts, reverse=True)
