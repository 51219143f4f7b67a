"""Training-data quality-filter operators: Gopher-style repetition,
benchmark decontamination, PII scrubbing (operators/text.py round 5)."""

from __future__ import annotations

from lab_etl_batch_data_processing_pipeline__spark.operators import text


def test_repetition_stats_flags_boilerplate(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta\nalpha beta\nalpha beta\ngamma"),
            (2, "one two three four five six seven eight"),
            (3, "spam spam spam spam spam spam"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.repetition_stats(docs).collect()}
    # doc 1: 4 lines, "alpha beta" x3 -> 2 distinct -> dup 0.5
    assert out[1].n_lines == 4 and abs(out[1].dup_line_frac - 0.5) < 1e-9
    # doc 2: all tokens unique -> zero duplicate grams
    assert out[2].dup_2gram_frac == 0.0 and out[2].dup_3gram_frac == 0.0
    # doc 3: "spam spam" x5 -> 1 distinct of 5 -> dup 0.8
    assert out[3].n_2grams == 5 and abs(out[3].dup_2gram_frac - 0.8) < 1e-9
    # empty doc: zero counts, zero fractions (no div-by-zero NULLs)
    assert (out[4].n_lines, out[4].dup_line_frac, out[4].dup_2gram_frac) == (
        0,
        0.0,
        0.0,
    )


def test_decontaminate_counts_overlapping_grams(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "totally unrelated words appear in this document here"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, "the quick brown fox leaps")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r for r in text.decontaminate(corpus, benchmark, n=3).collect()
    }
    # doc 1 shares exactly "the quick brown" and "quick brown fox"
    assert out[1].n_contaminated == 2 and out[1].is_contaminated
    assert abs(out[1].contamination_frac - round(2 / out[1].n_grams, 6)) < 1e-9
    assert out[2].n_contaminated == 0 and not out[2].is_contaminated
    # doc shorter than n: zero grams, zero fraction, present in output
    assert (out[3].n_grams, out[3].contamination_frac) == (0, 0.0)


def test_decontaminate_shuffled_join_mode_matches(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "g h i j k l")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "c d e f g")], "doc_id long, text string")
    fast = text.decontaminate(corpus, bench, n=3).collect()
    slow = text.decontaminate(
        corpus, bench, n=3, broadcast_benchmark=False
    ).collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))


def test_pii_scrub_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or call 555-123-4567."),
            (2, "ssn 123-45-6789 appears; phone +1 212.555.0199 too"),
            (3, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.pii_scrub(docs).collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1
    assert "[EMAIL]" in out[1].text and "[PHONE]" in out[1].text
    assert "jane.doe" not in out[1].text and "555-123" not in out[1].text
    assert out[2].n_ssn == 1 and "[SSN]" in out[2].text
    assert "123-45-6789" not in out[2].text
    assert out[2].n_phone == 1 and "212.555.0199" not in out[2].text
    assert out[3].text == "no pii here at all"
    assert (out[3].n_email, out[3].n_ssn, out[3].n_phone) == (0, 0, 0)


def test_pii_scrub_email_wins_over_phone(spark):
    # digits inside an email must not be half-eaten by the phone pattern
    docs = spark.createDataFrame(
        [(1, "contact 555-123-4567@example.com now")], "doc_id long, text string"
    )
    r = text.pii_scrub(docs).collect()[0]
    assert r.n_email == 1 and r.n_phone == 0
    assert r.text == "contact [EMAIL] now"


def test_mixture_sample_caps_and_passthrough(spark):
    """An over-budget source is downsampled (thresh < 65536); a source
    within its share passes through whole (thresh = 65536, every doc
    kept); the decision is deterministic across invocations."""
    rows = (
        # 'big': 40 docs x 100 tokens = 4000 tokens
        [(i, "big", "tok " * 100) for i in range(40)]
        # 'small': 4 docs x 10 tokens = 40 tokens
        + [(100 + i, "small", "tok " * 10) for i in range(4)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    # budget 2000 -> share 1000/source; big rate = 1000/4000 = 0.25,
    # small rate capped at 1.0
    out = text.mixture_sample(docs, budget_tokens=2000).collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    assert len(by_source["small"]) == 4  # passthrough
    assert all(r.keep_thresh == 65536 for r in by_source["small"])
    big = by_source["big"]
    assert all(r.keep_thresh == 16384 for r in big)  # floor(0.25 * 65536)
    assert 0 < len(big) < 40  # downsampled, not emptied
    # deterministic: identical kept set on re-run
    out2 = text.mixture_sample(docs, budget_tokens=2000).collect()
    assert sorted(r.doc_id for r in out2) == sorted(r.doc_id for r in out)


def test_pack_offsets_is_an_exact_prefix_sum(spark):
    """The two-phase (bucketed) prefix sum must tile the token axis
    exactly: offsets sorted by (md5, id) are gapless, start at 0, and end
    at the corpus token total; bins follow floor(offset/seq_len)."""
    import hashlib

    docs = spark.createDataFrame(
        [(i, "tok " * (5 + i % 7)) for i in range(200)], ["doc_id", "text"]
    )
    out = text.pack_offsets(docs, seq_len=64, buckets=16).collect()
    rows = sorted(
        out, key=lambda r: (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id)
    )
    cum = 0
    for r in rows:
        assert r.start_offset == cum, f"gap at doc {r.doc_id}"
        assert r.seq_bin == cum // 64
        cum += r.n_tokens
    assert cum == sum(r.n_tokens for r in rows)


def test_pack_offsets_rejects_unachievable_bucket_count(spark):
    """One md5 byte drives the bucket assignment, so buckets > 256 would
    silently cap parallelism below the requested value — the parameter
    must be validated, not quietly truncated."""
    import pytest

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="256"):
        text.pack_offsets(docs, buckets=512)


def test_chunk_documents_overlap_and_tail(spark):
    """Window/stride semantics: chunks start every (max-overlap) tokens,
    consecutive chunks share exactly `overlap` tokens, the tail chunk may
    be short, and empty docs produce nothing."""
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, ""), (3, "a b")],
        ["doc_id", "text"],
    )
    out = text.chunk_documents(docs, max_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.n_tokens, r.chunk_text))
    assert 2 not in by_doc  # empty doc -> no chunks
    assert by_doc[3] == [(1, 2, "a b")]  # short doc -> single short chunk
    assert by_doc[1] == [
        (1, 4, "t0 t1 t2 t3"),
        (2, 4, "t3 t4 t5 t6"),  # starts at 4 = 1 + (4-1): one-token overlap
        (3, 4, "t6 t7 t8 t9"),
        (4, 1, "t9"),           # tail
    ]


def test_chunk_documents_validates_overlap(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        text.chunk_documents(docs, max_tokens=4, overlap=4)


def test_mixture_sample_explicit_weights(spark):
    """Weighted mixing: shares follow the weight dict, an absent source
    is excluded, and an under-budget weighted source passes through."""
    rows = (
        [(i, "web", "tok " * 100) for i in range(40)]       # 4000 tokens
        + [(100 + i, "code", "tok " * 100) for i in range(40)]  # 4000 tokens
        + [(200 + i, "junk", "tok " * 10) for i in range(4)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = text.mixture_sample(
        docs, budget_tokens=4000, weights={"web": 3.0, "code": 1.0}
    ).collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    assert "junk" not in by_source  # weight 0 -> excluded
    # web share = 3000/4000 -> thresh floor(0.75*65536); code = 1000/4000
    assert all(r.keep_thresh == 49152 for r in by_source["web"])
    assert all(r.keep_thresh == 16384 for r in by_source["code"])
    assert len(by_source["web"]) > len(by_source["code"])
    # deterministic on re-run
    out2 = text.mixture_sample(
        docs, budget_tokens=4000, weights={"web": 3.0, "code": 1.0}
    ).collect()
    assert sorted(r.doc_id for r in out2) == sorted(r.doc_id for r in out)


def test_mixture_sample_rejects_degenerate_weights(spark):
    """weights={} / all-zero would make share = NaN and keep EVERYTHING
    (Spark's least() orders NaN above all doubles) — refused loudly."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "web", "tok tok")], ["doc_id", "source", "text"]
    )
    for bad in ({}, {"web": 0.0}, {"web": 2.0, "code": -2.0}):
        with pytest.raises(ValueError, match="weights must sum"):
            text.mixture_sample(docs, budget_tokens=100, weights=bad)



def test_normalize_text_goldens(spark):
    """Non-ASCII canonicalization goldens (the fixture corpus is ASCII,
    so the driver row only proves identity — this pins the real work):
    NFC composition, zero-width strip, control strip, CRLF->LF,
    whitespace collapse, NULL passthrough."""
    rows = [
        # decomposed e + combining acute -> composed; ZWSP stripped
        (1, "cafe" + chr(0x0301) + " zero" + chr(0x200B) + "width"),
        (2, "a\r\nb\rc"),                       # CRLF + bare CR -> LF
        (3, "x" + chr(7) + "y  \t z  "),         # BEL + ws runs + trim
        (4, "plain ascii"),
        (5, None),
        # bidi override stripped and counted as zero-width
        (6, "rtl" + chr(0x202E) + "txt"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.normalize_text(df).collect()}
    assert out[1].norm_text == "caf" + chr(0xE9) + " zerowidth"
    assert out[1].n_zero_width == 1 and out[1].changed
    assert out[2].norm_text == "a\nb\nc" and out[2].changed
    assert out[3].norm_text == "xy z" and out[3].n_control == 1
    assert out[4].norm_text == "plain ascii" and not out[4].changed
    assert out[5].norm_text is None and not out[5].changed
    assert out[6].norm_text == "rtltxt" and out[6].n_zero_width == 1


def test_normalize_text_duckdb_parity_on_non_ascii(spark):
    """Cross-engine parity on NON-ascii content: the oracle SQL chain
    (RE2 classes + utf8proc nfc_normalize) must agree with the Spark
    chain (java classes + Python unicodedata NFC) beyond the trivial
    fixture — guards the renderer pair in text.java_class/re2_class."""
    import duckdb

    samples = [
        "cafe" + chr(0x0301) + "s",
        "A" + chr(0x200D) + "B" + chr(0x200C) + "C",
        "o" + chr(0x0308) + "ver  lines\r\nhere",
        chr(0x202A) + "embed" + chr(0x202C),
        "n" + chr(0x0303) + " plus " + chr(0x1F) + "ctrl",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.norm_text, r.n_zero_width, r.n_control, r.changed)
        for r in text.normalize_text(df).collect()
    }
    con = duckdb.connect()
    zw = text.re2_class(text.ZW_CODEPOINTS)
    ctrl = text.re2_class(text.CTRL_CODEPOINTS)
    for i, s in enumerate(samples):
        row = con.execute(
            f"""
            WITH n AS (
              SELECT nfc_normalize(trim(regexp_replace(regexp_replace(
                       regexp_replace(regexp_replace(?,
                         '{zw}', '', 'g'), '{ctrl}', '', 'g'),
                       '\\r\\n?', chr(10), 'g'),
                       '[ \\t]+', ' ', 'g'))) AS norm_text,
                     CAST(len(regexp_extract_all(?, '{zw}')) AS INT) AS nz,
                     CAST(len(regexp_extract_all(?, '{ctrl}')) AS INT) AS nc
            )
            SELECT norm_text, nz, nc, norm_text IS DISTINCT FROM ? FROM n
            """,
            [s, s, s, s],
        ).fetchone()
        assert got[i] == row, f"sample {i}: spark={got[i]} duck={row}"


def test_char_lm_discriminates_gibberish(spark):
    """The corpus-trained char-trigram familiarity must score natural
    English above character-shuffled gibberish of the same length —
    the property that makes it a quality filter."""
    english = [
        "the quick brown fox jumps over the lazy dog and runs away",
        "this is a perfectly normal english sentence about the weather",
        "machine learning models need large amounts of training data",
        "the cat sat on the mat and then the dog came along too",
        "reading books in the evening is a pleasant way to relax",
        "people often walk along the river in the early morning light",
    ]
    import random

    rng = random.Random(7)
    gibberish = []
    for s in english[:3]:
        chars = list(s.replace(" ", ""))
        rng.shuffle(chars)
        gibberish.append("".join(chars))
    rows = [(i, s) for i, s in enumerate(english)] + [
        (100 + i, s) for i, s in enumerate(gibberish)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.avg_char_prob for r in text.char_lm_familiarity(df).collect()}
    eng_avg = sum(out[i] for i in range(len(english))) / len(english)
    gib_avg = sum(out[100 + i] for i in range(len(gibberish))) / len(gibberish)
    assert eng_avg > gib_avg * 1.5, (eng_avg, gib_avg)


def test_char_lm_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None), (4, "abcabc")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.char_lm_familiarity(df).collect()}
    assert out[1].n_grams == 0 and out[1].avg_char_prob == 0.0
    assert out[2].n_grams == 0
    assert out[3].n_grams == 0
    assert out[4].n_grams == 4 and out[4].avg_char_prob > 0


def test_temperature_weights_limits_and_composition(spark):
    """T=1 -> natural proportions; large T -> near-uniform; T<1 sharpens;
    composes with mixture_sample as explicit weights."""
    sizes = {"web": 8000.0, "code": 1000.0, "ref": 1000.0}
    import pytest as _pytest

    w1 = text.temperature_weights(sizes, 1.0)
    assert abs(w1["web"] - 0.8) < 1e-9

    w_inf = text.temperature_weights(sizes, 100.0)
    assert abs(w_inf["web"] - 1 / 3) < 0.02  # near-uniform

    w_sharp = text.temperature_weights(sizes, 0.5)
    assert w_sharp["web"] > 0.9  # sharpened toward the big source

    with _pytest.raises(ValueError, match="temperature"):
        text.temperature_weights(sizes, 0.0)
    # zero-size sources drop instead of polluting the normalization
    assert "empty" not in text.temperature_weights({**sizes, "empty": 0.0}, 1.0)

    rows = (
        [(i, "web", "tok " * 50) for i in range(40)]
        + [(100 + i, "code", "tok " * 50) for i in range(5)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    totals = text.source_token_totals(docs)
    assert totals == {"web": 2000, "code": 250}
    out = text.mixture_sample(
        docs, budget_tokens=1000, weights=text.temperature_weights(totals, 2.0)
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r.source, []).append(r)
    # web is over its tempered share -> downsampled; code under -> whole
    assert all(r.keep_thresh < 65536 for r in by["web"])
    assert all(r.keep_thresh == 65536 for r in by["code"])
    assert len(by["code"]) == 5


def test_pack_bins_invariants_and_determinism(spark):
    rows = [(i, "tok " * (10 + (i * 37) % 120)) for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = text.pack_bins(docs, seq_len=256, num_buckets=4).collect()
    # every doc assigned exactly once
    assert sorted(r.doc_id for r in packed) == list(range(200))
    # no bin overfills; bin ids stay inside their bucket namespace
    fills = {}
    for r in packed:
        fills.setdefault(r.bin_id, 0)
        fills[r.bin_id] += r.n_tokens
        assert r.bin_id >> 32 == r.bucket
    assert all(f <= 256 for f in fills.values())
    # any-fit guarantee: all bins but (at most) one per bucket > half full
    by_bucket = {}
    for b, f in fills.items():
        by_bucket.setdefault(b >> 32, []).append(f)
    for fl in by_bucket.values():
        assert sum(1 for f in fl if f <= 128) <= 1
    # deterministic under different input partitioning
    again = text.pack_bins(
        docs.repartition(13), seq_len=256, num_buckets=4
    ).collect()
    assert sorted((r.doc_id, r.bin_id) for r in again) == sorted(
        (r.doc_id, r.bin_id) for r in packed
    )


def test_pack_bins_oversized_doc_gets_own_bin(spark):
    docs = spark.createDataFrame(
        [(1, "tok " * 500), (2, "tok " * 10), (3, "tok " * 10)],
        ["doc_id", "text"],
    )
    packed = {r.doc_id: r for r in text.pack_bins(docs, seq_len=64, num_buckets=1).collect()}
    others = {packed[2].bin_id, packed[3].bin_id}
    assert packed[1].bin_id not in others


def test_pack_bins_beats_sequential_packing_on_waste(spark):
    """FFD's reason to exist: fewer bins than stream-order packing on a
    skewed size mix (long docs interleaved with short ones)."""
    rows = []
    for i in range(120):
        n = 200 if i % 3 == 0 else 30
        rows.append((i, "tok " * n))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    seq_len = 256
    packed = text.pack_bins(docs, seq_len=seq_len, num_buckets=1).collect()
    ffd_bins = len({r.bin_id for r in packed})
    # sequential (stream-order) packing baseline, same doc order
    fill, seq_bins = 0, 1
    for i in range(120):
        n = 200 if i % 3 == 0 else 30
        if fill + n > seq_len:
            seq_bins += 1
            fill = n
        else:
            fill += n
    assert ffd_bins < seq_bins, (ffd_bins, seq_bins)
    total = sum(r.n_tokens for r in packed)
    assert ffd_bins >= -(-total // seq_len)  # >= volume lower bound


def test_tfidf_cosine_topk_bounds_and_duplicates(spark):
    """Sparse cosine invariants: scores bounded by 1 (up to fixed-point
    rounding), exact duplicate docs score ~1.0 as each other's top
    neighbor, and the relation is symmetric (a lists b iff the reverse
    pair shares the same cosine)."""
    from lab_etl_batch_data_processing_pipeline__spark.operators import text as t

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry apple"),
            (2, "apple banana cherry apple"),    # exact dup of 1
            (3, "apple banana dates"),
            (4, "elephant giraffe hippo"),       # shares no retained token
            (5, "elephant giraffe zebra"),
        ],
        "doc_id long, text string",
    )
    rows = t.tfidf_cosine_topk(docs, k=4, max_df_frac=1.0).collect()
    by_pair = {(r.doc_id, r.neighbor_id): r.cosine_sim for r in rows}
    for v in by_pair.values():
        assert 0.0 <= v <= 1.000001
    assert by_pair[(1, 2)] > 0.999999 and by_pair[(2, 1)] > 0.999999
    # symmetry of the score (rank may differ)
    for (a, b), v in by_pair.items():
        assert abs(by_pair[(b, a)] - v) < 1e-9
    # docs sharing no retained token never pair
    assert not any(
        (a in (4, 5)) != (b in (4, 5)) for (a, b) in by_pair
    )
