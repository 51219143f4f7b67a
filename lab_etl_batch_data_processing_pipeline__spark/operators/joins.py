"""Join operators (SURVEY.md §2.3): the curated denormalization chain.

The reference's curated layer is a left-deep chain of left equi-joins
(J2 bookings⟕apartments, J3 ⟕apartment_attributes, J4 ⟕exchange_rates;
curated_tranformation.py:193-202). Outer-join order is semantic — Catalyst
does not reorder it — so the chain is kept left-deep as written.

Scale notes baked in:
- bounded dimensions are broadcast (no shuffle of the fact side);
- fact⟕fact joins are left to sort-merge + AQE (which switches to
  broadcast/skew-split at runtime when sizes allow);
- join keys are equi-keys on int/bigint columns, the cheapest shuffle keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def left_join_chain(
    base: DataFrame,
    *joins: tuple[DataFrame, Column | Sequence[str] | str, bool],
) -> DataFrame:
    """Fold ``(right, on, broadcast)`` triples into a left-deep chain of
    left equi-joins. ``on`` may be a Column condition or using-column name(s)."""
    out = base
    for right, on, use_broadcast in joins:
        right_side = F.broadcast(right) if use_broadcast else right
        out = out.join(right_side, on=on, how="left")
    return out


def curated_apartment_bookings(
    bookings: DataFrame,
    apartments: DataFrame,
    attributes: DataFrame,
    rates: DataFrame,
    broadcast_listings: bool = True,
) -> DataFrame:
    """The reference's curated join table, 16-column shape
    (curated_tranformation.py:193-221; curate_db.sql:9-27).

    Inputs are the *cleaned* tables (dates already DateType, rows deduped).
    rates is bounded by construction (currency cardinality) — always
    hard-hinted. apartments/attributes are listing-CATALOG-sized: pass
    ``broadcast_listings=False`` when the catalog scales past broadcast
    range — F.broadcast is obeyed regardless of size, so the hard hint
    would OOM where AQE would have degraded gracefully to sort-merge (or
    still broadcast at runtime if the catalog fits).
    """
    b = bookings.alias("b")
    hint = F.broadcast if broadcast_listings else (lambda df: df)
    a = hint(apartments.alias("a"))
    attr = hint(attributes.alias("attr"))
    # Rename the rates key so the join condition is alias-unambiguous (the
    # reference's dotted-string drop of join byproducts silently no-ops,
    # curate_data_etl_job.py:180 — proper Column references avoid that bug).
    r = rates.withColumnRenamed("currency", "__rate_ccy")

    joined = (
        b.join(a, F.col("b.apartment_id") == F.col("a.id"), "left")
        .join(attr, F.col("a.id") == F.col("attr.id"), "left")
        .join(F.broadcast(r), F.col("b.currency") == F.col("__rate_ccy"), "left")
    )

    return joined.select(
        F.col("b.booking_id").alias("booking_id"),
        F.col("b.apartment_id").alias("apartment_id"),
        F.col("b.user_id").alias("user_id"),
        F.col("attr.category").alias("category"),
        F.col("attr.body").alias("body"),
        F.col("attr.cityname").alias("cityname"),
        F.col("attr.state").alias("state"),
        F.col("a.title").alias("title"),
        F.col("a.source").alias("source"),
        F.col("a.listing_created_on").alias("listing_created_on"),
        F.col("a.is_active").alias("is_active"),
        F.col("b.booking_date").alias("booking_date"),
        F.col("b.checkin_date").alias("checkin_date"),
        F.col("b.checkout_date").alias("checkout_date"),
        F.col("b.booking_status").alias("booking_status"),
        (F.col("b.total_price").cast("double") * F.col("usd_rate")).alias("total_price_usd"),
    )


def bloom_filter_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> list[int]:
    """Build a Bloom filter over ``keys[key_col]`` as a dense list of
    m_bits/64 little-endian words — the build side of
    :func:`bloom_semi_filter`.

    Hash family: position_j = pmod(xxhash64(key, j), m_bits) for
    j in 0..k-1 — deterministic, engine-native, no Python in the scan.
    The distributed part is one explode + bit-OR aggregate keyed by word
    index; only the AGGREGATED words are collected, so the driver
    traffic is bounded by the filter SIZE (m_bits/64 rows, 16 K longs =
    128 KiB at the default m), never by the key count — the same
    bounded-collect contract as the ANN codebooks
    (similarity.py), with the word map the "model" being learned.

    Sizing: false-positive rate ~ (1 - e^(-k*n/m))^k; the default
    (m=2^20, k=5) gives < 1% up to ~100 K keys. At 100 TB the build
    side is usually a filtered dimension (still << m); for billions of
    keys raise m_bits — the collect stays m-bounded.
    """
    n_words = m_bits // 64
    positions = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda j: F.pmod(F.xxhash64(F.col(key_col), j), F.lit(m_bits)),
        )
    ).alias("pos")
    words = (
        keys.select(positions)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.pmod(F.col("pos"), F.lit(64)).cast("int").alias("b"),
        )
        # shiftleft by a COLUMN needs the SQL form (the PySpark function
        # only takes a literal shift amount)
        .selectExpr("w", "shiftleft(1L, b) AS bit")
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    dense = [0] * n_words
    for r in words:
        dense[r.w] = r.bits
    return dense


def bloom_semi_filter(
    fact: DataFrame,
    key_col: str,
    bloom_words: list[int],
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Pre-join semi-filter: keep fact rows whose key *may* be in the
    Bloom filter built by :func:`bloom_filter_build` (no false
    negatives; false positives at the filter's design rate).

    The classic 100 TB join reduction: ship a 128 KiB bitmap instead of
    shuffling the fact table against the dimension — rows that cannot
    match never enter the join exchange. Membership is pure JVM
    expression work: the bitmap rides into the plan as one literal
    array column on a broadcast one-row frame (never per-row Python),
    and the k probes are bit tests off that attribute.

    Compose with the exact join afterwards: bloom prune -> equi-join
    gives identical results to the plain join, minus the shuffled
    volume. (Spark's AQE runtime bloom under
    spark.sql.optimizer.runtime.bloomFilter.enabled makes the same
    move automatically for selective joins; this operator is the
    explicit, cross-stage, reusable-artifact form.)
    """
    spark = fact.sparkSession
    bitmap = spark.createDataFrame([(bloom_words,)], "___bloom: array<long>")
    probed = fact.crossJoin(F.broadcast(bitmap))
    pos_cols = []
    for j in range(k):
        pos_cols.append(f"__bloom_pos{j}")
        probed = probed.withColumn(
            pos_cols[-1],
            F.pmod(F.xxhash64(F.col(key_col), F.lit(j)), F.lit(m_bits)),
        )
    # shiftright by a COLUMN needs the SQL form (the PySpark function
    # only takes a literal shift amount)
    cond = " AND ".join(
        f"((shiftright(element_at(___bloom, cast({p} / 64 AS int) + 1),"
        f" cast({p} % 64 AS int)) & 1) = 1)"
        for p in pos_cols
    )
    return probed.filter(F.expr(cond)).drop("___bloom", *pos_cols)


def bloom_prune_gate(
    fact: DataFrame,
    dim_keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    fpr_bound: float = 0.01,
) -> DataFrame:
    """One-row invariant gate for the bloom prune: (n_fact, n_exact,
    no_false_negatives, fpr_ok). ``dim_keys`` must be a one-column frame
    named ``key_col``. The exact side is computed with a plain semi-join;
    the bloom side must be a superset of it (no false negatives) with
    false-positive volume <= fpr_bound * non-matching rows."""
    words = bloom_filter_build(dim_keys, key_col, m_bits, k)
    bloomed = bloom_semi_filter(fact, key_col, words, m_bits, k)
    exact = fact.join(dim_keys.distinct(), key_col, "left_semi")
    counts = (
        fact.agg(F.count(F.lit(1)).alias("n_fact"))
        .crossJoin(exact.agg(F.count(F.lit(1)).alias("n_exact")))
        .crossJoin(bloomed.agg(F.count(F.lit(1)).alias("n_bloom")))
        .crossJoin(
            bloom_semi_filter(exact, key_col, words, m_bits, k).agg(
                F.count(F.lit(1)).alias("n_exact_through_bloom")
            )
        )
    )
    return counts.select(
        "n_fact",
        "n_exact",
        (F.col("n_exact_through_bloom") == F.col("n_exact")).alias(
            "no_false_negatives"
        ),
        (
            (F.col("n_bloom") - F.col("n_exact"))
            <= F.lit(fpr_bound) * (F.col("n_fact") - F.col("n_exact"))
        ).alias("fpr_ok"),
    )


def basket_pairs(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Market-basket co-occurrence pairs: (item_a, item_b, n_baskets)
    for every unordered item pair appearing together in >= min_support
    baskets — the first stage of association-rule mining
    (FP-growth's frequent-2-itemset layer), the recommender query the
    reference's flat metrics can't ask
    (spark-job/apps/presentation_tranformation.py has no self-join).

    Scale shape: the self-join runs WITHIN baskets only (equi-join on
    the basket key + ``a.item < b.item``), so the blow-up is
    sum-over-baskets C(n_b, 2) — bounded by the basket-size cap real
    transactional data has (TPC-H orders: <= 7 lines), NEVER corpus
    x corpus. One distinct-projection shuffle on the basket key, the
    per-basket pair explode, then a map-side-combinable count on the
    pair key; min_support prunes before any sort. Hot items do not
    skew the JOIN (it keys on baskets, not items); the pair-count
    aggregate is AQE's problem only if one PAIR dominates, which
    min_support-level counts handle.

    Items are deduplicated per basket first (quantity/relisting rows
    count once), matching the set semantics of support counts.
    """
    d = items.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__b") == F.col("b.__b"))
            & (F.col("a.__i") < F.col("b.__i")),
        )
        .groupBy(
            F.col("a.__i").alias("item_a"), F.col("b.__i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_support)
    )


def basket_triples(
    lines: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Frequent 3-itemsets with minimum support: item triples bought
    together in >= min_support baskets — the next association-mining
    layer above basket_pairs (bundles of three, the input to
    3-antecedent rules).

    Enumeration is strictly WITHIN baskets: distinct items per basket,
    then a<b<c via two self-equi-joins on the basket key, so the
    candidate space is Σ C(basket_size, 3) — bounded by the per-basket
    line cap cubed over 6, never corpus-sized; support counts map-side
    combine. An a-priori pre-prune (only pairs with pair-support >=
    min_support can extend) would shrink the intermediate further at
    scale; the direct form keeps the plan two joins deep and is the
    correctness oracle either way.

    Returns (item_a, item_b, item_c, n_baskets) with item_a < item_b <
    item_c, sorted by (n_baskets DESC, item_a, item_b, item_c).
    """
    d = lines.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    a, b, c = d.alias("a"), d.alias("bb"), d.alias("cc")
    triples = (
        a.join(b, (F.col("a.b") == F.col("bb.b")) & (F.col("a.i") < F.col("bb.i")))
        .join(c, (F.col("a.b") == F.col("cc.b")) & (F.col("bb.i") < F.col("cc.i")))
        .select(
            F.col("a.i").alias("item_a"),
            F.col("bb.i").alias("item_b"),
            F.col("cc.i").alias("item_c"),
        )
        .groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_support)
    )
    return triples.orderBy(
        F.col("n_baskets").desc(), "item_a", "item_b", "item_c"
    )


def skyline2d(
    df: DataFrame,
    max_col: str,
    min_col: str,
) -> DataFrame:
    """2-D skyline (Pareto front): the rows no other row dominates,
    where ``a`` dominates ``b`` iff ``a.max_col >= b.max_col`` and
    ``a.min_col <= b.min_col`` with at least one strict — "biggest
    size for the lowest price", the multi-objective shortlist query.

    Exact, and never the naive O(n²) self-join. Frontier reduction:

    1. ONE hash aggregate collapses the data to the per-``max_col``
       best (MIN of ``min_col``) — candidates, one row per distinct
       ``max_col`` value (any row beaten at its own ``max_col`` level
       is dominated by definition).
    2. A running-min sweep over the candidates ORDER BY ``max_col``
       DESC with a ROWS frame ending 1 PRECEDING (candidates hold
       DISTINCT ``max_col`` values, so the frame is exactly the
       strictly-larger ones) marks each candidate dominated iff some
       STRICTLY larger ``max_col`` achieved a ``min_col``
       at-or-below it. This window is deliberately
       unpartitioned — it runs over the candidate frame, which is
       ``|distinct max_col|``-sized (dimension-sized: ~50 sizes here,
       never raw-row scale), the same bound any skyline keeps.
    3. A broadcast semi-join on (max_col, min_col) pulls the full rows
       sitting ON the surviving frontier — ties (several rows sharing a
       frontier point) all belong to the skyline, mutually undominated.

    NULL in either dimension excludes the row (dominance is undefined
    on NULL). At 100 TB the cost is step 1's single shuffle; steps 2-3
    ride a frame bounded by the dimension's cardinality. A continuous
    ``max_col`` (every value distinct) degrades the candidate frame to
    data-sized — bucket it first (the caller owns the granularity).

    Returns the skyline rows of ``df`` (all original columns).
    """
    mx, mn = F.col(max_col), F.col(min_col)
    clean = df.filter(mx.isNotNull() & mn.isNotNull())
    cand = clean.groupBy(max_col).agg(F.min(min_col).alias("__best"))
    # candidates carry DISTINCT max_col values (the groupBy key), so a
    # ROWS frame ending 1 before the current row sees exactly the
    # strictly-larger values — no RANGE offset, so any orderable type
    # works, not just unit-spaced integers:
    w = (
        Window.orderBy(F.col(max_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        cand.withColumn("__above", F.min("__best").over(w))
        .filter(F.col("__above").isNull() | (F.col("__above") > F.col("__best")))
        .select(max_col, F.col("__best").alias(min_col))
    )
    return clean.join(
        F.broadcast(frontier), [max_col, min_col], "left_semi"
    )
