"""Data-profiling helpers that feed partitioning decisions — the
pre-flight numbers SCALE.md's skew strategies (salting, AQE skew join)
act on."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from .graph import _ckpt
from pyspark.sql import functions as F


def key_skew(
    df: DataFrame, cols: list[str], top_k: int = 20, round_to: int = 6
) -> DataFrame:
    """Heavy-hitter skew profile over ``cols``: the ``top_k`` heaviest
    keys as (key..., n_rows, share, rank, cum_share), heaviest first.
    rank 1's share IS the skew headline — a join/agg on this key set
    puts that fraction of all rows in one task without salting.

    Scale shape: the per-key count is the only edge-scale shuffle; the
    grand total comes back as a broadcast single-row aggregate (no
    second pass, no global window over ALL distinct keys — a
    high-cardinality key column would funnel its whole key set through
    one task otherwise); the ranking window runs after a distributed
    top-k limit, so it sees ``top_k`` rows at any input size.
    """
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    top = (
        counts.orderBy(F.desc("n_rows"), *cols)
        .limit(top_k)
        .crossJoin(F.broadcast(total))
    )
    w_rank = Window.partitionBy().orderBy(F.desc("n_rows"), *cols)
    return (
        top.select(
            *cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), round_to).alias("share"),
            F.row_number().over(w_rank).cast("int").alias("rank"),
            F.round(F.sum("n_rows").over(w_rank) / F.col("__total"), round_to).alias(
                "cum_share"
            ),
        )
        .orderBy("rank")
    )


def histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Equi-width histogram of a numeric column: (bin, lo, hi, n_rows).

    Two jobs by necessity: a dimension-sized min/max aggregate fixes the
    bin width, then one hash aggregate on the bin index counts rows —
    the profiling primitive behind any numeric-distribution dashboard.
    The top edge closes into the last bin (floor((max-min)/w) == n_bins
    collapses to n_bins-1) so every non-NULL row lands in exactly one
    bin; NULLs are excluded (profile them with profile_columns). Empty
    bins are emitted with n_rows=0 via a bin-index grid join, so the
    histogram shape is stable for plotting. Degenerate case min==max:
    one bin holding everything.
    """
    bounds = df.agg(
        F.min(F.col(value_col).cast("double")).alias("lo"),
        F.max(F.col(value_col).cast("double")).alias("hi"),
    ).first()
    if bounds["lo"] is None:
        raise ValueError(f"histogram: no non-NULL values in {value_col}")
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    if hi == lo:
        return df.agg(
            F.count(F.when(F.col(value_col).isNotNull(), 1)).alias("n_rows")
        ).select(
            F.lit(0).alias("bin"),
            F.lit(lo).alias("lo"),
            F.lit(hi).alias("hi"),
            F.col("n_rows").cast("long"),
        )
    width = (hi - lo) / n_bins
    idx = F.least(
        F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width)),
        F.lit(n_bins - 1),
    ).cast("int")
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    spark = df.sparkSession
    grid = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    return (
        grid.join(counts, "bin", "left")
        .na.fill(0, ["n_rows"])
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("hi"),
            F.col("n_rows").cast("long").alias("n_rows"),
        )
        .orderBy("bin")
    )


def numeric_correlations(df, cols):
    """Pairwise Pearson correlation profile over numeric columns:
    (col_a, col_b, pearson_r) for every i<j pair — the feature-redundancy
    screen a training pipeline runs before fitting anything.

    ONE aggregate pass computes all C(k,2) coefficients (F.corr partials
    merge map-side); the output is dimension-sized (pairs of column
    NAMES), never row-scale. At 100 TB this is a single full scan, so
    screen a column subset or a TABLESAMPLE, not every wide column.
    Float caveat: corr merges double partials, so the last ulp depends
    on partition merge order — this is a profiling signal, not an
    oracle-checkable value (rounded to 6dp to tame the noise)."""
    from pyspark.sql import functions as F

    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    if not pairs:
        raise ValueError("numeric_correlations: need at least two columns")
    row = df.agg(
        *[F.corr(a, b).alias(f"__c{i}") for i, (a, b) in enumerate(pairs)]
    )
    spark = df.sparkSession
    names = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "pair_id int, col_a string, col_b string",
    )
    exploded = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("pair_id"),
                        F.round(F.col(f"__c{i}"), 6).alias("pearson_r"),
                    )
                    for i in range(len(pairs))
                ]
            )
        ).alias("p")
    ).select("p.pair_id", "p.pearson_r")
    return (
        exploded.join(F.broadcast(names), "pair_id")
        .select("col_a", "col_b", "pearson_r")
        .orderBy("col_a", "col_b")
    )


def mad_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    scale: int = 1024,
    k: int = 3,
) -> DataFrame:
    """Median-absolute-deviation outlier gate per key, in EXACT integer
    arithmetic: robust anomaly counts that hash-match any engine — the
    data-quality screen a corpus intake runs per source/type (mean±stddev
    gates break on the very outliers they hunt; median/MAD do not).

    Median here is the LOWER median (the ((n+1) div 2)-th smallest) —
    selection by position on the sorted multiset, no interpolation, so
    the statistic is a value that actually occurs and is identical on
    any engine regardless of tie order. Values fix-point to
    ``round(value * scale)`` BIGINTs first (scale a power of two: exact
    multiply; HALF_UP == half-away for the non-negative inputs this
    expects); deviations are |v_s - med_s|; a row is an outlier when
    dev_s > k * mad_s (integer compare — no float anywhere).

    Shape (r13): ONE scan, ONE shuffle. Every pass — value ranking,
    median pick, deviation ranking, MAD pick, final aggregate — shares
    the key hash partitioning, so after the first exchange the whole
    operator is in-partition sorts and window passes; the median/MAD
    picks are min-over-WHEN window aggregates at the selection
    position instead of the pre-r13 filter + join-backs (which
    re-scanned the input and re-shuffled three times for the same
    values). The per-key serial bound is the largest single key's row
    count, the usual window skew story. At scale, replace the exact
    selection with approx_percentile partials and keep THIS form as
    the correctness oracle.

    Returns (key, n_rows, med_s, mad_s, n_outliers) — one row per key.
    """
    v = df.select(
        F.col(key_col).alias("key"),
        F.round(F.col(value_col) * scale).cast("long").alias("v_s"),
    ).filter(F.col("v_s").isNotNull())
    w_rank = Window.partitionBy("key").orderBy("v_s")
    w_all = Window.partitionBy("key")
    # median by position, picked in-frame: the (n+1) div 2 row's value
    # broadcast to every row of the key via an unbounded window MIN
    # (the WHEN hits exactly one position; ties at the cut value are
    # interchangeable, so tie order in row_number cannot move it)
    med = v.select(
        "key",
        "v_s",
        F.row_number().over(w_rank).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    ).withColumn(
        "med_s",
        F.min(
            F.when(F.col("__rn") == F.expr("(__n + 1) div 2"), F.col("v_s"))
        ).over(w_all),
    )
    dev = med.select(
        "key",
        F.abs(F.col("v_s") - F.col("med_s")).alias("dev_s"),
        "med_s",
        "__n",
    )
    w_drank = Window.partitionBy("key").orderBy("dev_s")
    marked = dev.withColumn(
        "__rn2", F.row_number().over(w_drank)
    ).withColumn(
        "mad_s",
        F.min(
            F.when(F.col("__rn2") == F.expr("(__n + 1) div 2"), F.col("dev_s"))
        ).over(w_all),
    )
    return (
        marked.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("med_s").alias("med_s"),
            F.max("mad_s").alias("mad_s"),
            F.sum(
                (F.col("dev_s") > F.lit(k) * F.col("mad_s")).cast("long")
            ).alias("n_outliers"),
        )
        .orderBy("key")
    )


def categorical_diversity(
    df: DataFrame,
    key_col: str,
    cat_col: str,
) -> DataFrame:
    """Per-key Gini–Simpson diversity of a categorical column: the
    probability two random events of the key differ in category —
    1 - Σ(cᵢ/n)², the log-free diversity index (Shannon entropy needs
    ln(), whose libm bits differ across engines; this is exact
    rational arithmetic: (n² - Σcᵢ²) / n²).

    ``gini_ppm`` = floor(1e6 · (n² - Σcᵢ²) / n²) — counts are BIGINT,
    the squares and the 10⁶ product are carried in DECIMAL(38,0)
    (n² · 10⁶ exceeds BIGINT past ~4.3M rows per key; Spark decimal ==
    DuckDB HUGEINT arithmetic, the concentration_hhi rule), operands
    non-negative, one truncating division; 0 for single-category keys,
    → 1e6·(k-1)/k for k uniform categories.

    Shape: two chained hash aggregates ((key, cat) counts, then per-key
    roll-up — the second reuses the first's partitioning prefix), both
    with map-side partials; output is key-sized.

    Returns (key, n_rows, n_categories, gini_ppm) sorted by key.
    """
    counts = (
        df.select(F.col(key_col).alias("key"), F.col(cat_col).alias("cat"))
        .groupBy("key", "cat")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy("key")
        .agg(
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_categories"),
            F.sum(
                F.col("c").cast("decimal(38,0)") * F.col("c")
            ).alias("__sumsq"),
        )
        .select(
            "key",
            "n_rows",
            "n_categories",
            F.expr(
                "CAST((1000000 * (CAST(n_rows AS DECIMAL(38,0)) * n_rows"
                " - __sumsq))"
                " div (CAST(n_rows AS DECIMAL(38,0)) * n_rows) AS BIGINT)"
            ).alias("gini_ppm"),
        )
        .orderBy("key")
    )


# floor-free Benford expectations, ppm of log10(1 + 1/d) rounded to the
# nearest ppm — CONSTANTS by definition (they sum to exactly 1e6), so no
# engine ever computes a log
_BENFORD_PPM = {
    1: 301_030, 2: 176_091, 3: 124_939, 4: 96_910, 5: 79_181,
    6: 66_947, 7: 57_992, 8: 51_153, 9: 45_757,
}


def benford_gate(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Benford's-law screen over a positive numeric column: observed
    first-significant-digit frequencies vs the log-distribution —
    the classic fabricated-data / unit-mixup smell test for financial
    and measurement columns.

    Exact: values round to DECIMAL(18,2) cents (exact BIGINTs), and
    the first digit is a pure INTEGER peel — one chained CASE over
    descending powers of ten (leading digit of n is n div 10^k for the
    largest 10^k <= n). No log10 float (libm boundary behavior at
    exact powers of ten differs per engine) and no per-row decimal
    string formatting (measured ~10x slower than the integer compare
    chain). Observed shares are truncating BIGINT ppm; expected shares
    are hard ppm constants (they ARE the definition here — no engine
    computes a log). Values < 1 (cents < 100) or NULL are excluded:
    their first significant digit needs the fractional expansion, and
    the operator targets money/measure columns where < 1 means a
    different regime anyway.

    One map-side projection + one 9-row hash aggregate; a second
    broadcast-sized pass attaches totals. Output is always 9 rows
    (digits with no observations report 0).

    Returns (digit, n_obs, obs_ppm, exp_ppm, dev_ppm) sorted by digit.
    """
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    digit_case = "CASE " + " ".join(
        f"WHEN __cents >= {10 ** k} THEN CAST(__cents div {10 ** k} AS INT)"
        for k in range(17, 1, -1)
    ) + " END"
    counts = (
        df.select(cents.alias("__cents"))
        .filter(F.col("__cents") >= 100)
        .select(F.expr(digit_case).alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    # Densify to the fixed 1-9 digit domain by UNION + re-aggregate, NOT
    # by left-joining a 9-row digit frame onto the aggregate: a LeftOuter
    # join puts an isnotnull(join key) constraint on the aggregate side,
    # and pushing it below the aggregate inlines the full digit CASE —
    # with the decimal cents expression re-evaluated per WHEN branch —
    # into a pre-scan Filter (measured 6x on the data-sized stage at
    # sf0.1: 0.56 s -> 3.2 s). The union's zero rows are dimension-sized
    # and the re-aggregate sees <= 18 rows; expected shares attach as a
    # literal map lookup, so no join exists to infer constraints from.
    zeros = df.sparkSession.createDataFrame(
        [(d, 0) for d in _BENFORD_PPM], "digit long, n_obs long"
    )
    exp_map = F.create_map(
        *[F.lit(x) for d, e in _BENFORD_PPM.items() for x in (d, e)]
    )
    full = (
        counts.select(F.col("digit").cast("long").alias("digit"), "n_obs")
        .unionByName(zeros)
        .groupBy("digit")
        .agg(F.sum("n_obs").alias("n_obs"))
        .withColumn("exp_ppm", exp_map[F.col("digit")])
    )
    return (
        full.withColumn(
            "__total", F.sum("n_obs").over(Window.partitionBy())
        )
        .select(
            "digit",
            "n_obs",
            F.when(
                F.col("__total") > 0,
                F.expr("(1000000 * n_obs) div __total"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("obs_ppm"),
            F.col("exp_ppm").cast("long").alias("exp_ppm"),
        )
        .withColumn("dev_ppm", F.abs(F.col("obs_ppm") - F.col("exp_ppm")))
        .orderBy("digit")
    )


def weighted_median(
    df: DataFrame,
    key_col: str,
    value_col: str,
    weight_col: str,
    scale: int = 1,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key WEIGHTED lower median: the smallest value whose running
    weight reaches half the key's total — "the price at which half the
    QUANTITY sold sits at or below", the volume-aware center plain
    median misreports whenever weights vary.

    Exact: values fix-point to ``round(value * scale)`` BIGINTs (scale
    a power of two, or 1 for already-integral values), weights must be
    non-negative integers (integral weights are what make the running
    sum and the half-point comparison exact — fractional weights would
    reintroduce float drift); the median is selection by position on
    the weight-cumulated order (2·cum_w >= total_w — no interpolation,
    no division), ties in value broken by ``tiebreak_col`` then value
    order, which cannot change the RESULT (equal values are
    interchangeable at the cut) but keeps the plan deterministic.

    Shape: ONE shuffle on key, total. The cumulative-sum and per-key
    total windows share the key partitioning, and the selection is a
    conditional aggregate over the window output — rows satisfying the
    half-point test form a SUFFIX of the cum order, so MIN(v) over
    them IS the cut row — which Catalyst runs WITHOUT a second
    exchange (the aggregate's required distribution is the window's
    output partitioning; pre-r13 a filter + row_number + left join
    back to a separate per-key total aggregate shuffled the slim
    projection twice and scanned it twice for the same values).
    Zero-total keys (all weights 0) emit NULL.

    Returns (key, total_weight, wmedian_s) sorted by key.
    """
    order = [F.col("__v").asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    base = df.select(
        F.col(key_col).alias("key"),
        F.round(F.col(value_col) * scale).cast("long").alias("__v"),
        F.col(weight_col).cast("long").alias("__w"),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
    ).filter(F.col("__v").isNotNull() & (F.col("__w") >= 0))
    w_cum = (
        Window.partitionBy("key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("key")
    marked = base.select(
        "key",
        "__v",
        F.sum("__w").over(w_cum).alias("__cum"),
        F.sum("__w").over(w_all).alias("__total"),
    )
    return (
        marked.groupBy("key")
        .agg(
            # __total is constant within the key; MAX is just a picker
            F.coalesce(F.max("__total"), F.lit(0).cast("long")).alias(
                "total_weight"
            ),
            F.min(
                F.when(
                    (F.col("__total") > 0)
                    & (F.col("__cum") * 2 >= F.col("__total")),
                    F.col("__v"),
                )
            ).alias("wmedian_s"),
        )
        .orderBy("key")
    )


def fd_report(
    df: DataFrame,
    candidates: list[tuple[list[str], str]],
) -> DataFrame:
    """Functional-dependency profiler: for each candidate FD
    ``lhs -> rhs``, count how badly the data violates it — the schema-
    discovery primitive behind key detection, normalization checks, and
    "is this column derivable?" questions a 100 TB intake asks before
    trusting a join key.

    Per candidate: ``n_groups`` distinct LHS combinations,
    ``n_violating_groups`` whose rows carry >1 distinct RHS value, and
    ``n_violating_rows`` (total rows inside violating groups) — the
    g3-style error mass. Exact counts, no sampling. NULL LHS values
    group as values (both engines' GROUP BY); NULL RHS values are
    ignored by the distinct count (both engines' COUNT DISTINCT), so an
    all-NULL RHS group counts 0 distinct and never violates — document
    per-candidate if NULL-as-value semantics are needed (wrap the RHS
    in coalesce upstream).

    Shape: one hash aggregate per candidate on its LHS key (partial
    map-side combine applies), then a metrics-sized union — candidates
    are independent, so Spark schedules the aggregates concurrently.
    Nothing here is pair-wise: cost is |candidates| scans, each one
    shuffle.

    Returns (fd, n_groups, n_violating_groups, n_violating_rows,
    holds) sorted by fd.
    """
    if not candidates:
        raise ValueError("fd_report needs at least one (lhs, rhs) candidate")
    out = None
    for lhs, rhs in candidates:
        label = ",".join(lhs) + "->" + rhs
        g = (
            df.groupBy(*[F.col(c) for c in lhs])
            .agg(
                F.countDistinct(F.col(rhs)).alias("__d"),
                F.count(F.lit(1)).alias("__rows"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_groups"),
                F.sum(F.when(F.col("__d") > 1, 1).otherwise(0)).alias(
                    "n_violating_groups"
                ),
                F.sum(
                    F.when(F.col("__d") > 1, F.col("__rows")).otherwise(0)
                ).alias("n_violating_rows"),
            )
            .select(
                F.lit(label).alias("fd"),
                "n_groups",
                "n_violating_groups",
                "n_violating_rows",
                (F.col("n_violating_groups") == 0).alias("holds"),
            )
        )
        out = g if out is None else out.unionByName(g)
    return out.orderBy("fd")


def chi_square_gate(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Chi-square independence contributions between two categorical
    columns — the distribution-drift / feature-association gate: a
    large statistic means ``col_a`` and ``col_b`` are NOT independent
    (e.g. event mix shifting by weekday signals a data problem before
    a metrics dashboard does).

    Exact fixed-point: with per-cell observed O, row totals r, column
    totals c and grand total N (all BIGINT counts), each cell
    contributes ``((O*N - r*c)^2 * 1e6) div (r*c*N)`` — the classic
    (O-E)^2/E with E = r*c/N cleared of division until one final
    truncating div per cell. The table is DENSIFIED first (distinct-a ×
    distinct-b, observed counts left-joined in): a cell with O=0 but
    E>0 — an event type that NEVER occurs on some weekday, the
    strongest dependence signal — contributes its full E·1e6 ppm
    instead of silently vanishing from the grouped frame. Per-cell
    truncation IS the metric both engines compute — no float chi2.

    Overflow honesty: |O·N − r·c| can reach ~N²/4 under strong
    association, so ``__diff² · 1e6`` needs ~(4·lg N + 20) bits —
    DECIMAL(38,0)/HUGEINT is safe to N ≈ 2e8 rows, NOT unbounded; past
    that Spark's non-ANSI decimal multiply NULLs (understating the
    statistic) while DuckDB errors. Beyond ~2e8 rows, pre-aggregate to
    a coarser unit (the contingency table is |a|×|b|-sized, so the
    gate itself never needs raw-row scale) or downscale counts by a
    common factor first.

    Shape: ONE hash aggregate builds the contingency table (the only
    data-sized pass); densify + margins are joins/window sums over the
    dimension frames (|a|, |b|, |a|×|b| rows, metrics-sized); output
    groups cells back to one row per ``col_a`` value.

    Returns (a, n_rows, chi2_ppm) sorted by a — chi2_ppm is the sum of
    that value's cell contributions (n_rows counts OBSERVED rows);
    SUM(chi2_ppm) over the frame is the full statistic (compare
    against the chi-square critical value for (|a|-1)(|b|-1) degrees
    of freedom downstream).
    """
    obs = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).alias("o"))
    # localCheckpoint: obs feeds THREE consumers (grid-a, grid-b, the
    # left join) and Catalyst re-plans each as its own column-pruned
    # scan of the fact table — three data-sized passes at 100 TB.
    # Materializing the |a|x|b|-sized cells frame once makes the fact
    # scan single-pass; the checkpoint itself is alphabet-sized.
    obs = _ckpt(obs)
    grid = obs.select("a").distinct().crossJoin(obs.select("b").distinct())
    cells = grid.join(obs, ["a", "b"], "left").select(
        "a", "b", F.coalesce(F.col("o"), F.lit(0)).alias("o")
    )
    w_a = Window.partitionBy("a")
    w_b = Window.partitionBy("b")
    w_all = Window.partitionBy()
    dec = "decimal(38,0)"
    marked = cells.select(
        "a",
        "o",
        F.sum("o").over(w_a).alias("r"),
        F.sum("o").over(w_b).alias("c"),
        F.sum("o").over(w_all).alias("n"),
    ).select(
        "a",
        "o",
        (
            F.col("o").cast(dec) * F.col("n").cast(dec)
            - F.col("r").cast(dec) * F.col("c").cast(dec)
        ).alias("__diff"),
        (
            F.col("r").cast(dec) * F.col("c").cast(dec) * F.col("n").cast(dec)
        ).alias("__den"),
    )
    contrib = marked.select(
        "a",
        "o",
        F.expr(
            "cast((__diff * __diff * 1000000) div __den as bigint)"
        ).alias("__ppm"),
    )
    return (
        contrib.groupBy("a")
        .agg(
            F.sum("o").alias("n_rows"),
            F.sum("__ppm").alias("chi2_ppm"),
        )
        .orderBy("a")
    )


def winsorized_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    p_lo: int = 5,
    p_hi: int = 95,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key winsorized summary: clamp values below the p_lo-th and
    above the p_hi-th percentile to those cut values, then report the
    clamped sum — the outlier-robust total/mean a pricing or latency
    rollup wants when a handful of rows are garbage but dropping rows
    (trimming) would change N.

    Exact: values must already be integers (cents / micros — the
    caller owns the fixed-point, same contract as weighted_median);
    cuts are LOWER empirical quantiles by position, ``x_ceil(n*p/100)``
    with position ``max(1, (n*p + 99) div 100)`` — pure selection, no
    interpolation, no float. The clamped sum is a BIGINT. Tie order
    (``tiebreak_col``) cannot move a cut VALUE (equal values are
    interchangeable at the cut position).

    Shape (r13): ONE scan, ONE shuffle on key. The ranking window, the
    per-key count, the two cut picks (min-over-WHEN window aggregates
    at the cut positions — the weighted_median/mad_outliers idiom),
    and the final clamped-sum aggregate all share the key hash
    partitioning; the pre-r13 form joined a metrics-sized cut frame
    back to a SECOND scan of the input and re-shuffled it for the
    final aggregate. At 100 TB this is exactly as expensive as any
    per-key exact quantile, and the approx path (approx_percentile)
    uses THIS as its oracle.

    Returns (key, n, lo_cut, hi_cut, wins_sum) sorted by key.
    """
    if not (0 <= p_lo < p_hi <= 100):
        raise ValueError(f"need 0 <= p_lo < p_hi <= 100, got {p_lo},{p_hi}")
    order = [F.col("__v").asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("long").alias("__v"),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
    ).filter(F.col("__v").isNotNull())
    w_rank = Window.partitionBy("key").orderBy(*order)
    w_all = Window.partitionBy("key")
    ranked = base.select(
        "key",
        "__v",
        F.row_number().over(w_rank).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    pos_lo = F.greatest(F.lit(1), F.expr(f"(__n * {p_lo} + 99) div 100"))
    pos_hi = F.greatest(F.lit(1), F.expr(f"(__n * {p_hi} + 99) div 100"))
    # no coalesce fallback: pos_hi is always in [1, n], so the hi_cut
    # WHEN-branch matches a real row for every key (when pos_lo ==
    # pos_hi the single cut row fills BOTH columns)
    marked = ranked.select(
        "key",
        "__v",
        F.min(F.when(F.col("__rn") == pos_lo, F.col("__v")))
        .over(w_all)
        .alias("lo_cut"),
        F.min(F.when(F.col("__rn") == pos_hi, F.col("__v")))
        .over(w_all)
        .alias("hi_cut"),
    )
    return (
        marked.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lo_cut").alias("lo_cut"),
            F.min("hi_cut").alias("hi_cut"),
            F.sum(
                F.greatest(
                    F.col("lo_cut"), F.least(F.col("hi_cut"), F.col("__v"))
                )
            ).alias("wins_sum"),
        )
        .orderBy("key")
    )


def equidepth_histogram(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-key equi-DEPTH histogram: k buckets holding (near-)equal row
    counts, each reporting its exact min/max/sum — the selectivity
    profile an optimizer or drift monitor wants when equi-WIDTH buckets
    (``histogram``) collapse under skew.

    Exact and tie-stable: values must already be fixed-point integers;
    bucket assignment is pure rank arithmetic ``((rn-1) * k) div n`` (a
    deterministic near-equal split — NOT NTILE, whose remainder rule
    differs; the oracle mirrors this formula). Rows tied on value are
    interchangeable, so although the rank order within a tie run is
    arbitrary, every per-bucket aggregate (count, min, max, sum) is
    invariant under it — no tiebreak column needed.

    Shape: one shuffle on key; the ranking window and per-key count
    share it; one hash aggregate emits the k rows per key.

    Returns (key, bucket, n_rows, min_v, max_v, sum_v) sorted by
    (key, bucket).
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("long").alias("__v"),
    ).filter(F.col("__v").isNotNull())
    w_rank = Window.partitionBy("key").orderBy(F.col("__v").asc())
    w_all = Window.partitionBy("key")
    ranked = base.select(
        "key",
        "__v",
        F.row_number().over(w_rank).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    return (
        ranked.withColumn(
            "bucket", F.expr(f"((__rn - 1) * {k}) div __n").cast("int")
        )
        .groupBy("key", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__v").alias("min_v"),
            F.max("__v").alias("max_v"),
            F.sum("__v").alias("sum_v"),
        )
        .orderBy("key", "bucket")
    )


def ks_gate(
    df: DataFrame,
    key_col: str,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance per key: the
    largest ECDF gap between ``group_a``'s and ``group_b``'s value
    distributions — THE nonparametric drift gate (did this source's
    price/latency/score distribution change between cohorts?), with no
    binning choices to argue about.

    Exact integer form: values must already be fixed-point; the sup of
    |F_a − F_b| over step ECDFs is attained at a sample point, so the
    gate scans distinct values once and maximizes
    ``d = |cum_a·n_b − cum_b·n_a|`` (the ECDF difference cleared of
    both denominators). ``ks_ppm = (1e6·d) div (n_a·n_b)`` rides
    DECIMAL(38,0)/HUGEINT; d itself is BIGINT-safe while
    ``n_a·n_b < 2^63`` (~3e9 rows per side per key — beyond that,
    pre-aggregate or sample, and document the sample). ``at_value`` is
    the SMALLEST value attaining the max (deterministic argmax). Keys
    missing either group emit nothing (KS is undefined).

    Shape: one hash aggregate to per-(key, value) conditional counts,
    then cumulative/total windows and the argmax ranking over ONE key
    partitioning — per-key serial cost is the key's distinct-value
    count, the standing window-skew story (same bound as
    weighted_median / equidepth_histogram).

    Returns (key, n_a, n_b, d_scaled, ks_ppm, at_value) sorted by key.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("long").alias("__v"),
        F.col(group_col).alias("__g"),
    ).filter(
        F.col("__v").isNotNull()
        # rows outside the two cohorts (third groups, NULL group) must
        # not enter the distinct-value scan: they would add zero-count
        # values that can win the argmax and report an at_value present
        # in NEITHER sample
        & F.col("__g").isin(group_a, group_b)
    )
    counts = base.groupBy("key", "__v").agg(
        F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(F.col("__g") == group_b, 1).otherwise(0)).alias("__cb"),
    )
    w_cum = (
        Window.partitionBy("key")
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("key")
    marked = counts.select(
        "key",
        "__v",
        F.sum("__ca").over(w_cum).alias("__cuma"),
        F.sum("__cb").over(w_cum).alias("__cumb"),
        F.sum("__ca").over(w_all).alias("n_a"),
        F.sum("__cb").over(w_all).alias("n_b"),
    ).filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    scored = marked.withColumn(
        "d_scaled",
        F.abs(
            F.col("__cuma") * F.col("n_b") - F.col("__cumb") * F.col("n_a")
        ),
    ).withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("key").orderBy(
                F.col("d_scaled").desc(), F.col("__v").asc()
            )
        ),
    )
    return (
        scored.filter(F.col("__rn") == 1)
        .select(
            "key",
            "n_a",
            "n_b",
            "d_scaled",
            F.expr(
                "cast((cast(d_scaled as decimal(38,0)) * 1000000)"
                " div (cast(n_a as decimal(38,0)) * n_b) as bigint)"
            ).alias("ks_ppm"),
            F.col("__v").alias("at_value"),
        )
        .orderBy("key")
    )
