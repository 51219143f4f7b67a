"""Synthesized-10x scale probe for the structural claims SCALE.md makes
about the expensive operator families: block_cap sub-blocking,
containment slim postings, substring dedup gram shuffle, semantic-dedup
cell sizing (r9 claims), ANN probe paths + CC (r11 task 5), the
iterative/graph/funnel family — pagerank, triangles, k-means,
corpus_prep (r12) — and the stateful/temporal family — SCD2
compression, CDC merge, point-in-time join, native session windows
(r13, key-strided events synth).

No sf1.0 testdata exists, so this builds one: 10 replicas of the sf0.1
documents/embeddings tables, ids shifted per replica and every TOKEN
namespaced with a replica suffix ("the" -> "the_r3"). Namespacing makes
the replica universes token-disjoint, so the 10x corpus decomposes into
10 independent copies of the sf0.1 problem — the ORGANIC-growth shape
(10x more blocks at the same block-size distribution, including 10
copies of the fixture's ~3k-doc degenerate boilerplate block for the
block_cap path). A probe that instead replicated text verbatim would
multiply the per-doc near-dup density itself — the measured output
would grow ~100x by construction and say nothing about the operators.
The TPC-H side (graph ops) gets the same treatment: 10 key-strided
replicas of the orders/lineitem join columns — 10 disjoint transaction
universes, so the co-transaction and co-purchase graphs grow by nodes
and edges (organic), not by density.

Usage: python tools/scale_probe.py [base_sf_dir] [op_substr ...]
Trailing args filter ops by substring (e.g. `pagerank triangles`);
no filter runs everything. Run with SPARK_GRAFT_DRIVER_MEM=16g: the
probe packs 10x data into ONE local JVM whose heap plays executor for
32 task threads — the 4g session default (sized for sf0.1) heap-OOMs
on the 10x funnel/graph ops. Both scales run in the same JVM either
way, so the measured ratios are heap-size-fair. Prints one JSON line:
{op: {"sf0.1": [s, s], "x10": [s, s], "ratio_steady": r,
"out_rows": [n, n10]}} — two timed runs per scale in one warm JVM;
ratio_steady = x10 run2 / sf0.1 run2.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lab_etl_batch_data_processing_pipeline__spark.session import get_spark
from lab_etl_batch_data_processing_pipeline__spark.operators import (
    clustering,
    dedup_fuzzy,
    graph,
    joins,
    scd,
    similarity,
)
from lab_etl_batch_data_processing_pipeline__spark.plans import corpus as corpus_plans

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPLICAS = 10
ID_STRIDE = 10_000_000


def synth_dir(base_sf: str) -> str:
    st = os.stat(os.path.join(base_sf, "documents.parquet"))
    tag = (
        f"{os.path.basename(os.path.normpath(base_sf))}"
        f"-{int(st.st_mtime)}-{st.st_size}-x{REPLICAS}"
    )
    return os.path.join(_REPO_ROOT, ".cache", "scaleprobe", tag)


def build_synth(spark, base_sf: str) -> str:
    out = synth_dir(base_sf)
    if os.path.isfile(os.path.join(out, "_BUILT")):
        return out
    docs = spark.read.parquet(os.path.join(base_sf, "documents.parquet"))
    reps = spark.range(REPLICAS).select(F.col("id").alias("r"))
    big_docs = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("r") * ID_STRIDE).alias("doc_id"),
        F.array_join(
            F.transform(
                F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit("")),
                lambda t: F.concat(t, F.lit("_r"), F.col("r").cast("string")),
            ),
            " ",
        ).alias("text"),
        "lang",
        "source",
    )
    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    emb = spark.read.parquet(os.path.join(base_sf, "embeddings.parquet"))
    big_emb = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("r") * ID_STRIDE).alias("vec_id"),
        # small per-replica rotation keeps within-replica neighbor
        # structure intact without making replicas exact duplicates
        F.transform(
            F.col("embedding"),
            lambda x: x + F.col("r").cast("float") * F.lit(0.001),
        ).alias("embedding"),
        *[c for c in emb.columns if c not in ("vec_id", "embedding")],
    )
    big_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    with open(os.path.join(out, "_BUILT"), "w") as fh:
        fh.write("ok\n")
    return out


def build_synth_tpch(spark, base_sf: str) -> str:
    """10 key-strided replicas of the orders/lineitem JOIN columns (the
    graph probes touch nothing else — slim projections keep the synth
    build IO-proportional to what the probed plans actually read).
    Striding every key by r*ID_STRIDE makes the replica transaction
    universes disjoint: the co-transaction graph gains 10x nodes and
    10x edges at the SAME degree distribution — organic growth, not
    densification (verbatim replication would multiply every node's
    degree by 10 and the wedge volume by 100 by construction)."""
    out = synth_dir(base_sf) + "-tpch"
    if os.path.isfile(os.path.join(out, "_BUILT")):
        return out
    reps = spark.range(REPLICAS).select(F.col("id").alias("r"))
    orders = spark.read.parquet(os.path.join(base_sf, "orders.parquet")).select(
        "o_orderkey", "o_custkey"
    )
    orders.crossJoin(reps).select(
        (F.col("o_orderkey") + F.col("r") * ID_STRIDE).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("r") * ID_STRIDE).alias("o_custkey"),
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet")
    )
    li = spark.read.parquet(os.path.join(base_sf, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    li.crossJoin(reps).select(
        (F.col("l_orderkey") + F.col("r") * ID_STRIDE).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("r") * ID_STRIDE).alias("l_partkey"),
        (F.col("l_suppkey") + F.col("r") * ID_STRIDE).alias("l_suppkey"),
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )
    with open(os.path.join(out, "_BUILT"), "w") as fh:
        fh.write("ok\n")
    return out


def _events_slim(spark, sf_dir: str):
    """The slim event projection the stateful probes read: (user_id,
    event_id, ts_us BIGINT, event_type) with ts normalized to epoch
    micros at read time (sources.ensure_timestamp) so both scales feed
    identical BIGINT-keyed plans regardless of parquet ts encoding."""
    from lab_etl_batch_data_processing_pipeline__spark.sources import (
        ensure_timestamp,
        read_parquet,
    )

    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    return ev.select(
        "user_id",
        "event_id",
        F.unix_micros(ensure_timestamp(ev, "ts")).alias("ts_us"),
        "event_type",
    )


def build_synth_events(spark, base_sf: str) -> str:
    """10 key-strided replicas of the slim event projection: user_id and
    event_id stride by r*ID_STRIDE, timestamps stay — 10 disjoint user
    universes with the SAME per-user event-count and state-change
    distributions (organic growth for the stateful family: 10x keys at
    flat per-key version counts, the shape that keeps SCD2/PIT linear;
    verbatim replication would multiply per-user observation density
    and the PIT fact x version mass by 100 by construction)."""
    out = synth_dir(base_sf) + "-events"
    if os.path.isfile(os.path.join(out, "_BUILT")):
        return out
    reps = spark.range(REPLICAS).select(F.col("id").alias("r"))
    _events_slim(spark, base_sf).crossJoin(reps).select(
        (F.col("user_id") + F.col("r") * ID_STRIDE).alias("user_id"),
        (F.col("event_id") + F.col("r") * ID_STRIDE).alias("event_id"),
        "ts_us",
        "event_type",
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    with open(os.path.join(out, "_BUILT"), "w") as fh:
        fh.write("ok\n")
    return out


def timed(fn, runs: int = 2):
    times, rows = [], None
    for _ in range(runs):
        t0 = time.time()
        rows = fn()
        times.append(round(time.time() - t0, 2))
    return times, rows


def main() -> None:
    args = sys.argv[1:]
    base_sf = "/root/testdata/sf0.1"
    if args and (os.path.sep in args[0] or os.path.isdir(args[0])):
        base_sf = args.pop(0)
    op_filters = args  # substring match on op names; empty = all

    def want(op: str) -> bool:
        return not op_filters or any(s in op for s in op_filters)

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    big = build_synth(spark, base_sf)

    scales = {
        "sf0.1": (
            spark.read.parquet(os.path.join(base_sf, "documents.parquet")),
            spark.read.parquet(os.path.join(base_sf, "embeddings.parquet")),
        ),
        "x10": (
            spark.read.parquet(os.path.join(big, "documents.parquet")),
            spark.read.parquet(os.path.join(big, "embeddings.parquet")),
        ),
    }
    # one materialized sketch per scale (the shared-artifact shape);
    # sketch build time is reported separately from the ops that use it
    sketches = {}
    report: dict[str, dict] = {}

    def record(op, scale, times, rows):
        report.setdefault(op, {})[scale] = times
        report[op].setdefault("out_rows", []).append(rows)
        # incremental receipt on stderr: a crash mid-probe (e.g. heap
        # exhaustion at 10x in one small local JVM) still identifies the
        # last completed op
        print(f"PROBE {op} {scale} {times} rows={rows}", file=sys.stderr)

    for scale, (docs, emb) in scales.items():
        sk = None
        needs_sketch = any(
            want(op)
            for op in ("jaccard_near_dups_capped", "near_dup_clusters_cc")
        )
        if want("token_sketch_build") or needs_sketch:
            t, n = timed(
                lambda: dedup_fuzzy.token_sketch(docs)
                .localCheckpoint(eager=True)
                .count(),
                runs=1,
            )
            sk = dedup_fuzzy.token_sketch(docs).localCheckpoint(eager=True)
            record("token_sketch_build", scale, t, n)
            sketches[scale] = sk

        if want("jaccard_near_dups_capped"):
            t, n = timed(
                lambda: dedup_fuzzy.jaccard_near_dups(
                    docs, threshold=0.5, sort=False, sketch=sk, block_cap=200
                ).count()
            )
            record("jaccard_near_dups_capped", scale, t, n)

        if want("containment_degree"):
            t, n = timed(
                lambda: dedup_fuzzy.containment_degree(docs, threshold=0.5).count()
            )
            record("containment_degree", scale, t, n)

        if want("substring_dedup"):
            t, n = timed(
                lambda: dedup_fuzzy.remove_duplicate_spans(
                    docs, k=8, min_len=15
                ).count()
            )
            record("substring_dedup", scale, t, n)

        nlist = 8 if scale == "sf0.1" else 80  # cells stay executor-sized
        if want("semantic_dedup"):
            t, n = timed(
                lambda: similarity.semantic_dedup(
                    emb, threshold=0.9, nlist=nlist
                ).count()
            )
            record("semantic_dedup", scale, t, n)

        # --- r11 verdict task 5 additions: ANN probe paths + CC ---

        # Fixed 5-vector query set at both scales (the corpus grows 10x,
        # the query volume doesn't — the serving shape). vec_id < 5
        # lands entirely in replica 0 of the synth, by construction.
        qv = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

        # LSH bucket join (the benched portable config: 3 planes /
        # 8 tables). Claim under test: candidate volume ~ corpus
        # bucket-collision mass, linear in corpus size at fixed planes.
        if want("ann_cosine_lsh_portable"):
            t, n = timed(
                lambda: similarity.cosine_topk_lsh(
                    emb, qv, k=5, num_planes=3, num_tables=8, portable=True
                ).count()
            )
            record("ann_cosine_lsh_portable", scale, t, n)

        # IVF: build scaled like semantic_dedup (nlist 8 -> 80 keeps
        # cells executor-sized); probe timed against a checkpointed
        # index — the at-scale operating shape (offline build, online
        # probe). Claim under test: probe cost ~ nprobe cells, NOT the
        # whole corpus.
        if want("ann_ivf_probe") or want("ivf_index_build_det"):
            t0 = time.time()
            inv, cent = (
                f.localCheckpoint(eager=True)
                for f in similarity.build_ivf_index(
                    emb, nlist=nlist, deterministic=True
                )
            )
            record(
                "ivf_index_build_det", scale, [round(time.time() - t0, 2)], nlist
            )
            t, n = timed(
                lambda: similarity.cosine_topk_ivf_probe(
                    inv, cent, qv, k=5, nprobe=3
                ).count()
            )
            record("ann_ivf_probe", scale, t, n)

        # Connected components over the strong-pair graph (the
        # near_dup_clusters shape: >= 0.6 Jaccard pairs, quotient
        # contraction CC). Claim under test: rounds ~ log(diameter),
        # per-round frames quotient-sized — cost ~ edge count.
        if want("near_dup_clusters_cc"):
            pairs = dedup_fuzzy.jaccard_near_dups(
                docs, threshold=0.6, sort=False, sketch=sk
            )
            t, n = timed(
                lambda: graph.connected_components(
                    pairs, assume_unique_pairs=True
                ).count()
            )
            record("near_dup_clusters_cc", scale, t, n)

        # --- r12 additions: iterative / graph / funnel families ---

        # k-means assignment (the embedding_kmeans bench shape: k=8,
        # 3 Lloyd iterations). Claim under test: cost ~ rows x k x
        # iters — linear in corpus size at fixed k; the per-iteration
        # driver collect stays k x dim regardless of scale.
        if want("embedding_kmeans"):
            t, n = timed(
                lambda: clustering.kmeans_assign(
                    emb, "vec_id", "embedding", k=8, iters=3
                ).count()
            )
            record("embedding_kmeans", scale, t, n)

        # Corpus-prep funnel (quality gate -> exact dedup -> blocked
        # Jaccard near-dedup; the corpus_prep bench shape). Claim under
        # test: every stage is one shuffle over frames that shrink down
        # the funnel, and the (len-bucket, min-md5-token) block key is
        # token-namespace-local — block SIZES stay flat at 10x, so the
        # verify join grows by block COUNT (linear), never by density.
        if want("corpus_prep_funnel"):

            def run_funnel(d=docs):
                out = corpus_plans.corpus_prep(d)
                return out.count()

            t, n = timed(run_funnel)
            record("corpus_prep_funnel", scale, t, n)

    # --- r13 additions: the stateful/temporal family (SCD2, CDC merge,
    # point-in-time join, native session windows) ---
    events_scales = {}
    stateful_ops = (
        "scd2_history", "cdc_apply", "pit_join", "session_window",
    )
    if any(want(op) for op in stateful_ops):
        ep = build_synth_events(spark, base_sf)
        events_scales = {
            "sf0.1": _events_slim(spark, base_sf),
            "x10": spark.read.parquet(os.path.join(ep, "events.parquet")),
        }
    for scale, ev in events_scales.items():
        ev = ev.localCheckpoint(eager=True)  # synth cost out of the timings

        # SCD2 compression (the scd2_user_state bench shape). Claim
        # under test: one hash shuffle on user_id, BOTH window passes
        # reuse it — cost ~ observation rows, no per-version joins.
        if want("scd2_history"):
            t, n = timed(
                lambda: scd.scd2_history(
                    ev, "user_id", "event_type", "ts_us",
                    order_cols=("event_id",),
                ).count()
            )
            record("scd2_history", scale, t, n)

        # CDC merge (the orders_cdc_apply shape on event_id keys: every
        # 4th row updated at seq 1, every 6th deleted at seq 2). Claim
        # under test: union + ONE ranking window hashed on the key —
        # cost ~ snapshot + change rows, per-key frames stay tiny.
        if want("cdc_apply"):
            upd = (
                ev.filter(F.col("event_id") % 4 == 0)
                .withColumn("event_type", F.lit("X"))
                .withColumn("seq", F.lit(1))
                .withColumn("op", F.lit("U"))
            )
            dele = (
                ev.filter(F.col("event_id") % 6 == 0)
                .withColumn("seq", F.lit(2))
                .withColumn("op", F.lit("D"))
            )
            changes = upd.unionByName(dele)
            t, n = timed(
                lambda: scd.apply_changelog(
                    ev, changes, ["event_id"], "seq"
                ).count()
            )
            record("cdc_apply", scale, t, n)

        # Point-in-time join (the purchase_pit_state shape: browse-state
        # SCD2 dim, purchase facts). Claim under test: fact x version
        # blowup bounded per key by that key's STATE-CHANGE count — with
        # disjoint replica users both sides grow 10x at flat per-user
        # version counts, so the join is linear, never quadratic.
        if want("pit_join"):
            browse = ev.filter(F.col("event_type") != "purchase")
            dim = scd.scd2_history(
                browse, "user_id", "event_type", "ts_us",
                order_cols=("event_id",),
            ).drop("is_current").localCheckpoint(eager=True)
            facts = ev.filter(F.col("event_type") == "purchase").select(
                "user_id", "ts_us", "event_id"
            )
            t, n = timed(
                lambda: scd.point_in_time_join(
                    facts, dim, "user_id", "ts_us"
                ).count()
            )
            record("pit_join", scale, t, n)

        # Native gap session windows (the session_window_rollup shape,
        # 12 h gap). Claim under test: ONE shuffle on the session key,
        # merge work ~ events per user — linear in rows.
        if want("session_window"):
            t, n = timed(
                lambda: ev.withColumn("ts", F.timestamp_micros("ts_us"))
                .groupBy(
                    "user_id", F.session_window("ts", "12 hours").alias("w")
                )
                .agg(F.count(F.lit(1)).alias("n_events"))
                .count()
            )
            record("session_window", scale, t, n)

    tpch_scales = {}
    graph_ops = ("transaction_pagerank", "copurchase_triangles")
    if any(want(op) for op in graph_ops):
        tp = build_synth_tpch(spark, base_sf)
        tpch_scales = {
            "sf0.1": (
                spark.read.parquet(os.path.join(base_sf, "orders.parquet")),
                spark.read.parquet(os.path.join(base_sf, "lineitem.parquet")),
            ),
            "x10": (
                spark.read.parquet(os.path.join(tp, "orders.parquet")),
                spark.read.parquet(os.path.join(tp, "lineitem.parquet")),
            ),
        }
    for scale, (orders, li) in tpch_scales.items():
        # Integer PageRank over the bidirectional customer<->supplier
        # co-transaction graph (the transaction_pagerank bench shape:
        # 5 rounds). Claim under test: cost ~ edges x rounds — the
        # checkpointed static frames keep per-round work edge-sized, so
        # 10x edges => ~10x wall, not round-compounding lineage growth.
        if want("transaction_pagerank"):
            pairs = (
                li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
                .select(
                    (F.col("o_custkey") * 2).alias("c"),
                    (F.col("l_suppkey") * 2 + 1).alias("s"),
                )
                .distinct()
            )
            edges = pairs.select(
                F.col("c").alias("src"), F.col("s").alias("dst")
            ).union(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
            t, n = timed(lambda: graph.pagerank(edges, iterations=5).count())
            record("transaction_pagerank", scale, t, n)

        # Degree-ordered triangle counting over co-purchase edges (the
        # copurchase_triangles bench shape). Claim under test: the
        # Suri-Vassilvitskii orientation bounds wedge volume at
        # O(m^1.5) — with DISJOINT replica universes m grows 10x at
        # flat degree distribution, so wall grows ~10x (sum of 10
        # independent m^1.5 problems), NOT 10^1.5 = 32x (what a single
        # densified graph would pay).
        if want("copurchase_triangles"):
            edges = joins.basket_pairs(
                li, "l_orderkey", "l_partkey", min_support=2
            )
            t, n = timed(
                lambda: graph.triangle_counts(edges, "item_a", "item_b").count()
            )
            record("copurchase_triangles", scale, t, n)

    for op, d in report.items():
        if "sf0.1" in d and "x10" in d:
            d["ratio_steady"] = round(d["x10"][-1] / max(d["sf0.1"][-1], 1e-9), 2)
            # min-based ratio: on 10x inputs a single run can eat a major
            # GC pause (measured: triangles x10 run2 = 2.4x run1 in the
            # same JVM), so min-over-runs is the robust steady estimator
            d["ratio_min"] = round(min(d["x10"]) / max(min(d["sf0.1"]), 1e-9), 2)
    print(json.dumps({"base": base_sf, "replicas": REPLICAS, "ops": report}))


if __name__ == "__main__":
    main()
