"""Connected-components (operators/graph.py): golden components, chain
propagation past one hop, early convergence, and cluster summaries."""

from __future__ import annotations

import pytest

from lab_etl_batch_data_processing_pipeline__spark.operators import graph


def pairs_df(spark, edges):
    return spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")


def test_components_golden(spark):
    # {1,2,3} via 1-2, 2-3 (1-3 never a pair); {5,6}; 9-9 irrelevant absent
    cc = graph.connected_components(pairs_df(spark, [(1, 2), (2, 3), (5, 6)]))
    got = {r.node_id: r.component_id for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_chain_propagates_full_diameter(spark):
    # a 12-node path: min label must flow the whole way, not one hop
    edges = [(i, i + 1) for i in range(1, 12)]
    cc = graph.connected_components(pairs_df(spark, edges))
    got = {r.node_id: r.component_id for r in cc.collect()}
    assert got == {i: 1 for i in range(1, 13)}


def test_direction_and_duplicate_edges_are_normalized(spark):
    cc = graph.connected_components(
        pairs_df(spark, [(2, 1), (1, 2), (2, 3), (3, 2)])
    )
    got = {r.node_id: r.component_id for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_max_iter_bounds_work(spark):
    # with max_iter=1 a 4-chain cannot fully converge -> labels reflect
    # exactly one propagation round (documents the bound is real)
    cc = graph.connected_components(
        pairs_df(spark, [(1, 2), (2, 3), (3, 4)]), max_iter=1
    )
    got = {r.node_id: r.component_id for r in cc.collect()}
    # exactly one propagation round: each node holds min over itself and
    # its direct neighbors' SEED labels
    assert got == {1: 1, 2: 1, 3: 2, 4: 3}


def test_dup_clusters_summary(spark):
    out = graph.dup_clusters(pairs_df(spark, [(1, 2), (2, 3), (5, 6)])).collect()
    assert [(r.component_id, r.n_docs) for r in out] == [(1, 3), (5, 2)]


def test_first_level_tolerates_unbroadcastable_labels(spark, monkeypatch):
    """The FIRST contraction level's label frame is node-count-sized —
    unbounded at corpus scale — so it must never get the hard F.broadcast
    hint (Spark obeys the hint regardless of size -> OOM instead of a
    shuffle join). Recursive levels work on quotient-sized frames and
    keep the hint. Pinned by counting hint calls through the operator."""
    calls = []
    real_broadcast = graph.F.broadcast

    def counting_broadcast(df):
        calls.append(df)
        return real_broadcast(df)

    monkeypatch.setattr(graph.F, "broadcast", counting_broadcast)

    # Clique: converges at level 0. The quotient join is still BUILT
    # (hint callable chosen before the convergence probe), so zero calls
    # proves level 0 uses no hard hint at all.
    cc = graph.connected_components(pairs_df(spark, [(1, 2), (1, 3), (2, 3)]))
    got = {r.node_id: r.component_id for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1}
    assert calls == [], "first contraction level must not hard-broadcast"

    # Chain: needs a recursive (quotient-sized) level, which SHOULD hint.
    edges = [(i, i + 1) for i in range(1, 8)]
    cc = graph.connected_components(pairs_df(spark, edges))
    got = {r.node_id: r.component_id for r in cc.collect()}
    assert got == {i: 1 for i in range(1, 9)}
    assert len(calls) >= 2, "recursive quotient levels should keep the hint"


def test_pagerank_star_graph_hand_computed(spark):
    """Hub <-> 3 spokes, 1 iteration: every step is integer arithmetic
    checked by hand; determinism across partitionings is implied by the
    arithmetic never leaving BIGINT."""
    from lab_etl_batch_data_processing_pipeline__spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in (1, 2, 3)] + [(i, 0) for i in (1, 2, 3)],
        ["src", "dst"],
    )
    r = {x.node_id: x.rank_fp for x in pagerank(edges, iterations=1).collect()}
    base = 15 * (1 << 20) // 100       # 157286
    r0 = 1 << 20                       # 1048576
    damped = 85 * r0 // 100            # 891289
    # hub: three spokes each outdeg 1 -> 3 * (damped // 1)
    assert r[0] == base + 3 * damped
    # spoke: hub outdeg 3 -> damped // 3
    assert r[1] == r[2] == r[3] == base + damped // 3


def test_pagerank_checkpointed_matches_unrolled(spark):
    from lab_etl_batch_data_processing_pipeline__spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 20) for i in range(20)]
        + [((i * 7 + 3) % 20, i) for i in range(20)],
        ["src", "dst"],
    ).filter("src <> dst")
    a = sorted(map(tuple, pagerank(edges, iterations=4).collect()))
    b = sorted(
        map(tuple, pagerank(edges, iterations=4, checkpoint_ranks=True).collect())
    )
    assert a == b


def test_entity_clusters_transitive_chain(spark):
    """a~b and b~c at distance <= 1 without a~c: one component, labeled
    by the minimum id — the resolution step linkage pairs feed."""
    from lab_etl_batch_data_processing_pipeline__spark.operators import (
        graph,
        linkage,
    )

    recs = spark.createDataFrame(
        [
            (10, "acme corp", "X"),
            (11, "acme corpo", "X"),    # dist 1 to 10
            (12, "acme corpor", "X"),   # dist 1 to 11, dist 2 to 10
            (20, "zzz totally other", "X"),
        ],
        ["rid", "name", "blk"],
    )
    pairs = linkage.fuzzy_pairs(recs, "rid", "name", ["blk"], max_distance=1, sort=False)
    out = {
        r.node_id: r.component_id
        for r in graph.connected_components(
            pairs, "id_a", "id_b", assume_unique_pairs=True
        ).collect()
    }
    assert out == {10: 10, 11: 10, 12: 10}


def test_ckpt_storage_knob_is_value_neutral(spark, monkeypatch):
    """SPARK_GRAFT_CKPT_STORAGE only changes WHERE checkpoint blocks
    live (the one-JVM capacity knob, SCALE.md Round-15) — CC, kcore,
    and pagerank results under DISK_ONLY must be bit-identical to the
    default storage path."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
        ["doc_id_a", "doc_id_b"],
    )
    pr_edges = edges.selectExpr("doc_id_a as src", "doc_id_b as dst").union(
        edges.selectExpr("doc_id_b as src", "doc_id_a as dst")
    )

    def snapshot():
        cc = {
            (r.node_id, r.component_id)
            for r in graph.connected_components(edges).collect()
        }
        kc = {
            (r.node, r.core_degree)
            for r in graph.kcore(edges, "doc_id_a", "doc_id_b", k=2, rounds=3).collect()
        }
        pr = {
            (r.node_id, r.rank_fp)
            for r in graph.pagerank(
                pr_edges, iterations=4, checkpoint_ranks=True
            ).collect()
        }
        return cc, kc, pr

    monkeypatch.delenv("SPARK_GRAFT_CKPT_STORAGE", raising=False)
    base = snapshot()
    monkeypatch.setenv("SPARK_GRAFT_CKPT_STORAGE", "DISK_ONLY")
    assert snapshot() == base


def test_ckpt_storage_knob_is_value_neutral_outside_graph(spark, monkeypatch):
    """r16: every checkpointing family routes through graph._ckpt (the
    r15 verdict's knob-coverage task), so the neutrality pin must hold
    for a NON-graph consumer too — kmeans (clustering.py's Lloyd input
    checkpoint) under DISK_ONLY is bit-identical to default storage."""
    from lab_etl_batch_data_processing_pipeline__spark.operators import clustering

    vecs = spark.createDataFrame(
        [(i, [float(i % 7), float((3 * i) % 5), float(i % 3)]) for i in range(40)],
        ["vec_id", "embedding"],
    )

    def snapshot():
        return {
            (r.id, r.cluster, r.dist_sq)
            for r in clustering.kmeans_assign(
                vecs, "vec_id", "embedding", k=3, iters=2
            ).collect()
        }

    monkeypatch.delenv("SPARK_GRAFT_CKPT_STORAGE", raising=False)
    base = snapshot()
    monkeypatch.setenv("SPARK_GRAFT_CKPT_STORAGE", "DISK_ONLY")
    assert snapshot() == base


def test_ckpt_storage_knob_rejects_unknown_value(monkeypatch):
    """A typo'd SPARK_GRAFT_CKPT_STORAGE must fail FAST with an error
    naming the variable and the valid StorageLevel names — not a bare
    AttributeError deep inside an iterative query (r15 ADVICE). A
    value that is merely whitespace-padded resolves fine."""
    monkeypatch.setenv("SPARK_GRAFT_CKPT_STORAGE", "disk_only")
    with pytest.raises(ValueError) as exc:
        graph._ckpt_storage()
    assert "SPARK_GRAFT_CKPT_STORAGE" in str(exc.value)
    assert "DISK_ONLY" in str(exc.value)  # names the valid levels
    monkeypatch.setenv("SPARK_GRAFT_CKPT_STORAGE", " DISK_ONLY ")
    from pyspark.storagelevel import StorageLevel

    assert graph._ckpt_storage() == StorageLevel.DISK_ONLY


def test_label_propagation_bridged_triangles(spark):
    """Two 3-cliques joined by a single bridge are ONE component but
    must resolve to TWO communities — the separation components/cores
    cannot make, and the reason LPA exists in the engine."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)],
        ["src", "dst"],
    )
    out = {
        r.node: r.community
        for r in graph.label_propagation(edges, rounds=3).collect()
    }
    assert len({out[1], out[10]}) == 2, "bridge must not merge communities"
    assert out[1] == out[2] == out[3]
    assert out[10] == out[11] == out[12]



def test_hits_bipartite_golden(spark):
    """Tiny purchase-shaped bipartite graph, hand-checkable structure:
    sources (customers) hold auth_fp 0 and sinks (suppliers) hub_fp 0;
    the peak hub and peak authority sit at exactly 2^20 after the
    L-infinity renorm; the customer buying from the strongest supplier
    set out-ranks the one buying from weak ones, and structurally
    identical nodes tie exactly."""
    # customers 0,2,4; suppliers 1,3,5.
    # 0 buys from 1,3,5; 2 buys from 1,3; 4 buys from 5 only.
    edges = spark.createDataFrame(
        [(0, 1), (0, 3), (0, 5), (2, 1), (2, 3), (4, 5)], ["src", "dst"]
    )
    out = {r.node_id: (r.hub_fp, r.auth_fp) for r in graph.hits(edges).collect()}
    one = 1 << 20
    assert set(out) == {0, 1, 2, 3, 4, 5}
    for c in (0, 2, 4):
        assert out[c][1] == 0, "customers are never authorities"
    for s in (1, 3, 5):
        assert out[s][0] == 0, "suppliers are never hubs"
    assert max(h for h, _ in out.values()) == one
    assert max(a for _, a in out.values()) == one
    assert out[0][0] == one, "the 3-supplier buyer is the peak hub"
    assert out[1] == out[3], "structurally identical suppliers tie"
    assert out[0][0] > out[2][0] > out[4][0]
    assert out[1][1] > out[5][1], "two strong buyers beat one mixed one"


def test_hits_matches_sequential_replica(spark):
    """Randomized parity vs an in-test integer-HITS replica (same
    exact-BIGINT sums, same truncating L-infinity renorm), over seeded
    random DIRECTED graphs — pins that the distributed join/agg/
    broadcast-max form IS the algorithm, including duplicate edges and
    self-loops normalizing away."""
    import random

    rng = random.Random(4099)
    one = 1 << 20
    for trial in range(4):
        n = rng.randint(5, 12)
        edges = set()
        while len(edges) < n + 5:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((a, b))
        iters = rng.randint(1, 4)

        nodes = sorted({v for e in edges for v in e})
        hub = {v: one for v in nodes}

        def renorm(raw):
            mx = max(raw.values())
            return {v: (raw.get(v, 0) * one) // mx for v in nodes}

        auth = {}
        for _ in range(iters):
            a_raw = {}
            for s, d in edges:
                a_raw[d] = a_raw.get(d, 0) + hub[s]
            auth = renorm(a_raw)
            h_raw = {}
            for s, d in edges:
                h_raw[s] = h_raw.get(s, 0) + auth[d]
            hub = renorm(h_raw)

        rows = list(edges) + [
            e for e in edges if rng.random() < 0.4  # noisy dups
        ] + [(v, v) for v in nodes if rng.random() < 0.2]  # self-loops
        df = spark.createDataFrame(rows, ["src", "dst"])
        got = {
            r.node_id: (r.hub_fp, r.auth_fp)
            for r in graph.hits(df, iterations=iters).collect()
        }
        want = {v: (hub[v], auth[v]) for v in nodes}
        assert got == want, (trial, iters, sorted(edges))

def test_label_propagation_matches_sequential_replica(spark):
    """Randomized parity vs an in-test synchronous-LPA replica (same
    min-label tie-break), over seeded random graphs — pins that the
    distributed join/count/window form IS the algorithm, including
    duplicate/reversed input edges normalizing away."""
    import random

    rng = random.Random(2017)
    for trial in range(4):
        n = rng.randint(6, 14)
        edges = set()
        while len(edges) < n + 4:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        rounds = rng.randint(1, 4)

        nbrs: dict[int, list[int]] = {}
        for a, b in edges:
            nbrs.setdefault(a, []).append(b)
            nbrs.setdefault(b, []).append(a)
        lbl = {v: v for v in nbrs}
        for _ in range(rounds):
            nxt = {}
            for v, ns in nbrs.items():
                counts: dict[int, int] = {}
                for u in ns:
                    counts[lbl[u]] = counts.get(lbl[u], 0) + 1
                nxt[v] = min(
                    counts, key=lambda c: (-counts[c], c)
                )
            lbl = nxt

        rows = [(a, b) for a, b in edges] + [
            (b, a) for a, b in edges if rng.random() < 0.5  # noisy dups
        ]
        df = spark.createDataFrame(rows, ["src", "dst"])
        got = {
            r.node: r.community
            for r in graph.label_propagation(df, rounds=rounds).collect()
        }
        assert got == lbl, (trial, rounds, sorted(edges))


def test_bfs_hops_path_golden(spark):
    """Hand-checkable BFS structure on a symmetrized path plus a
    disconnected pair: seed = smallest node id, hops count along the
    path, the unreachable component is ABSENT (no invented infinity),
    max_hops truncates the frontier, and the early exit on an
    exhausted frontier returns the same distances."""
    path = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)]
    edges = spark.createDataFrame(
        path + [(b, a) for a, b in path], ["src", "dst"]
    )
    out = {
        r.node_id: r.hop
        for r in graph.bfs_hops(edges, n_seeds=1, max_hops=4).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}, out
    # max_hops larger than the diameter: early exit, full component
    out = {
        r.node_id: r.hop
        for r in graph.bfs_hops(edges, n_seeds=1, max_hops=9).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5}
    # two seeds (1 and 2): distances shrink from the second source
    out = {
        r.node_id: r.hop
        for r in graph.bfs_hops(edges, n_seeds=2, max_hops=4).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 2, 5: 3, 6: 4}


def test_bfs_hops_releases_all_but_final_distances(spark):
    """On return only the final distance checkpoint may stay persisted
    (both directions): the trailing nxt/dist levels and the static edge
    frame must unpersist — they held blocks for the session's life
    before r18 — while the survivor must still be readable (an eager
    checkpoint, so releasing the statics cannot orphan it)."""
    import time

    path = [(1, 2), (2, 3), (10, 11)]
    edges = spark.createDataFrame(
        path + [(b, a) for a, b in path], ["src", "dst"]
    )
    sc = spark.sparkContext

    def persisted_ids() -> set:
        return {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}

    # compare the SET of new ids, not the total count: in a shared
    # test session the ContextCleaner may release PRE-EXISTING frames
    # concurrently, so a count comparison flaps (seen in-suite r18)
    before = persisted_ids()
    out = graph.bfs_hops(edges, n_seeds=1, max_hops=4)
    rows = {r.node_id: r.hop for r in out.collect()}
    assert rows == {1: 0, 2: 1, 3: 2}
    for _ in range(40):  # unpersist is async on the JVM side
        if len(persisted_ids() - before) == 1:
            break
        time.sleep(0.25)
    assert len(persisted_ids() - before) == 1
    assert {r.node_id: r.hop for r in out.collect()} == rows


def test_bfs_hops_matches_sequential_replica(spark):
    """Randomized parity vs an in-test BFS replica (multi-source,
    min-hop, smallest-ids seed rule), over seeded random DIRECTED
    graphs — pins that the distributed join/anti-join/union form IS
    the algorithm, including duplicate edges and self-loops
    normalizing away."""
    import random
    from collections import deque

    rng = random.Random(8191)
    for trial in range(4):
        n = rng.randint(5, 14)
        edges = set()
        while len(edges) < n + 6:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((a, b))
        n_seeds = rng.randint(1, 3)
        max_hops = rng.randint(1, 4)

        nodes = sorted({v for e in edges for v in e})
        adj: dict[int, list[int]] = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
        want = {v: 0 for v in nodes[:n_seeds]}
        q = deque(nodes[:n_seeds])
        while q:
            u = q.popleft()
            if want[u] >= max_hops:
                continue
            for w in adj.get(u, ()):
                if w not in want:
                    want[w] = want[u] + 1
                    q.append(w)

        rows = list(edges) + [
            e for e in edges if rng.random() < 0.4  # noisy dups
        ] + [(v, v) for v in nodes if rng.random() < 0.2]  # self-loops
        df = spark.createDataFrame(rows, ["src", "dst"])
        got = {
            r.node_id: r.hop
            for r in graph.bfs_hops(
                df, n_seeds=n_seeds, max_hops=max_hops
            ).collect()
        }
        assert got == want, (trial, n_seeds, max_hops, sorted(edges))


def test_cc_pairs_cache_path_matches_duplicate_tolerant_path(spark):
    """r18 optimization pin: assume_unique_pairs=True (pairs cached,
    symmetrized per read) and the duplicate-tolerant path (edges
    deduped + cached) must resolve identical components."""
    from lab_etl_batch_data_processing_pipeline__spark.operators import graph

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (10, 11), (3, 4)], ["doc_id_a", "doc_id_b"]
    )
    a = sorted(
        map(tuple, graph.connected_components(
            pairs, assume_unique_pairs=True
        ).collect())
    )
    b = sorted(
        map(tuple, graph.connected_components(
            pairs, assume_unique_pairs=False
        ).collect())
    )
    assert a == b
    comp = dict(a)
    assert comp[4] == 1 and comp[8] == 7 and comp[11] == 10
