"""Connected-components (operators/graph.py): golden components, chain
propagation past one hop, early convergence, and cluster summaries."""

from __future__ import annotations

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
