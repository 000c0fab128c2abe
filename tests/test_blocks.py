"""M2 tests: CSR block build round-trip, dense/sparse classification at the
threshold boundary, stats manifest, and blocked ≡ flat equivalence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flexgraph_spark import algorithms, blocks, fixtures, gimv, oracle


P = 4


def test_prepartition_roundtrip(spark):
    edges = fixtures.topology("two_components")
    df = fixtures.edges_df(spark, edges)
    b = blocks.prepartition(df, P, dense_threshold=100)
    back = blocks.blocks_to_edges(b, P)
    got = sorted((r["src"], r["dst"]) for r in back.collect())
    assert got == sorted(set(edges))


def test_prepartition_roundtrip_weighted(spark):
    edges = fixtures.topology("weighted_diamond")
    df = fixtures.edges_df(spark, edges, weighted=True)
    b = blocks.prepartition(df, P, dense_threshold=100, weighted=True)
    back = blocks.blocks_to_edges(b, P)
    got = sorted(map(tuple, back.collect()))
    assert got == sorted(set(edges))


def test_dense_threshold_boundary(spark):
    # star hub has out-degree 199; spokes have 1. Exactly-at-threshold is
    # dense (>=, UnweightedGraphPrepartitioning.java:226).
    df = fixtures.edges_df(spark, fixtures.topology("star_hub"))
    b = blocks.prepartition(df, P, dense_threshold=199).cache()
    dense_nnz = b.filter("is_dense").agg(F.sum(F.size("dst_local"))).first()[0]
    sparse_nnz = b.filter("NOT is_dense").agg(F.sum(F.size("dst_local"))).first()[0]
    assert dense_nnz == 199  # hub's out-edges
    assert sparse_nnz == 199  # spokes' edges
    # degenerate modes (Constants.java:25-27)
    all_sparse = blocks.prepartition(df, P, dense_threshold=-1)
    assert all_sparse.filter("is_dense").count() == 0
    all_dense = blocks.prepartition(df, P, dense_threshold=0)
    assert all_dense.filter("NOT is_dense").count() == 0


def test_block_stats(spark):
    df = fixtures.edges_df(spark, fixtures.topology("star_hub"))
    b = blocks.prepartition(df, P, dense_threshold=100)
    stats = blocks.block_stats(b)
    assert stats["total_edges"] == 398
    assert stats["dense_edges"] == 199
    assert stats["sparse_edges"] == 199
    assert stats["skew_ratio"] >= 1.0


@pytest.mark.parametrize("threshold", [100, -1, 0])
def test_blocked_pagerank_equals_flat(spark, threshold):
    edges = fixtures.rand_er(40, 0.1, seed=42)
    df = fixtures.edges_df(spark, edges)
    flat = algorithms.pagerank(df, max_iter=40)
    blk = blocks.run_blocked(
        df, gimv.PageRank(), p=P, dense_threshold=threshold, max_iter=40
    )
    a = {r["vertex"]: r["value"] for r in flat.state.collect()}
    b = {r["vertex"]: r["value"] for r in blk.state.collect()}
    # blocked n = max_id+1 (reference rule); rand_er(40) covers all ids
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, k


def test_blocked_pagerank_hub_graph(spark):
    # the dense/broadcast path must agree with the oracle on a skewed graph
    edges = fixtures.topology("star_hub")
    df = fixtures.edges_df(spark, edges)
    blk = blocks.run_blocked(df, gimv.PageRank(), p=P, dense_threshold=100, max_iter=60)
    got = {r["vertex"]: r["value"] for r in blk.state.collect()}
    exp = oracle.pagerank(edges, 200, max_iter=60)
    assert np.allclose([got[i] for i in range(200)], exp, atol=1e-6)


def test_blocked_cc_equals_flat(spark):
    edges = fixtures.topology("two_components")
    # blocked path needs contiguous-ish ids: remap
    ids = sorted({v for e in edges for v in e})
    fwd = {v: i for i, v in enumerate(ids)}
    e01 = [(fwd[s], fwd[d]) for s, d in edges]
    sym = e01 + [(d, s) for s, d in e01]
    df = fixtures.edges_df(spark, sym)
    blk = blocks.run_blocked(df, gimv.ConnectedComponents(), p=P, max_iter=30)
    got = {r["vertex"]: int(r["value"]) for r in blk.state.collect()}
    exp = oracle.connected_components(sym, len(ids))
    assert [got[i] for i in range(len(ids))] == exp.tolist()


def test_blocked_sssp(spark):
    edges = fixtures.topology("weighted_diamond")
    df = fixtures.edges_df(spark, edges, weighted=True)
    blk = blocks.run_blocked(df, gimv.SSSP(0), p=2, max_iter=20)
    got = {r["vertex"]: r["value"] for r in blk.state.collect()}
    assert got[3] == 2.0 and got[2] == 4.0


def test_blocked_rejects_lp(spark):
    df = fixtures.edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        blocks.run_blocked(df, gimv.LabelPropagation(), p=2)


def test_write_read_blocks_roundtrip(spark, tmp_path):
    edges = fixtures.rand_er(30, 0.15, seed=7)
    df = fixtures.edges_df(spark, edges)
    blk = blocks.prepartition(df, P, dense_threshold=3)
    stats = blocks.write_blocks(blk, str(tmp_path / "blocks"), p=P, dense_threshold=3)
    assert stats["total_edges"] == len(edges)
    reread, stats2 = blocks.read_blocks(spark, str(tmp_path / "blocks"))
    assert stats2["p"] == P and stats2["dense_threshold"] == 3
    back = {
        (r["src"], r["dst"])
        for r in blocks.blocks_to_edges(reread, P).collect()
    }
    assert back == set(edges)
    # and the blocked runner accepts pre-built blocks
    res = blocks.run_blocked(
        df, gimv.ConnectedComponents(), p=P, blocks=reread, max_iter=30
    )
    assert res.converged


def test_suggest_dense_threshold(spark):
    # star hub (deg 199) + 199 spokes (deg 1): the 99.5th percentile cutoff
    # isolates the hub
    df = fixtures.edges_df(spark, fixtures.topology("star_hub"))
    t = blocks.suggest_dense_threshold(df, hub_fraction=0.005)
    b = blocks.prepartition(df, 4, dense_threshold=t)
    assert b.filter("is_dense").agg(F.sum(F.size("dst_local"))).first()[0] == 199
