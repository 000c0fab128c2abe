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


@pytest.mark.parametrize("threshold", [100, 3])
def test_blocked_lp_equals_flat(spark, threshold):
    """label_count kernel family: blocked LP (count partials + fused
    argmax reduce, lowest-label ties) must match the flat two-level
    aggregation exactly — including through the dense/hub path
    (threshold=3 makes most sources hubs)."""
    edges = fixtures.topology("lp_blocks")
    sym = sorted(set(edges) | {(d, s) for s, d in edges})
    df = fixtures.edges_df(spark, sym)
    flat = algorithms.label_propagation(df, max_iter=6)
    blk = blocks.run_blocked(
        df, gimv.LabelPropagation(), p=P, dense_threshold=threshold, max_iter=6
    )
    a = {r["vertex"]: int(r["value"]) for r in flat.state.collect()}
    b = {r["vertex"]: int(r["value"]) for r in blk.state.collect()}
    assert a == b


def test_blocked_cc_delta_messages_decay(spark):
    """Blocked frontier messaging: on a path graph the compacted-partial
    count (messages_shuffled) must decay over HashMin's convergent tail."""
    edges = [(i, i + 1) for i in range(19)]
    sym = edges + [(d, s) for s, d in edges]
    df = fixtures.edges_df(spark, sym)
    res = blocks.run_blocked(df, gimv.ConnectedComponents(), p=P, max_iter=40)
    assert res.converged
    got = {r["vertex"]: int(r["value"]) for r in res.state.collect()}
    assert set(got.values()) == {0}
    msgs = [m.messages_shuffled for m in res.metrics]
    assert msgs[-1] <= 4  # tail: single-vertex frontier
    assert msgs[0] > 4 * msgs[-1]


def test_auto_p():
    assert blocks.auto_p(0, 8) == 8
    assert blocks.auto_p(1_000_000, 8) == 8
    assert blocks.auto_p(96_000_000, 8) == 32   # E/3M sets the grid
    # the cores floor is GONE (round-4 measurement: optimum p sits below
    # the core count at every size tried — fixed per-block cost dominates)
    assert blocks.auto_p(96_000_000, 64) == 32
    assert blocks.auto_p(100_000_000_000, 32) == 33334


def test_blocked_resume_refuses_p_mismatch(spark, tmp_path):
    """A blocked checkpoint records p; resuming under a different p would
    decode state arrays under the wrong (block, local) split — refuse."""
    from flexgraph_spark.checkpoint import Checkpointer

    edges = fixtures.rand_er(30, 0.2, seed=11)
    sym = sorted(set(edges) | {(d, s) for s, d in edges})
    df = fixtures.edges_df(spark, sym)
    ck = Checkpointer(str(tmp_path), input_fingerprint="t")
    blocks.run_blocked(df, gimv.ConnectedComponents(), p=P, max_iter=2,
                       checkpointer=ck)
    ck2 = Checkpointer(str(tmp_path), input_fingerprint="t")
    with pytest.raises(ValueError, match="p="):
        blocks.run_blocked(df, gimv.ConnectedComponents(), p=P + 1,
                           max_iter=4, checkpointer=ck2)
    # same p resumes fine (hub_sigs + active recomputed from values)
    res = blocks.run_blocked(df, gimv.ConnectedComponents(), p=P, max_iter=40,
                             checkpointer=Checkpointer(str(tmp_path),
                                                       input_fingerprint="t"))
    assert res.converged
    got = {r["vertex"]: int(r["value"]) for r in res.state.collect()}
    n = max(v for e in sym for v in e) + 1
    exp = oracle.connected_components(sym, n)
    assert [got[i] for i in range(n)] == exp.tolist()


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


def test_batch_ppr_blocked_matches_flat(spark):
    """The 'batch' kernel family: flattened (n_local x k) matrices per
    block reproduce the flat array-state plan per column."""
    import pytest as _pytest

    from flexgraph_spark import algorithms

    pairs = [(i % 9, (i * 4 + 1) % 9) for i in range(40)]
    pairs = [(s, d) for s, d in pairs if s != d] + [(4, 0), (8, 1)]
    e = spark.createDataFrame(sorted(set(pairs)), "src long, dst long")
    sources = [0, 2, 5]
    flat = algorithms.batch_ppr(e, sources, max_iter=6, threshold=0.0)
    blocked = algorithms.batch_ppr(
        e, sources, max_iter=6, threshold=0.0,
        engine="blocked", p=2, dense_threshold=4,
    )
    f = {r.vertex: list(r.value) for r in flat.state.collect()}
    b = {r.vertex: list(r.value) for r in blocked.state.collect()}
    assert set(f) == set(b)
    for v in f:
        assert len(f[v]) == len(sources)
        for j in range(len(sources)):
            assert b[v][j] == _pytest.approx(f[v][j], rel=1e-12, abs=1e-15)


def test_partition_cut_stats_golden(spark):
    """Hand-computed 2x2 grid: 5 edges, diagonal cells hold the two
    even-even + one odd-odd edges."""
    from flexgraph_spark.blocks import partition_cut_stats

    e = spark.createDataFrame(
        [(0, 2), (2, 4), (1, 3), (0, 1), (1, 2)], "src long, dst long"
    )
    row = partition_cut_stats(e, 2).first()
    assert row["p"] == 2 and row["n_edges"] == 5
    assert row["intra_edges"] == 3  # (0,2),(2,4) even-even; (1,3) odd-odd
    assert row["cut_frac"] == round(1 - 3 / 5, 6)
    assert row["max_cell"] == 2  # cell (bc=0,br=0) holds (0,2),(2,4)
    assert row["mean_cell"] == round(5 / 4, 6)
    assert row["cell_skew"] == round(2 * 4 / 5, 6)


def test_alternating_blocked_survives_empty_blocks_and_all_dense(spark):
    """gimv.AlternatingPropagation edge cases: p greater than the doubled
    vertex count leaves some state blocks EMPTY (the len(old)==0 step-
    counter guard), and dense_threshold=0 (all-dense degenerate mode)
    must still deliver the exact alternation. Both compared to flat."""
    from flexgraph_spark import algorithms

    es = [(0, 1), (1, 0), (1, 2)]
    df = spark.createDataFrame(es, "src long, dst long")
    flat = {r.vertex: (round(r.hub, 9), round(r.auth, 9))
            for r in algorithms.salsa(df, max_iter=2).state.collect()}
    blk = {r.vertex: (round(r.hub, 9), round(r.auth, 9))
           for r in algorithms.salsa(
               df, max_iter=2, engine="blocked", p=8, dense_threshold=1
           ).state.collect()}
    assert flat == blk
    fh = {r.vertex: (round(r.hub, 9), round(r.auth, 9))
          for r in algorithms.hits(df, max_iter=2).state.collect()}
    bh = {r.vertex: (round(r.hub, 9), round(r.auth, 9))
          for r in algorithms.hits(
              df, max_iter=2, engine="blocked", p=8, dense_threshold=0
          ).state.collect()}
    assert fh == bh
