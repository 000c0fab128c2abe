"""M1 golden tests: flat GIM-V runner vs NumPy oracles with the
reference's exact semantics (FIXTURES.md F3/F4)."""

import numpy as np
import pytest

from flexgraph_spark import algorithms, fixtures, oracle


def _remap(edges):
    """Remap arbitrary vertex ids to [0, n); returns (edges01, n, fwd, back)."""
    ids = sorted({v for e in edges for v in (e[0], e[1])})
    fwd = {v: i for i, v in enumerate(ids)}
    out = [(fwd[e[0]], fwd[e[1]], *e[2:]) for e in edges]
    return out, len(ids), fwd, {i: v for v, i in fwd.items()}


def _collect_values(result):
    return {r["vertex"]: r["value"] for r in result.state.collect()}


@pytest.mark.parametrize("topo", ["line10", "cycle8", "star_hub", "dangling"])
def test_pagerank_matches_reference_oracle(spark, topo):
    edges = fixtures.topology(topo)
    e01, n, fwd, _ = _remap(edges)
    df = fixtures.edges_df(spark, e01)
    res = algorithms.pagerank(df, max_iter=60)
    got = _collect_values(res)
    expected = oracle.pagerank(e01, n, max_iter=60)
    # dangling vertices (2 in 'dangling') never appear as src; engine's
    # vertex set == endpoints of edges, same as the oracle's [0, n)
    got_vec = np.array([got[i] for i in range(n)])
    assert np.allclose(got_vec, expected, atol=1e-6)
    assert abs(got_vec.sum() - 1.0) < 1e-9


def test_pagerank_cycle_uniform(spark):
    df = fixtures.edges_df(spark, fixtures.topology("cycle8"))
    res = algorithms.pagerank(df)
    got = _collect_values(res)
    assert res.converged
    for v, r in got.items():
        assert abs(r - 1 / 8) < 1e-9


def test_personalized_pagerank(spark):
    edges = fixtures.topology("line10")
    df = fixtures.edges_df(spark, edges)
    res = algorithms.pagerank(df, source_vertex=0, max_iter=60)
    got = _collect_values(res)
    expected = oracle.pagerank(edges, 10, source=0, max_iter=60)
    assert np.allclose([got[i] for i in range(10)], expected, atol=1e-6)


def test_cc_exact(spark):
    edges = fixtures.topology("two_components")
    e01, n, fwd, back = _remap(edges)
    df = fixtures.edges_df(spark, edges)
    res = algorithms.connected_components(df)
    got = _collect_values(res)
    exp = oracle.connected_components(
        e01 + [(d, s) for s, d in e01], n
    )
    assert res.converged
    for v, lbl in got.items():
        assert lbl == back[exp[fwd[v]]]


def test_sssp_weighted_diamond(spark):
    edges = fixtures.topology("weighted_diamond")
    df = fixtures.edges_df(spark, edges, weighted=True)
    res = algorithms.sssp(df, source_vertex=0)
    got = _collect_values(res)
    assert res.converged
    assert got[0] == 0.0
    assert got[1] == 1.0
    assert got[2] == 4.0
    assert got[3] == 2.0  # via 0-1-3


def test_sssp_unreachable_sentinel(spark):
    df = fixtures.edges_df(spark, [(0, 1, 1.0), (2, 3, 1.0)], weighted=True)
    res = algorithms.sssp(df, source_vertex=0)
    got = _collect_values(res)
    assert got[2] == oracle.SSSP_INF
    assert got[3] == oracle.SSSP_INF


def test_label_propagation_two_blocks(spark):
    edges = fixtures.topology("lp_blocks")
    df = fixtures.edges_df(spark, edges)
    res = algorithms.label_propagation(df, max_iter=30)
    got = _collect_values(res)
    sym = edges + [(d, s) for s, d in edges]
    exp = oracle.label_propagation(sym, 40, max_iter=30)
    for v in range(40):
        assert got[v] == exp[v], f"vertex {v}"


def test_triangle_count(spark):
    df = fixtures.edges_df(spark, fixtures.topology("triangle_mix"))
    assert algorithms.triangle_count(df) == 5


@pytest.mark.parametrize("seed", [42, 43])
def test_property_random_graph(spark, seed):
    edges = fixtures.rand_er(30, 0.08, seed=seed)
    if not edges:
        pytest.skip("empty graph")
    e01, n, fwd, back = _remap(edges)
    df = fixtures.edges_df(spark, e01)

    res = algorithms.pagerank(df, max_iter=50)
    got = _collect_values(res)
    exp = oracle.pagerank(e01, n, max_iter=50)
    assert np.allclose([got[i] for i in range(n)], exp, atol=1e-6)

    res_cc = algorithms.connected_components(df)
    got_cc = _collect_values(res_cc)
    exp_cc = oracle.connected_components(e01 + [(d, s) for s, d in e01], n)
    assert [got_cc[i] for i in range(n)] == exp_cc.tolist()

    tri = algorithms.triangle_count(df)
    assert tri == oracle.triangle_count(e01, n)


def test_engine_auto_dispatch(spark):
    """auto picks flat below the crossover and translates kwargs between
    engine vocabularies; results must match either way."""
    from flexgraph_spark import algorithms

    edges = fixtures.edges_df(spark, fixtures.rand_er(30, 0.2, seed=3))
    assert algorithms.choose_engine(edges, p=4) == "flat"  # tiny graph
    res_auto = algorithms.pagerank(edges, max_iter=20, engine="auto", p=4,
                                   dense_threshold=100)
    res_flat = algorithms.pagerank(edges, max_iter=20, num_partitions=4)
    a = {r["vertex"]: r["value"] for r in res_auto.state.collect()}
    b = {r["vertex"]: r["value"] for r in res_flat.state.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12
    # forcing the crossover to zero must route to the blocked engine
    import flexgraph_spark.algorithms as alg
    old = alg.AUTO_EDGES_PER_CORE
    alg.AUTO_EDGES_PER_CORE = 0
    try:
        assert alg.choose_engine(edges, p=4) == "blocked"
        res_blk = algorithms.pagerank(edges, max_iter=20, engine="auto",
                                      num_partitions=4)
        c = {r["vertex"]: r["value"] for r in res_blk.state.collect()}
        for k in a:
            assert abs(a[k] - c[k]) < 1e-9
    finally:
        alg.AUTO_EDGES_PER_CORE = old


def test_empty_graph_both_engines(spark):
    from flexgraph_spark import blocks, gimv

    empty = spark.createDataFrame([], "src long, dst long")
    res = algorithms.pagerank(empty, max_iter=5)
    assert res.converged and res.state.count() == 0
    res_b = blocks.run_blocked(empty, gimv.PageRank(), p=2, max_iter=5)
    assert res_b.converged and res_b.state.count() == 0


def test_self_loop_graph(spark):
    """Self loops: a vertex feeding itself must still converge; the 2-cycle
    keeps rank flowing."""
    from flexgraph_spark import blocks, gimv

    edges = fixtures.edges_df(spark, [(0, 0), (0, 1), (1, 0)])
    flat = algorithms.pagerank(edges, max_iter=40)
    blk = blocks.run_blocked(edges, gimv.PageRank(), p=2, max_iter=40)
    a = {r["vertex"]: r["value"] for r in flat.state.collect()}
    b = {r["vertex"]: r["value"] for r in blk.state.collect()}
    assert set(a) == set(b) == {0, 1}
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9


def test_cc_delta_messages_decay_on_path(spark):
    """Frontier/delta messaging (reference DoubleVectorCache.java:68-101):
    on a 20-vertex path, HashMin's convergent tail must ship only the
    shrinking frontier, not the full symmetrized edge set every superstep —
    messages_shuffled decays toward zero while labels stay exact."""
    edges = [(i, i + 1) for i in range(19)]
    df = fixtures.edges_df(spark, edges)
    res = algorithms.connected_components(df, max_iter=60)
    assert res.converged
    labels = _collect_values(res)
    assert set(labels.values()) == {0}
    msgs = [m.messages_shuffled for m in res.metrics]
    assert msgs[0] == 38  # iteration 1: every vertex is frontier (full scan)
    assert msgs[-1] <= 2  # tail: single-vertex frontier
    assert min(msgs[1:]) < msgs[0] // 4


def test_sssp_delta_frontier_messages(spark):
    """SSSP with frontier messaging on a path: the frontier is one vertex
    per superstep, so every superstep ships O(1) messages (not O(E))."""
    edges = [(i, i + 1, 1.0) for i in range(9)]
    df = fixtures.edges_df(spark, edges, weighted=True)
    res = algorithms.sssp(df, source_vertex=0, max_iter=20)
    got = _collect_values(res)
    assert got[9] == 9.0
    msgs = [m.messages_shuffled for m in res.metrics]
    assert max(msgs) <= 2


def test_cc_delta_checkpoint_resume_without_active(spark, tmp_path):
    """Resuming a pre-delta checkpoint (state lacks _active) must stay
    exact: everyone re-sends once, then the frontier rule takes over."""
    from pyspark.sql import functions as F

    from flexgraph_spark.checkpoint import Checkpointer

    edges = [(i, i + 1) for i in range(9)]
    df = fixtures.edges_df(spark, edges)
    full = algorithms.connected_components(df, max_iter=30)
    expected = _collect_values(full)

    ck = Checkpointer(str(tmp_path), input_fingerprint="t")
    res1 = algorithms.connected_components(df, max_iter=3, checkpointer=ck)
    assert not res1.converged
    # strip _active from the saved state to simulate an old checkpoint
    last = max(ck.manifest_rows("cc"), key=lambda r: r["iteration"])
    st = spark.read.parquet(last["state_path"])
    if "_active" in st.columns:
        stripped = st.drop("_active")
        stripped.write.mode("overwrite").parquet(str(tmp_path / "stripped"))
        spark.read.parquet(str(tmp_path / "stripped")).write.mode(
            "overwrite"
        ).parquet(last["state_path"])
    res2 = algorithms.connected_components(df, max_iter=30, checkpointer=ck)
    assert res2.converged
    assert _collect_values(res2) == expected


def test_weighted_pagerank_matches_numpy(spark):
    """Weighted PageRank vs a NumPy power-iteration with the identical
    recurrence (alpha*W^T r + (1-alpha)/n, W row-normalized by weight)."""
    import numpy as np

    from flexgraph_spark import algorithms

    rows = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0), (3, 0, 5.0)]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    res = algorithms.pagerank(e, threshold=0.0, max_iter=10, weighted=True)
    got = {r.vertex: r.value for r in res.state.collect()}

    n = 4
    w = np.zeros((n, n))
    for s, d, wt in rows:
        w[s, d] = wt
    p = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-300)
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        r = 0.85 * (p.T @ r) + 0.15 / n
    r = r / r.sum()
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-9, (v, got[v], r[v])


def test_weighted_pagerank_requires_weight_column(spark):
    import pytest as _pytest

    from flexgraph_spark import algorithms

    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with _pytest.raises(ValueError):
        algorithms.pagerank(e, weighted=True)


def test_weighted_pagerank_unit_weights_equal_unweighted(spark):
    from pyspark.sql import functions as F

    from flexgraph_spark import algorithms

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 2)], "src long, dst long"
    ).withColumn("weight", F.lit(1.0))
    a = {r.vertex: r.value
         for r in algorithms.pagerank(e, threshold=0.0, max_iter=6,
                                      weighted=True).state.collect()}
    b = {r.vertex: r.value
         for r in algorithms.pagerank(e.drop("weight"), threshold=0.0,
                                      max_iter=6).state.collect()}
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12


def test_pagerank_warm_start_matches_cold(spark):
    """Warm start from a subgraph's converged state reaches the same
    fixpoint as a cold run on the full graph (unique contraction
    fixpoint), within the two-sided threshold bound."""
    from flexgraph_spark import algorithms

    full = [(0, 1), (1, 2), (2, 0), (3, 2), (1, 3), (3, 0), (2, 3)]
    old = spark.createDataFrame(full[:-2], "src long, dst long")
    new = spark.createDataFrame(full, "src long, dst long")
    base = algorithms.pagerank(old, threshold=1e-7, max_iter=100)
    warm = algorithms.pagerank(
        new, threshold=1e-7, max_iter=100, initial_state=base.state
    )
    cold = algorithms.pagerank(new, threshold=1e-7, max_iter=100)
    w = {r["vertex"]: r["value"] for r in warm.state.collect()}
    c = {r["vertex"]: r["value"] for r in cold.state.collect()}
    assert set(w) == set(c)
    for v in c:
        assert w[v] == pytest.approx(c[v], abs=1e-5)
    assert warm.converged and cold.converged


def test_pagerank_warm_start_identical_graph_one_superstep(spark):
    """Re-running on the UNCHANGED graph from its own converged state
    converges after a single verification superstep."""
    from flexgraph_spark import algorithms

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 2), (1, 3)], "src long, dst long"
    )
    base = algorithms.pagerank(e, threshold=1e-7, max_iter=100)
    warm = algorithms.pagerank(
        e, threshold=1e-7, max_iter=100, initial_state=base.state
    )
    assert warm.converged and warm.iterations == 1
    assert base.iterations > 1


def test_pagerank_warm_start_new_vertices_get_cold_init(spark):
    """Vertices absent from the warm state fall back to the program's
    init and still converge to the cold answer."""
    from flexgraph_spark import algorithms

    old = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    new = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0)], "src long, dst long"
    )
    base = algorithms.pagerank(old, threshold=1e-7, max_iter=100)
    warm = algorithms.pagerank(
        new, threshold=1e-7, max_iter=100, initial_state=base.state
    )
    cold = algorithms.pagerank(new, threshold=1e-7, max_iter=100)
    w = {r["vertex"]: r["value"] for r in warm.state.collect()}
    c = {r["vertex"]: r["value"] for r in cold.state.collect()}
    assert 2 in w
    for v in c:
        assert w[v] == pytest.approx(c[v], abs=1e-5)


def test_warm_start_rejected_on_blocked_engine(spark):
    from flexgraph_spark import algorithms

    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    st = spark.createDataFrame([(0, 0.5), (1, 0.5)], "vertex long, value double")
    with pytest.raises(ValueError, match="flat-engine"):
        algorithms.pagerank(e, engine="blocked", p=2, initial_state=st)


def test_cc_warm_start_exact_for_additions(spark):
    """HashMin warm-started from a subgraph's labels (per-vertex upper
    bounds) lands on the identical fixpoint, in no more supersteps:
    warm_k <= cold_k pointwise under the monotone min update, so when
    the cold run reaches the fixpoint the warm run already has."""
    from flexgraph_spark import algorithms

    old_pairs = [(0, 1), (2, 3), (4, 5), (6, 7)]
    new_pairs = old_pairs + [(1, 2), (5, 6)]  # merge {0..3} and {4..7}
    old = spark.createDataFrame(old_pairs, "src long, dst long")
    new = spark.createDataFrame(new_pairs, "src long, dst long")
    base = algorithms.connected_components(old, max_iter=50)
    warm = algorithms.connected_components(
        new, max_iter=50, initial_state=base.state
    )
    cold = algorithms.connected_components(new, max_iter=50)
    w = {r["vertex"]: r["value"] for r in warm.state.collect()}
    c = {r["vertex"]: r["value"] for r in cold.state.collect()}
    assert w == c == {v: 0 for v in range(4)} | {v: 4 for v in range(4, 8)}
    assert warm.converged and warm.iterations <= cold.iterations


def test_weighted_label_propagation_strength_beats_count(spark):
    # vertex 0: one strong (w=10) edge to the {1,2,3}-side's 1, vs two weak
    # (w=1) edges to {4,5}; weighted LP must side with the strong edge
    # where unweighted LP would side with the count.
    edges = [
        (0, 1, 10.0), (1, 2, 5.0), (2, 3, 5.0), (1, 3, 5.0),
        (0, 4, 1.0), (0, 5, 1.0), (4, 5, 1.0),
    ]
    df = fixtures.edges_df(spark, edges, weighted=True)
    res = algorithms.weighted_label_propagation(df, max_iter=10)
    got = _collect_values(res)
    assert got[0] == got[1] == got[2] == got[3]  # strong side wins for 0
    # directed duplicates merge to one undirected strength: (0,1) = 2+3 = 5
    # outvotes (0,2) = 4+0.5 = 4.5 in the first round (the star is
    # bipartite, so sync LP oscillates — assert the single-round vote,
    # which is where the strength comparison lives)
    dup = fixtures.edges_df(
        spark, [(0, 1, 2.0), (1, 0, 3.0), (0, 2, 4.0), (2, 0, 0.5)],
        weighted=True,
    )
    res2 = algorithms.weighted_label_propagation(dup, max_iter=1)
    got2 = _collect_values(res2)
    assert got2[0] == 1
