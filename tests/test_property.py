"""Property-based gates (hypothesis): on RANDOM small digraphs the flat
engine must equal the NumPy reference oracles exactly — the fuzzing
complement to the golden-topology tests in test_gimv.py. Few examples per
property (each is a full Spark job set), but hypothesis explores shapes
the hand-picked fixtures never will: self-contained cliques, multi-edges
(pre-deduped), isolated pairs, long chains, and its shrinker reports the
minimal failing graph if an invariant ever breaks.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from flexgraph_spark import algorithms, fixtures, oracle

# up to 13 vertices / 40 distinct non-loop edges — big enough for hubs,
# cycles and disconnected pieces, small enough for ~seconds per example
_edges = (
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1, max_size=40,
    )
    .map(lambda es: sorted({(a, b) for a, b in es if a != b}))
    .filter(lambda es: len(es) > 0)
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _dense(es):
    """Remap endpoints to [0, n): the NumPy oracles score every id in
    [0, n) (isolated ids included), the engine scores edge endpoints —
    dense ids make the two vertex sets identical."""
    ids = sorted({v for e in es for v in e})
    fwd = {v: i for i, v in enumerate(ids)}
    return [(fwd[a], fwd[b]) for a, b in es], len(ids)


def _vals(res):
    return {r["vertex"]: r["value"] for r in res.state.collect()}


@settings(**_SETTINGS)
@given(es=_edges)
def test_pagerank_matches_oracle_on_random_graphs(spark, es):
    es, n = _dense(es)
    df = fixtures.edges_df(spark, es)
    got = _vals(algorithms.pagerank(df, max_iter=40))
    exp = oracle.pagerank(es, n, max_iter=40)
    assert sorted(got) == list(range(n))
    assert np.allclose(
        [got[v] for v in range(n)], [exp[v] for v in range(n)], atol=1e-6
    )


@settings(**_SETTINGS)
@given(es=_edges)
def test_cc_matches_oracle_on_random_graphs(spark, es):
    es, n = _dense(es)
    df = fixtures.edges_df(spark, es)
    res = algorithms.connected_components(df)
    assert res.converged
    got = _vals(res)
    exp = oracle.connected_components(es + [(b, a) for a, b in es], n)
    for v, lbl in got.items():
        assert lbl == exp[v]


@settings(**_SETTINGS)
@given(es=_edges, seed=st.integers(0, 2**16))
def test_sssp_matches_oracle_on_random_weighted_graphs(spark, es, seed):
    es, n = _dense(es)
    rng = np.random.RandomState(seed)
    wes = [(a, b, float(rng.randint(1, 9))) for a, b in es]
    src = wes[0][0]
    df = fixtures.edges_df(spark, wes, weighted=True)
    res = algorithms.sssp(df, source_vertex=src)
    assert res.converged
    got = _vals(res)
    exp = oracle.sssp(wes, n, src)
    for v, d in got.items():
        assert d == pytest.approx(exp[v]), f"vertex {v}"


@settings(**_SETTINGS)
@given(es=_edges, dense_threshold=st.sampled_from([0, 2, 1000]))
def test_blocked_equals_flat_on_random_graphs(spark, es, dense_threshold):
    """The skew engine's dense/sparse split must be invisible: blocked
    PageRank and CC agree with the flat plan on random graphs at every
    threshold regime (0 = all-dense, 2 = mixed, 1000 = all-sparse)."""
    from flexgraph_spark import blocks, gimv

    es, n = _dense(es)
    df = fixtures.edges_df(spark, es)
    flat_pr = _vals(algorithms.pagerank(df, max_iter=20))
    blk_pr = _vals(
        blocks.run_blocked(
            df, gimv.PageRank(), p=3,
            dense_threshold=dense_threshold, max_iter=20,
        )
    )
    assert set(flat_pr) == set(blk_pr)
    for v in flat_pr:
        assert flat_pr[v] == pytest.approx(blk_pr[v], abs=1e-9), v

    flat_cc = _vals(algorithms.connected_components(df))
    blk_cc = _vals(
        blocks.run_blocked(
            df.select("src", "dst")
            .union(df.select(df.dst.alias("src"), df.src.alias("dst")))
            .distinct(),
            gimv.ConnectedComponents(), p=3,
            dense_threshold=dense_threshold, max_iter=60,
        )
    )
    for v in flat_cc:
        assert flat_cc[v] == blk_cc[v], v


@settings(**_SETTINGS)
@given(es=_edges, seed=st.integers(0, 2**16),
       dense_threshold=st.sampled_from([0, 2, 1000]))
def test_blocked_temporal_equals_flat_on_random_graphs(
    spark, es, seed, dense_threshold
):
    """Earliest arrival (conditional combine2) and fastest path (batch of
    conditional columns) must agree between engines on random TEMPORAL
    multigraphs — every (src, dst) pair gets TWO parallel edges at
    different timestamps, the case a dedup-happy block builder would
    corrupt."""
    from flexgraph_spark.gimv import SSSP_INF

    es, n = _dense(es)
    rng = np.random.RandomState(seed)
    tes = [(a, b, float(t)) for a, b in es
           for t in rng.choice(20, size=2, replace=False)]
    df = spark.createDataFrame(tes, "src long, dst long, t double")
    src = tes[0][0]
    flat = algorithms.earliest_arrival(df, src, max_iter=30)
    blk = algorithms.earliest_arrival(
        df, src, max_iter=30, engine="blocked",
        p=3, dense_threshold=dense_threshold,
    )
    f = {r.vertex: r.value for r in flat.state.collect()}
    b = {r.vertex: r.value for r in blk.state.collect()}
    assert set(f) == set(b)
    for v in f:
        assert f[v] == pytest.approx(b[v], abs=0.0), v
    ff = {r.vertex: r.duration
          for r in algorithms.fastest_path(df, src, max_iter=30).collect()}
    fb = {r.vertex: r.duration
          for r in algorithms.fastest_path(
              df, src, max_iter=30, engine="blocked",
              p=3, dense_threshold=dense_threshold,
          ).collect()}
    assert ff == fb


@settings(**_SETTINGS)
@given(es=_edges, seed=st.integers(0, 2**16),
       dense_threshold=st.sampled_from([0, 2, 1000]))
def test_blocked_batch_min_equals_flat_on_random_graphs(
    spark, es, seed, dense_threshold
):
    """The batch kernel family under the min reduce (landmark distances)
    must match the flat array-state plan exactly on random weighted
    digraphs at every dense/sparse regime — including the delta-messaging
    identity trick (inactive rows collapse to all-inf)."""
    es, n = _dense(es)
    rng = np.random.RandomState(seed)
    wes = [(a, b, float(rng.randint(1, 9))) for a, b in es]
    df = fixtures.edges_df(spark, wes, weighted=True)
    lms = sorted({a for a, _, _ in wes})[:3]
    flat = algorithms.landmark_distances(df, lms, max_iter=30)
    blk = algorithms.landmark_distances(
        df, lms, max_iter=30, engine="blocked",
        p=3, dense_threshold=dense_threshold,
    )
    f = {(r.vertex, r.landmark): r.dist
         for r in algorithms.landmark_long(flat, lms).collect()}
    b = {(r.vertex, r.landmark): r.dist
         for r in algorithms.landmark_long(blk, lms).collect()}
    assert set(f) == set(b)
    for k in f:
        assert f[k] == pytest.approx(b[k], abs=0.0), k


@given(es=_edges)
@settings(**_SETTINGS)
def test_bridges_match_tarjan_on_random_graphs(spark, es):
    """XOR-coverage bridges == plain-python Tarjan low-link on random
    digraphs (direction ignored — bridges are an undirected property)."""
    from flexgraph_spark.oracle import py_bridges as _py_bridges

    df = fixtures.edges_df(spark, es)
    got = {(r.a, r.b) for r in algorithms.bridges(df).collect()}
    assert got == _py_bridges(es)


@given(es=_edges, seed=st.integers(0, 5))
@settings(**_SETTINGS)
def test_influence_matches_live_edge_bfs_on_random_graphs(spark, es, seed):
    from flexgraph_spark.algorithms import INFLUENCE_MOD

    es, n = _dense(es)
    seeds = [v for v in range(n) if v % 3 == 0]
    p, max_hops = 0.6, 4
    cutoff = int(p * INFLUENCE_MOD)
    adj = {}
    for s, d in es:
        if (s * 2654435761 + d * 40503 + seed * 97003) % INFLUENCE_MOD < cutoff:
            adj.setdefault(s, []).append(d)
    dist = {v: 0 for v in seeds}
    frontier = list(seeds)
    for h in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    df = fixtures.edges_df(spark, es)
    sdf = spark.createDataFrame([(v,) for v in seeds], "vertex long")
    got = {r.vertex: r.hops for r in algorithms.influence_spread(
        df, sdf, p=p, cascade_seed=seed, max_hops=max_hops).collect()}
    assert got == dist


@given(_edges, st.data())
@settings(**_SETTINGS)
def test_decremental_sssp_repair_equals_cold(spark, es, data):
    """On a random weighted graph, delete a random edge subset: the
    Ramalingam-Reps affected-closure reset + warm min-plus relaxation
    must equal a cold run on the surviving edges — the exactness claim
    behind streaming_sssp_maintenance's delete path, fuzzed."""
    from flexgraph_spark.streaming import _sssp_delete_reset

    w = [(a, b, float(1 + (a * 7 + b * 3) % 5)) for a, b in es]
    k = data.draw(st.integers(0, len(w)))
    idx = data.draw(st.permutations(range(len(w))))
    deleted = [w[i] for i in idx[:k]]
    live = [w[i] for i in idx[k:]]
    schema = "src long, dst long, weight double"
    full_df = spark.createDataFrame(w, schema)
    pd_full = algorithms.sssp(full_df, source_vertex=es[0][0]).state
    if live:
        live_df = spark.createDataFrame(live, schema)
        dels_df = spark.createDataFrame(deleted or [(0, 0, 0.0)], schema) \
            if deleted else spark.createDataFrame([], schema)
        reset = _sssp_delete_reset(es[0][0])
        init = reset(pd_full, dels_df, live_df) if deleted else pd_full
        warm = algorithms.sssp(live_df, source_vertex=es[0][0],
                               initial_state=init)
        cold = algorithms.sssp(live_df, source_vertex=es[0][0])
        got = {r["vertex"]: r["value"] for r in warm.state.collect()}
        want = {r["vertex"]: r["value"] for r in cold.state.collect()}
        assert got == want


@given(_edges, st.data())
@settings(**_SETTINGS)
def test_weight_change_repair_equals_cold(spark, es, data):
    """Round-5 delete semantics fuzz: a weight-CHANGING re-add acts as
    delete+insert (the maintenance scaffold derives effective deletions
    as live-before MINUS live-after on the full edge columns, carrying
    the PRE-batch weight). Raise some weights, lower others at random;
    reset with the pre-change rows as dels over the post-change live set
    — warm relaxation must equal a cold run on the new weights (raises
    are the dangerous direction; lowers over-reset harmlessly)."""
    from flexgraph_spark.streaming import _sssp_delete_reset

    w = [(a, b, float(1 + (a * 7 + b * 3) % 5)) for a, b in es]
    k = data.draw(st.integers(0, len(w)))
    idx = data.draw(st.permutations(range(len(w))))
    changed = set(idx[:k])
    new_w = [
        (a, b, (wt + 3.0) if a % 2 == 0 else 1.0) if i in changed
        else (a, b, wt)
        for i, (a, b, wt) in enumerate(w)
    ]
    schema = "src long, dst long, weight double"
    src = es[0][0]
    pd_full = algorithms.sssp(
        spark.createDataFrame(w, schema), source_vertex=src).state
    live_df = spark.createDataFrame(new_w, schema)
    dels = [w[i] for i in changed if w[i][2] != new_w[i][2]]
    if dels:
        init = _sssp_delete_reset(src)(
            pd_full, spark.createDataFrame(dels, schema), live_df)
    else:
        init = pd_full
    warm = algorithms.sssp(live_df, source_vertex=src, initial_state=init)
    cold = algorithms.sssp(live_df, source_vertex=src)
    got = {r["vertex"]: r["value"] for r in warm.state.collect()}
    want = {r["vertex"]: r["value"] for r in cold.state.collect()}
    assert got == want


@given(_edges, st.data())
@settings(**_SETTINGS)
def test_decremental_cc_repair_equals_cold(spark, es, data):
    """Random graph, random delete subset: component cold-restart of the
    affected components + HashMin warm start must equal a cold CC on the
    surviving edges."""
    from flexgraph_spark.streaming import _cc_delete_reset

    k = data.draw(st.integers(0, len(es)))
    idx = data.draw(st.permutations(range(len(es))))
    deleted = [es[i] for i in idx[:k]]
    live = [es[i] for i in idx[k:]]
    if not live:
        return
    schema = "src long, dst long"
    pd_full = algorithms.connected_components(
        spark.createDataFrame(es, schema)).state
    live_df = spark.createDataFrame(live, schema)
    if deleted:
        dels_df = spark.createDataFrame(deleted, schema)
        init = _cc_delete_reset(pd_full, dels_df, live_df)
    else:
        init = pd_full
    warm = algorithms.connected_components(live_df, initial_state=init)
    cold = algorithms.connected_components(live_df)
    got = {r["vertex"]: int(r["value"]) for r in warm.state.collect()}
    want = {r["vertex"]: int(r["value"]) for r in cold.state.collect()}
    assert got == want


@given(es=_edges)
@settings(**_SETTINGS)
def test_articulation_and_bcc_match_tarjan_on_random_graphs(spark, es):
    """Tarjan-Vishkin aux-graph biconnectivity == plain-python Tarjan
    (low-link cut vertices AND edge-stack blocks) on random graphs —
    one engine pass feeds both assertions."""
    from flexgraph_spark.oracle import py_articulation, py_biconnected

    df = fixtures.edges_df(spark, es)
    got_arts = {r.vertex for r in
                algorithms.articulation_points(df).collect()}
    assert got_arts == py_articulation(es)
    rows = algorithms.biconnected_components(df).collect()
    groups = {}
    for r in rows:
        groups.setdefault(r.bcc_id, set()).add((r.a, r.b))
    got_blocks = {frozenset(g) for g in groups.values()}
    assert got_blocks == {frozenset(b) for b in py_biconnected(es)}


@settings(**_SETTINGS)
@given(es=_edges, seed=st.integers(0, 2**16),
       dense_threshold=st.sampled_from([0, 2, 1000]))
def test_blocked_struct_and_label_kernels_equal_flat(
    spark, es, seed, dense_threshold
):
    """Round-5 extension of the blocked≡flat gate to the last two kernel
    families that ran flat-only: FaBP (struct state → batch k=2 with the
    message-delivered degree, gimv.FaBPPredicate) and WEIGHTED label
    propagation (label_count with weight-sum votes). Random graphs,
    random ±1 priors on a random modulus, random integer weights, every
    threshold regime."""
    from pyspark.sql import functions as F

    es, n = _dense(es)
    rng = np.random.RandomState(seed)
    mod = int(rng.randint(2, 7))

    # --- FaBP: predicate-blocked vs DataFrame-priors flat ---
    df = fixtures.edges_df(spark, es)
    verts = (
        df.select(F.col("src").alias("vertex"))
        .union(df.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    priors = verts.select(
        "vertex",
        F.when(F.col("vertex") % mod == 0, 1.0)
        .when(F.col("vertex") % mod == 1, -1.0)
        .otherwise(0.0).alias("prior"),
    )

    def prior_np(ids):
        return np.where(ids % mod == 0, 1.0,
                        np.where(ids % mod == 1, -1.0, 0.0))

    flat = _vals(algorithms.fabp(df, priors, h=0.02, max_iter=6,
                                 threshold=0.0))
    blk = _vals(algorithms.fabp(
        df, prior_pred=prior_np, h=0.02, max_iter=6, threshold=0.0,
        engine="blocked", p=3, dense_threshold=dense_threshold,
    ))
    # blocked state covers all of [0, n) (phantom isolated ids included);
    # compare on the flat (graph-vertex) set
    for v in flat:
        assert flat[v] == pytest.approx(blk[v], abs=1e-12), v

    # --- weighted LP: blocked weighted label_count vs flat ---
    wes = [(a, b, float(rng.randint(1, 5))) for a, b in es]
    wdf = fixtures.edges_df(spark, wes, weighted=True)
    flat_lp = _vals(algorithms.weighted_label_propagation(wdf, max_iter=4))
    blk_lp = _vals(algorithms.weighted_label_propagation(
        wdf, max_iter=4, engine="blocked",
        p=3, dense_threshold=dense_threshold,
    ))
    for v in flat_lp:
        assert flat_lp[v] == blk_lp[v], v

    # --- power iteration: deferred-normalization blocked vs per-step flat
    fx, flam, _ = algorithms.power_iteration(df, max_iter=4)
    bx, blam, _ = algorithms.power_iteration(
        df, max_iter=4, engine="blocked", p=3,
        dense_threshold=dense_threshold,
    )
    fd = {r.vertex: r.value for r in fx.collect()}
    bd = {r.vertex: r.value for r in bx.collect()}
    assert set(fd) == set(bd)
    assert flam == pytest.approx(blam, rel=1e-9)
    for v in fd:
        assert fd[v] == pytest.approx(bd[v], abs=1e-9), v

    # --- HITS + SALSA: vertex-doubling/parity-masking blocked vs the
    # flat alternating half-step loops (the Gauss–Seidel order must
    # survive the doubling — a Jacobi-simultaneous bug diverges fast)
    for fn in (algorithms.hits, algorithms.salsa):
        fhs = {r.vertex: (r.hub, r.auth)
               for r in fn(df, max_iter=3).state.collect()}
        bhs = {r.vertex: (r.hub, r.auth)
               for r in fn(df, max_iter=3, engine="blocked", p=3,
                           dense_threshold=dense_threshold).state.collect()}
        assert set(fhs) == set(bhs)
        for v in fhs:
            assert fhs[v][0] == pytest.approx(bhs[v][0], abs=1e-9), v
            assert fhs[v][1] == pytest.approx(bhs[v][1], abs=1e-9), v
