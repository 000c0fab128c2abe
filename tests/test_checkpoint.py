"""M3: durable per-iteration checkpointing, manifest lineage, and resume.

North-rule requirement: every iteration checkpoints vertex-state with
per-partition lineage + metrics so runs resume mid-computation. The
reference keeps no durable iteration state (SURVEY.md §3 — its pv/dv
intermediates are deleted at per-iteration barriers); this is new-engine
behavior, so the tests are behavioral, not parity."""

import json

import pytest

from flexgraph_spark import algorithms, fixtures, gimv
from flexgraph_spark.checkpoint import Checkpointer, edges_fingerprint


@pytest.fixture()
def edges(spark):
    return fixtures.edges_df(spark, fixtures.topology("two_components"))


def test_manifest_records_metrics(spark, edges, tmp_path):
    ck = Checkpointer(str(tmp_path), input_fingerprint=edges_fingerprint(edges))
    res = algorithms.connected_components(edges, checkpointer=ck)
    assert res.converged
    rows = ck.manifest_rows("cc")
    assert len(rows) == res.iterations
    for r in rows:
        assert r["state_path"]
        assert r["input_fingerprint"]
        assert r["messages_shuffled"] >= 0
        assert "seconds" in r and "changed" in r and "edges_scanned" in r


def test_resume_skips_completed_iterations(spark, edges, tmp_path):
    """Kill after iteration k (simulated via max_iter), relaunch, verify the
    final state is identical and iterations 1..k are not recomputed."""
    fp = edges_fingerprint(edges)

    full = algorithms.connected_components(edges, max_iter=50)
    expected = {r["vertex"]: r["value"] for r in full.state.collect()}

    ck = Checkpointer(str(tmp_path), input_fingerprint=fp)
    partial = algorithms.connected_components(edges, max_iter=2, checkpointer=ck)
    assert not partial.converged

    ck2 = Checkpointer(str(tmp_path), input_fingerprint=fp)
    resumed = algorithms.connected_components(edges, max_iter=50, checkpointer=ck2)
    assert resumed.converged
    got = {r["vertex"]: r["value"] for r in resumed.state.collect()}
    assert got == expected
    # resumed run started at iteration 3: its first recorded metric row
    # (appended to the same manifest) has iteration > 2
    rows = ck2.manifest_rows("cc")
    resumed_rows = rows[2:]
    assert resumed_rows and min(r["iteration"] for r in resumed_rows) == 3


def test_blocked_resume_skips_completed_iterations(spark, tmp_path):
    """Blocked-engine durable resume: kill after iteration k, relaunch,
    verify identical final state and that iterations 1..k are skipped.
    (Round-1 gap: run_blocked accepted a checkpointer but never saved.)"""
    e = fixtures.rand_er(40, 0.1, seed=42)
    edges = fixtures.edges_df(spark, e)
    fp = edges_fingerprint(edges)

    full = algorithms.pagerank(edges, max_iter=40, engine="blocked", p=4)
    expected = {r["vertex"]: r["value"] for r in full.state.collect()}

    ck = Checkpointer(str(tmp_path), input_fingerprint=fp)
    partial = algorithms.pagerank(
        edges, max_iter=3, engine="blocked", p=4, checkpointer=ck
    )
    assert not partial.converged
    assert len(ck.manifest_rows("pagerank_blocked")) == 3

    ck2 = Checkpointer(str(tmp_path), input_fingerprint=fp)
    resumed = algorithms.pagerank(
        edges, max_iter=40, engine="blocked", p=4, checkpointer=ck2
    )
    got = {r["vertex"]: r["value"] for r in resumed.state.collect()}
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-12, k
    rows = ck2.manifest_rows("pagerank_blocked")
    resumed_rows = rows[3:]
    assert resumed_rows and min(r["iteration"] for r in resumed_rows) == 4


def test_batch_state_resume_both_engines(spark, tmp_path):
    """Array-valued (batch) state survives kill/resume on BOTH engines:
    flat landmark distances checkpoint the array column + _active flag;
    blocked ones checkpoint the flattened (n_local x k) matrix and
    recompute hub sigs on resume. Final long-form outputs must equal the
    uninterrupted run exactly."""
    import numpy as np
    rng = np.random.RandomState(5)
    wes = sorted({(int(a), int(b)) for a, b in rng.randint(0, 30, size=(120, 2)) if a != b})
    wes = [(a, b, float(rng.randint(1, 9))) for a, b in wes]
    edges = fixtures.edges_df(spark, wes, weighted=True)
    fp = edges_fingerprint(edges)
    lms = [0, 1, 2]

    def long(res):
        return {(r.vertex, r.landmark): r.dist
                for r in algorithms.landmark_long(res, lms).collect()}

    expected = long(algorithms.landmark_distances(edges, lms, max_iter=30))

    for engine, kw, job in (
        ("flat", {}, "batch_sssp"),
        ("blocked", {"p": 3, "dense_threshold": 2}, "batch_sssp_blocked"),
    ):
        ck = Checkpointer(str(tmp_path / engine), input_fingerprint=fp)
        partial = algorithms.landmark_distances(
            edges, lms, max_iter=2, engine=engine, checkpointer=ck, **kw
        )
        assert len(ck.manifest_rows(job)) == 2
        ck2 = Checkpointer(str(tmp_path / engine), input_fingerprint=fp)
        resumed = algorithms.landmark_distances(
            edges, lms, max_iter=30, engine=engine, checkpointer=ck2, **kw
        )
        assert long(resumed) == expected, engine
        rows = ck2.manifest_rows(job)
        assert min(r["iteration"] for r in rows[2:]) == 3, engine


def test_resume_refuses_other_input(spark, edges, tmp_path):
    ck = Checkpointer(str(tmp_path), input_fingerprint="fp-a")
    algorithms.connected_components(edges, max_iter=2, checkpointer=ck)
    ck2 = Checkpointer(str(tmp_path), input_fingerprint="fp-b")
    with pytest.raises(ValueError, match="fingerprint"):
        ck2.resume("cc")


def test_checkpoint_gc_keeps_last(spark, edges, tmp_path):
    ck = Checkpointer(str(tmp_path), keep_last=2)
    algorithms.connected_components(edges, max_iter=5, checkpointer=ck)
    iters = sorted((tmp_path / "cc").glob("iter=*"))
    assert len(iters) <= 3  # current + keep_last


def test_fingerprint_order_insensitive(spark):
    a = fixtures.edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    b = fixtures.edges_df(spark, [(2, 3), (0, 1), (1, 2)])
    c = fixtures.edges_df(spark, [(0, 1), (1, 2), (2, 4)])
    assert edges_fingerprint(a) == edges_fingerprint(b)
    assert edges_fingerprint(a) != edges_fingerprint(c)


def test_standard_pagerank_resume_with_global_agg(spark, tmp_path):
    """Struct-state program using the global_agg hook (dangling mass)
    resumes mid-run to the identical fixed-depth answer — the broadcast
    global scalar is rebuilt from the restored state, not from lineage."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 3), (4, 0)], "src long, dst long"
    )  # vertex 3 is a sink: the dangling mass is nonzero every superstep
    fp = edges_fingerprint(edges)

    full = algorithms.pagerank_standard(edges, threshold=0.0, max_iter=6)
    expected = {r["vertex"]: r["value"] for r in full.state.collect()}

    ck = Checkpointer(str(tmp_path), input_fingerprint=fp)
    partial = algorithms.pagerank_standard(
        edges, threshold=0.0, max_iter=2, checkpointer=ck
    )
    assert not partial.converged

    ck2 = Checkpointer(str(tmp_path), input_fingerprint=fp)
    resumed = algorithms.pagerank_standard(
        edges, threshold=0.0, max_iter=6, checkpointer=ck2
    )
    got = {r["vertex"]: r["value"] for r in resumed.state.collect()}
    assert set(got) == set(expected)
    for v, val in expected.items():
        assert got[v] == pytest.approx(val, abs=1e-12)
    rows = ck2.manifest_rows("standard_pagerank")
    assert min(r["iteration"] for r in rows[2:]) == 3
