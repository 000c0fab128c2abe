"""Round-3 graph algorithms: HITS, k-core, local clustering coefficient.

Golden values are hand-derived or NumPy-recomputed with the identical
recurrence — the driver's DuckDB gate covers the sf0.01 scale."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flexgraph_spark import algorithms, gimv


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_hits_matches_numpy_power_iteration(spark):
    """4 iterations of the exact engine recurrence, recomputed densely."""
    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (1, 3)]
    res = algorithms.hits(_edges(spark, pairs), max_iter=4)
    got = {r["vertex"]: (r["hub"], r["auth"]) for r in res.state.collect()}

    n = 4
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = 1.0
    hub = np.ones(n)
    for _ in range(4):
        auth = A.T @ hub
        nrm = np.sqrt((auth**2).sum())
        auth = auth / (nrm if nrm > 0 else 1.0)
        hub = A @ auth
        nrm = np.sqrt((hub**2).sum())
        hub = hub / (nrm if nrm > 0 else 1.0)
    for v in range(n):
        assert got[v][0] == pytest.approx(hub[v], abs=1e-9)
        assert got[v][1] == pytest.approx(auth[v], abs=1e-9)
    assert res.iterations == 4


def test_hits_empty_graph(spark):
    res = algorithms.hits(_edges(spark, []), max_iter=3)
    assert res.state.count() == 0 and res.converged


def test_kcore_peels_tail_keeps_triangle(spark):
    """Triangle + pendant path: the 2-core is exactly the triangle, and the
    path peels over MULTIPLE rounds (4 -> 3 cascades)."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    res = algorithms.kcore(_edges(spark, pairs), k=2, max_rounds=10)
    assert sorted(r["vertex"] for r in res.state.collect()) == [0, 1, 2]
    assert res.converged
    assert res.iterations >= 3  # vertex 4 dies round 1, then 3, then fixpoint


def test_kcore_capped_rounds_match_unrolled(spark):
    """Capping max_rounds equals the same-depth unroll (the oracle
    contract): one round removes only degree-1 vertices."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    res = algorithms.kcore(_edges(spark, pairs), k=2, max_rounds=1)
    # after exactly one round: vertex 4 (deg 1) gone, others still alive
    assert sorted(r["vertex"] for r in res.state.collect()) == [0, 1, 2, 3]
    assert not res.converged


def test_kcore_everything_survives(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    res = algorithms.kcore(_edges(spark, pairs), k=2, max_rounds=5)
    assert sorted(r["vertex"] for r in res.state.collect()) == [0, 1, 2]
    assert res.converged and res.iterations == 1


def test_local_clustering_triangle_plus_pendant(spark):
    """Triangle 0-1-2 plus pendant edge 2-3 (direction/duplicates ignored)."""
    pairs = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2)]
    rows = {
        r["vertex"]: r
        for r in algorithms.local_clustering(_edges(spark, pairs)).collect()
    }
    assert rows[0]["degree"] == 2 and rows[0]["triangles"] == 1
    assert rows[0]["lcc"] == pytest.approx(1.0)
    assert rows[1]["lcc"] == pytest.approx(1.0)
    assert rows[2]["degree"] == 3 and rows[2]["triangles"] == 1
    assert rows[2]["lcc"] == pytest.approx(1.0 / 3.0)
    assert rows[3]["degree"] == 1 and rows[3]["triangles"] == 0
    assert rows[3]["lcc"] == 0.0


def test_local_clustering_consistent_with_triangle_count(spark):
    """Σ per-vertex triangles == 3 × global triangle count."""
    rng = np.random.default_rng(7)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 30, size=(200, 2)) if a != b}
    e = _edges(spark, sorted(pairs))
    total = algorithms.triangle_count(e)
    per_v = algorithms.local_clustering(e).agg({"triangles": "sum"}).first()[0]
    assert per_v == 3 * total


def test_batch_ppr_columns_match_single_source_rwr(spark):
    """Each column of the batched array state reproduces the scalar RWR
    run bit-exactly (same recurrence, same normalization)."""
    pairs = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (2, 4)]
    e = _edges(spark, pairs)
    res = algorithms.batch_ppr(e, [1, 4], max_iter=10)
    long = algorithms.ppr_long(res, [1, 4])
    batch = {(r.source, r.vertex): r.ppr for r in long.collect()}
    for s in (1, 4):
        single = {
            r.vertex: r.value
            for r in algorithms.pagerank(e, max_iter=10, source_vertex=s).state.collect()
        }
        for v, val in single.items():
            assert batch[(s, v)] == pytest.approx(val, rel=1e-12)


def test_batch_ppr_requires_sources(spark):
    with pytest.raises(ValueError):
        algorithms.batch_ppr(_edges(spark, [(1, 2)]), [])


def test_landmark_distances_match_single_source_sssp(spark):
    """Each column of the batched min-plus array state reproduces the
    scalar SSSP run exactly, including unreached handling; the long face
    drops unreached (vertex, landmark) pairs."""
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0), (2, 3, 1.0), (4, 0, 1.0),
         (5, 6, 1.0)],  # 5,6 unreachable from {0, 2}
        "src long, dst long, weight double",
    )
    lms = [0, 2]
    res = algorithms.landmark_distances(edges, lms, max_iter=20)
    assert res.converged
    long = algorithms.landmark_long(res, lms)
    batch = {(r.landmark, r.vertex): r.dist for r in long.collect()}
    from flexgraph_spark.gimv import SSSP_INF
    for s in lms:
        single = {
            r.vertex: r.value
            for r in algorithms.sssp(edges, s, max_iter=20).state.collect()
        }
        for v, d in single.items():
            if d < SSSP_INF:
                assert batch[(s, v)] == pytest.approx(d, abs=0.0)
            else:
                assert (s, v) not in batch
    # unweighted face: hop counts (multi-source BFS)
    hops = algorithms.landmark_long(
        algorithms.landmark_distances(edges.select("src", "dst"), [0]), [0]
    )
    got = {r.vertex: r.dist for r in hops.collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 1.0, 3: 2.0}  # 0->2 edge is 1 hop


def test_landmark_distances_requires_sources(spark):
    with pytest.raises(ValueError):
        algorithms.landmark_distances(_edges(spark, [(1, 2)]), [])


def test_earliest_arrival_respects_time_order(spark):
    """The classic temporal trap: a path that is shorter in hops but whose
    edge times run BACKWARD is not traversable. 0-(t=5)->1-(t=3)->2 is
    dead (3 < 5); 0-(t=1)->3-(t=4)->2 works. Parallel edges at different
    times are distinct opportunities."""
    from flexgraph_spark.gimv import SSSP_INF
    edges = spark.createDataFrame(
        [
            (0, 1, 5.0), (1, 2, 3.0),          # backward in time at hop 2
            (0, 3, 1.0), (3, 2, 4.0),          # feasible route to 2
            (1, 4, 5.0),                        # same-time hop: t >= arr ok
            (0, 5, 0.5), (0, 5, 7.0),          # parallel edges: early wins
            (6, 0, 9.0),                        # into the source: no effect
        ],
        "src long, dst long, t double",
    )
    res = algorithms.earliest_arrival(edges, 0, start_time=0.0, max_iter=20)
    assert res.converged
    got = {r.vertex: r.value for r in res.state.collect()}
    assert got[0] == 0.0
    assert got[1] == 5.0
    assert got[2] == 4.0          # via 3, NOT via the backward 1->2 edge
    assert got[3] == 1.0
    assert got[4] == 5.0          # departs 1 at t=5 == arrival(1)
    assert got[5] == 0.5          # earliest of the parallel edges
    assert got[6] == SSSP_INF     # never reached
    # start_time gates the first departure too
    late = algorithms.earliest_arrival(edges, 0, start_time=2.0, max_iter=20)
    got2 = {r.vertex: r.value for r in late.state.collect()}
    assert got2[5] == 7.0         # the t=0.5 edge left before we started
    assert got2[3] == SSSP_INF    # t=1 < start 2
    assert got2[2] == SSSP_INF    # only route ran through 3
    # frontier decay: messages shrink as arrivals settle (delta messaging)
    msgs = [m.messages_shuffled for m in res.metrics]
    assert msgs[-1] == 0

def test_earliest_arrival_requires_time_column(spark):
    with pytest.raises(ValueError):
        algorithms.earliest_arrival(_edges(spark, [(1, 2)]), 1)


def test_latest_departure_duality_and_deadline(spark):
    """Brute-force check on a hand graph: departure(v) is the max edge
    time t at v over feasible routes, and the deadline genuinely binds."""
    edges = spark.createDataFrame(
        [
            (0, 9, 5.0),                       # direct, late
            (0, 1, 1.0), (1, 9, 3.0),          # two-hop, earlier start
            (2, 0, 0.5),                        # must leave 2 at 0.5 to catch 0's t=1
            (3, 9, 99.0),                       # after any deadline <= 98
        ],
        "src long, dst long, t double",
    )
    got = {r.vertex: r.departure
           for r in algorithms.latest_departure(edges, 9, deadline=10.0).collect()}
    assert got[9] == 10.0          # at the target: leave = deadline
    assert got[0] == 5.0           # direct t=5 beats the t=1 two-hop start
    assert got[1] == 3.0
    assert got[2] == 0.5
    assert 3 not in got            # t=99 > deadline
    tight = {r.vertex: r.departure
             for r in algorithms.latest_departure(edges, 9, deadline=4.0).collect()}
    assert tight[0] == 1.0         # the t=5 edge now misses the deadline
    # duality sanity: every departing vertex can earliest-arrive by deadline
    for v, dep in tight.items():
        if v == 9:
            continue
        arr = {r.vertex: r.value
               for r in algorithms.earliest_arrival(edges, int(v), start_time=dep)
               .state.collect()}
        assert arr[9] <= 4.0


def test_landmark_estimates_upper_bound(spark):
    """On a symmetrized graph, est(u, v) >= d(u, v) (triangle inequality)
    with equality when a landmark sits on a shortest path."""
    from flexgraph_spark.graph import symmetrize
    edges = symmetrize(spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (0, 4, 10.0)],
        "src long, dst long, weight double",
    ))
    res = algorithms.landmark_distances(edges, [2], max_iter=20)
    pairs = spark.createDataFrame([(0, 4), (1, 3), (0, 1)], "u long, v long")
    est = {(r.u, r.v): r.est for r in algorithms.landmark_estimates(res, pairs).collect()}
    assert est[(0, 4)] == 4.0      # through the landmark: exact (d=4 via path)
    assert est[(1, 3)] == 2.0      # landmark on the shortest path: exact
    assert est[(0, 1)] == 3.0      # d=1 but the bound detours via 2: still >= d


def test_double_sweep_path_graph(spark):
    """On P5 (0-1-2-3-4) the sweep starts at 0 (already peripheral),
    reaches 4 at distance 4, and the bound equals the true diameter.
    Starting mid-path still certifies the full diameter — the point of
    the second sweep."""
    path = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    row = algorithms.double_sweep(path).first()
    assert (row.start, row.peripheral) == (0, 4)
    assert row.ecc_start == 4.0 and row.diameter_lb == 4.0
    mid = algorithms.double_sweep(path, start_vertex=2).first()
    assert mid.ecc_start == 2.0 and mid.diameter_lb == 4.0
    assert mid.peripheral == 0  # tie between 0 and 4 -> lowest id


def test_wl_graph_hash_invariance(spark):
    """The fingerprint is invariant to vertex relabeling (isomorphism)
    and differs for structurally different graphs."""
    tri_plus_tail = [(0, 1), (1, 2), (2, 0), (2, 3)]
    relabeled = [(7, 5), (5, 9), (9, 7), (9, 4)]
    path4 = [(0, 1), (1, 2), (2, 3)]
    def fp(pairs):
        res = algorithms.wl_colors(_edges(spark, pairs), rounds=3)
        return algorithms.wl_graph_hash(res).first().fingerprint
    assert fp(tri_plus_tail) == fp(relabeled)
    assert fp(tri_plus_tail) != fp(path4)


def test_kcenter_farthest_first(spark):
    """Two 'cities' (stars at 0 and 10) joined by a long path: k=2 must
    pick one center per city (the farthest-first guarantee), and a
    disconnected triangle gets covered FIRST at k=2 on the 3-component
    variant (unreached = infinitely far)."""
    city_a = [(0, i) for i in (1, 2, 3)]
    city_b = [(10, i) for i in (11, 12, 13)]
    bridge = [(3, 20), (20, 21), (21, 22), (22, 11)]
    g = _edges(spark, city_a + city_b + bridge)
    got = {r.vertex: (r.center, r.dist) for r in algorithms.kcenter(g, k=2).collect()}
    centers = {c for c, _ in got.values()}
    assert len(centers) == 2 and 0 in centers
    other = (centers - {0}).pop()
    assert other in (10, 11, 12, 13)          # deep inside city B
    assert got[0] == (0, 0.0) and got[1][0] == 0
    # radius is far below the single-center eccentricity
    assert max(d for _, d in got.values()) <= 4.0
    # with a disconnected triangle, k=2's second center lands in it
    iso = [(30, 31), (31, 32), (30, 32)]
    g2 = _edges(spark, city_a + iso)
    got2 = {r.vertex: r.center for r in algorithms.kcenter(g2, k=2).collect()}
    assert got2[30] == 30 and got2[31] == 30 and got2[0] == 0
    with pytest.raises(ValueError):
        algorithms.kcenter(g, k=0)


def test_fastest_path_departure_choice(spark):
    """The fastest route may require LEAVING LATER: departing 0 at t=10
    reaches 2 in 2 time units via the t=10/t=12 chain, while the t=0
    departure crawls (arrive 2 at t=8, duration 8). Earliest arrival
    alone cannot see this — the batch over departures can."""
    edges = spark.createDataFrame(
        [
            (0, 1, 0.0), (1, 2, 8.0),       # early departure: duration 8
            (0, 1, 10.0), (1, 2, 12.0),     # late departure: duration 2
            (0, 3, 0.0),                     # reached only from the t=0 start
        ],
        "src long, dst long, t double",
    )
    got = {r.vertex: r.duration
           for r in algorithms.fastest_path(edges, 0).collect()}
    assert got[0] == 0.0
    assert got[1] == 0.0          # depart at t, arrive at t (dur=0 hops)
    assert got[2] == 2.0          # the late chain wins
    assert got[3] == 0.0
    # capping departures to 1 keeps only the earliest start (t=0): the
    # late chain disappears and 2's duration degrades to 8
    capped = {r.vertex: r.duration
              for r in algorithms.fastest_path(edges, 0, max_departures=1).collect()}
    assert capped[2] == 8.0
    # isolated source: just itself at duration 0
    lone = algorithms.fastest_path(edges, 99).collect()
    assert [(r.vertex, r.duration) for r in lone] == [(99, 0.0)]


def test_wl_colors_structural_equivalence(spark):
    """1-WL invariants on a known graph: a 6-cycle is vertex-transitive
    (one color class forever), and a star's leaves are equivalent to each
    other but split from the hub after one round. A path's endpoints pair
    up, the inner vertices pair by distance-to-end — the classes 1-WL is
    defined to find."""
    cycle = _edges(spark, [(i, (i + 1) % 6) for i in range(6)])
    res = algorithms.wl_colors(cycle, rounds=4)
    assert res.state.select("value").distinct().count() == 1
    star = _edges(spark, [(0, i) for i in range(1, 5)])
    got = {r.vertex: r.value for r in algorithms.wl_colors(star, rounds=3).state.collect()}
    assert len({got[i] for i in range(1, 5)}) == 1      # leaves equivalent
    assert got[0] != got[1]                              # hub split off
    # P4 path 0-1-2-3: {0,3} and {1,2} by symmetry, classes disjoint
    path = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    pc = {r.vertex: r.value for r in algorithms.wl_colors(path, rounds=3).state.collect()}
    assert pc[0] == pc[3] and pc[1] == pc[2] and pc[0] != pc[1]
    # refinement only splits: distinct-color count is non-decreasing in rounds
    counts = [
        algorithms.wl_colors(path, rounds=r).state.select("value").distinct().count()
        for r in (1, 2, 3)
    ]
    assert counts == sorted(counts)


def test_random_walks_deterministic_and_valid(spark):
    """Walks are edge-respecting, partitioning-invariant, and sinks stay."""
    pairs = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (2, 4), (5, 1)]
    e = _edges(spark, pairs)
    a = algorithms.random_walks(e, walk_length=5, num_walks=2)
    b = algorithms.random_walks(e.repartition(7), walk_length=5, num_walks=2)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    # every (vertex, step) -> (vertex', step+1) transition is a real edge
    # (or a sink self-stay)
    edge_set = set(pairs)
    srcs = {s for s, _ in pairs}
    walks = {}
    for start, wid, step, v in ra:
        walks.setdefault((start, wid), {})[step] = v
    for path in walks.values():
        for t in range(max(path)):
            u, v = path[t], path[t + 1]
            assert (u, v) in edge_set or (u not in srcs and u == v)
    # row count: (n_vertices * num_walks) * (walk_length + 1)
    n_vertices = 5
    assert len(ra) == n_vertices * 2 * 6


def test_random_walks_salt_changes_walks(spark):
    pairs = [(i, j) for i in range(8) for j in range(8) if i != j]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, algorithms.random_walks(e, 4, 1, salt="a").collect()))
    b = sorted(map(tuple, algorithms.random_walks(e, 4, 1, salt="b").collect()))
    assert a != b


def test_link_prediction_adamic_adar_golden(spark):
    """Square 1-2-4-3-1 with diagonal 2-3: the only non-adjacent pair is
    (1, 4) with common neighbors {2, 3} (both degree 3)."""
    import math

    pairs = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    out = algorithms.link_prediction(_edges(spark, pairs), topk=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.x, r.y, r.common) == (1, 4, 2)
    assert r.aa_score == pytest.approx(2.0 / math.log(3.0), rel=1e-12)
    assert r.jaccard == pytest.approx(2.0 / (2 + 2 - 2), rel=1e-12)


def test_link_prediction_bridge_cap_and_direction_blind(spark):
    """max_bridge_degree excludes hub bridges; reversed/duplicate edges
    collapse to the same undirected simple graph."""
    pairs = [(1, 2), (2, 1), (1, 3), (2, 3), (2, 4), (4, 3), (3, 3)]
    out = algorithms.link_prediction(_edges(spark, pairs), topk=10)
    assert [(r.x, r.y, r.common) for r in out.collect()] == [(1, 4, 2)]
    capped = algorithms.link_prediction(
        _edges(spark, pairs), topk=10, max_bridge_degree=2
    )
    assert capped.count() == 0


def test_cc_star_path_graph_log_rounds(spark):
    """A 199-hop path needs 199 HashMin supersteps but only O(log n) star
    rounds — the algorithm's reason to exist. Also checks labels, the
    isolated self-loop vertex, and the separate triangle component."""
    pairs = [(i, i + 1) for i in range(199)]
    pairs += [(500, 501), (501, 502), (502, 500), (900, 900)]
    res = algorithms.connected_components_star(_edges(spark, pairs))
    assert res.converged
    assert res.iterations <= 12  # 2*log2(200) + slack; observed 9
    out = {r.vertex: int(r.value) for r in res.state.collect()}
    assert all(out[i] == 0 for i in range(200))
    assert out[500] == out[501] == out[502] == 500
    assert out[900] == 900


def test_cc_star_matches_hashmin(spark):
    """Label parity with the GIM-V HashMin engine on a random multigraph
    (self-loops, parallel edges, both directions)."""
    import random

    rng = random.Random(11)
    pairs = [(rng.randrange(250), rng.randrange(250)) for _ in range(350)]
    e = _edges(spark, pairs)
    a = {
        r.vertex: int(r.value)
        for r in algorithms.connected_components(e, max_iter=80).state.collect()
    }
    b = {
        r.vertex: int(r.value)
        for r in algorithms.connected_components_star(e).state.collect()
    }
    assert a == b


def test_cc_star_empty_and_selfloop_only(spark):
    e = _edges(spark, [(3, 3)])
    res = algorithms.connected_components_star(e)
    assert res.converged
    assert [(r.vertex, int(r.value)) for r in res.state.collect()] == [(3, 3)]
    empty = _edges(spark, []).filter("src > 0")
    res2 = algorithms.connected_components_star(empty)
    assert res2.converged and res2.state.count() == 0


def _harmonic_exact(pairs, max_h):
    """NumPy BFS harmonic closeness over out-edges, reference for both
    faces."""
    import collections

    adj = collections.defaultdict(set)
    verts = set()
    for s, d in pairs:
        verts.update((s, d))
        if s != d:
            adj[s].add(d)
    out = {}
    for v in sorted(verts):
        dist = {v: 0}
        q = [v]
        h = 0
        while q and h < max_h:
            h += 1
            q = [u for x in q for u in adj[x] if u not in dist]
            for u in q:
                dist[u] = h
            q = list(dict.fromkeys(q))
        out[v] = round(sum(1.0 / d for u, d in dist.items() if d), 6)
    return out


def test_closeness_exact_golden(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (1, 4), (5, 5), (6, 1)]
    out = {
        r.vertex: r.harmonic
        for r in algorithms.closeness_exact(_edges(spark, pairs), max_h=8).collect()
    }
    assert out == _harmonic_exact(pairs, 8)
    # bounded horizon: only 1-hop neighbors count at max_h=1
    out1 = {
        r.vertex: r.harmonic
        for r in algorithms.closeness_exact(_edges(spark, pairs), max_h=1).collect()
    }
    assert out1 == _harmonic_exact(pairs, 1)


def test_hadi_closeness_matches_exact_small(spark):
    """HLL sketches are exact at tiny cardinalities, so the accumulator
    must reproduce the exact face on a small digraph."""
    import random

    rng = random.Random(5)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(60)})
    res = algorithms.hadi(
        _edges(spark, pairs), max_h=10, lg_k=12, with_closeness=True
    )
    assert res.closeness is not None
    got = {r.vertex: r.harmonic for r in res.closeness.collect()}
    want = _harmonic_exact(pairs, 10)
    # drop pure-self-loop vertices missing from either side
    for v, w in want.items():
        assert abs(got[v] - w) < 1e-6, (v, got[v], w)


def test_hadi_without_closeness_unchanged(spark):
    res = algorithms.hadi(_edges(spark, [(1, 2), (2, 3)]), max_h=4)
    assert res.closeness is None
    assert res.radius is None
    assert res.converged


def _radius_exact_py(pairs, max_h, ratio_num=9, ratio_den=10):
    """Python BFS oracle for the PEGASUS effective radius: smallest h with
    ratio_den * |N_h(v)| >= ratio_num * |N_max_h(v)| (self at h=0)."""
    import collections

    adj = collections.defaultdict(set)
    verts = set()
    for s, d in pairs:
        verts.update((s, d))
        if s != d:
            adj[s].add(d)
    out = {}
    for v in sorted(verts):
        reach = {v}
        counts = [1]
        frontier = {v}
        for _ in range(max_h):
            frontier = {u for x in frontier for u in adj[x]} - reach
            reach |= frontier
            counts.append(len(reach))
        out[v] = (
            len(reach),
            min(
                h
                for h, c in enumerate(counts)
                if ratio_den * c >= ratio_num * counts[-1]
            ),
        )
    return out


def test_effective_radius_exact_golden(spark):
    """Path 1->2->3->4->5 plus a hub 6->{1..5}: hand-checkable radii at
    the 9/10 ratio, then a random digraph vs the BFS oracle."""
    import random

    path = [(1, 2), (2, 3), (3, 4), (4, 5), (6, 1), (6, 2), (6, 3), (6, 4), (6, 5)]
    got = {
        r.vertex: (r.n_reach, r.eff_radius)
        for r in algorithms.effective_radius_exact(
            _edges(spark, path), max_h=6
        ).collect()
    }
    assert got == _radius_exact_py(path, 6)
    # vertex 5 is a sink: reach {5}, radius 0; vertex 1 reaches all of
    # 1..5 only at h=4 (9/10 of 5 needs all 5)
    assert got[5] == (1, 0)
    assert got[1] == (5, 4)
    rng = random.Random(11)
    pairs = list({(rng.randrange(25), rng.randrange(25)) for _ in range(70)})
    got = {
        r.vertex: (r.n_reach, r.eff_radius)
        for r in algorithms.effective_radius_exact(
            _edges(spark, pairs), max_h=5
        ).collect()
    }
    assert got == _radius_exact_py(pairs, 5)


def test_hadi_radius_matches_exact_small(spark):
    """HLL sketches are exact at tiny cardinalities, so hadi's O(V)-state
    radius path must reproduce effective_radius_exact bit-for-bit."""
    import random

    rng = random.Random(7)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(60)})
    res = algorithms.hadi(_edges(spark, pairs), max_h=8, lg_k=12, with_radius=True)
    assert res.radius is not None
    got = {
        r.vertex: (round(r.n_reach_est), r.eff_radius) for r in res.radius.collect()
    }
    want = _radius_exact_py(pairs, 8)
    assert got == want


def test_ktruss_golden(spark):
    """K4 plus a pendant triangle sharing vertex 1: every K4 edge has
    support 2; the pendant triangle's edges have support 1, except (1,2)…
    hand-derived peel below."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    pendant = [(1, 5), (2, 5)]  # triangle (1,2,5)
    e = _edges(spark, k4 + pendant)
    # k=4 (support >= 2): (1,5),(2,5) have support 1 -> peeled round 1;
    # K4 edges keep support 2 afterwards ((1,2) drops from 3 to 2)
    res = algorithms.ktruss(e, k=4)
    assert res.converged
    assert sorted((r.a, r.b) for r in res.state.collect()) == sorted(k4)
    # k=5 (support >= 3): only (1,2) has support 3 in round 1; everything
    # peels (no edge set where all edges have support 3)
    res5 = algorithms.ktruss(e, k=5)
    assert res5.converged and res5.state.count() == 0
    # k=3 (support >= 1): everything is in a triangle, nothing peels
    res3 = algorithms.ktruss(e, k=3)
    assert res3.converged and res3.state.count() == len(k4 + pendant)
    # invalid k
    with pytest.raises(ValueError):
        algorithms.ktruss(e, k=2)


def test_ktruss_capped_rounds_match_unrolled(spark):
    """A chain of diamonds peels one diamond per round at k=4; capping
    max_rounds reproduces the same prefix the oracle unrolls."""
    # diamond i: vertices (2i, 2i+1) shared path; build a strip where
    # peeling cascades: triangles t_i = (i, i+1, i+2) for i in 0..5
    strip = [(i, i + 1) for i in range(7)] + [(i, i + 2) for i in range(6)]
    e = _edges(spark, strip)
    full = algorithms.ktruss(e, k=4)
    capped = algorithms.ktruss(e, k=4, max_rounds=1)
    assert not capped.converged or full.converged
    # round 1 keeps strictly more edges than the fixpoint (cascade exists)
    assert capped.state.count() >= full.state.count()
    assert full.converged


def test_katz_matches_numpy_recurrence(spark):
    """x_{t+1} = alpha * A^T (1 + x_t), x0 = 0 — dense NumPy recompute."""
    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (1, 3), (2, 3)]
    res = algorithms.katz(_edges(spark, pairs), alpha=0.1, max_iter=6)
    got = {r["vertex"]: r["value"] for r in res.state.collect()}
    n = 4
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = 1.0
    x = np.zeros(n)
    for _ in range(6):
        x = 0.1 * (A.T @ (1.0 + x))
    for v in range(n):
        assert got[v] == pytest.approx(x[v], abs=1e-12)
    assert res.iterations == 6


def test_katz_blocked_matches_flat(spark):
    pairs = [(i % 7, (i * 3 + 1) % 7) for i in range(25)]
    # drop self-loops but keep every id 0..6 present (the blocked engine's
    # contiguous-id precondition — driver queries remap_contiguous first)
    pairs = [(s, d) for s, d in pairs if s != d] + [(3, 0)]
    flat = algorithms.katz(_edges(spark, pairs), alpha=0.05, max_iter=5)
    blocked = algorithms.katz(
        _edges(spark, pairs), alpha=0.05, max_iter=5,
        engine="blocked", p=2, dense_threshold=3,
    )
    f = {r["vertex"]: r["value"] for r in flat.state.collect()}
    b = {r["vertex"]: r["value"] for r in blocked.state.collect()}
    assert set(f) == set(b)
    for v in f:
        assert f[v] == pytest.approx(b[v], abs=1e-12)


def test_salsa_matches_numpy_recurrence(spark):
    """auth = col-normalized A^T hub; hub = col-normalized A auth."""
    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (1, 3)]
    res = algorithms.salsa(_edges(spark, pairs), max_iter=4)
    got = {r["vertex"]: (r["hub"], r["auth"]) for r in res.state.collect()}
    n = 4
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = 1.0
    od = A.sum(axis=1)
    idg = A.sum(axis=0)
    hub = np.ones(n)
    for _ in range(4):
        auth = A.T @ np.divide(hub, od, out=np.zeros(n), where=od > 0)
        # engine joins on edges, so od>0 wherever A has a row
        hub = A @ np.divide(auth, idg, out=np.zeros(n), where=idg > 0)
    for v in range(n):
        assert got[v][0] == pytest.approx(hub[v], abs=1e-12)
        assert got[v][1] == pytest.approx(auth[v], abs=1e-12)
    # column-stochastic half-steps conserve hub mass onto non-dangling rows
    assert res.iterations == 4


def test_salsa_empty(spark):
    res = algorithms.salsa(_edges(spark, []), max_iter=3)
    assert res.state.count() == 0 and res.converged


def _scc_labels(spark, pairs, **kw):
    res = algorithms.scc(_edges(spark, pairs), **kw)
    return {r["vertex"]: r["value"] for r in res.state.collect()}, res


def test_scc_dag_of_cycles(spark):
    """Two 3-cycles joined by a one-way bridge + a tail vertex: the bridge
    must NOT merge the cycles (that is the CC-vs-SCC distinction)."""
    c1 = [(0, 1), (1, 2), (2, 0)]
    c2 = [(10, 11), (11, 12), (12, 10)]
    bridge = [(2, 10)]
    tail = [(12, 20)]
    labels, res = _scc_labels(spark, c1 + c2 + bridge + tail)
    assert labels == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10, 20: 20}
    assert res.converged


def test_scc_matches_brute_force(spark):
    """Pseudo-random digraph vs a closure-based NumPy brute force."""
    rng = np.random.RandomState(7)
    n = 24
    pairs = set()
    for _ in range(60):
        s, d = rng.randint(0, n), rng.randint(0, n)
        if s != d:
            pairs.add((int(s), int(d)))
    pairs = sorted(pairs)
    labels, res = _scc_labels(spark, pairs)
    # brute force: boolean transitive closure
    R = np.eye(n, dtype=bool)
    A = np.zeros((n, n), dtype=bool)
    for s, d in pairs:
        A[s, d] = True
    R = R | A
    for _ in range(n):
        R = R | (R @ R)
    verts = sorted({v for p in pairs for v in p})
    expect = {}
    for v in verts:
        members = [u for u in verts if R[u, v] and R[v, u]]
        expect[v] = min(members)
    assert labels == expect
    assert res.converged


def test_scc_giant_cycle_one_round(spark):
    """A single strongly connected graph extracts in ONE outer round."""
    n = 12
    pairs = [(i, (i + 1) % n) for i in range(n)] + [(0, 6), (6, 0)]
    labels, res = _scc_labels(spark, pairs)
    assert set(labels.values()) == {0}
    assert res.iterations == 1


def test_scc_self_loops_and_empty(spark):
    labels, res = _scc_labels(spark, [(5, 5), (5, 6)])
    assert labels == {5: 5, 6: 6}
    res2 = algorithms.scc(_edges(spark, []))
    assert res2.state.count() == 0 and res2.converged


def test_condensation_levels_golden(spark):
    """Two 3-cycles bridged one-way + a tail: condensation is the 3-chain
    SCC(0) -> SCC(10) -> {20}, so levels are 0, 1, 2."""
    pairs = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10),
             (2, 10), (12, 20)]
    out = algorithms.condensation_levels(_edges(spark, pairs))
    rows = {r["vertex"]: (r["scc_id"], r["level"]) for r in out.collect()}
    assert rows == {
        0: (0, 0), 1: (0, 0), 2: (0, 0),
        10: (10, 1), 11: (10, 1), 12: (10, 1),
        20: (20, 2),
    }


def test_condensation_levels_accepts_precomputed_labels(spark):
    pairs = [(0, 1), (1, 0), (1, 2)]
    labels = algorithms.scc(_edges(spark, pairs)).state
    out = algorithms.condensation_levels(
        _edges(spark, pairs), scc_labels=labels
    )
    rows = {r["vertex"]: (r["scc_id"], r["level"]) for r in out.collect()}
    assert rows == {0: (0, 0), 1: (0, 0), 2: (2, 1)}


def test_mis_path_graph_golden(spark):
    """Path 0-1-2-3: round 1 joins {0} (local min), retires 1; round 2
    joins {2}, retires 3. MIS = {0, 2}."""
    res = algorithms.maximal_independent_set(
        _edges(spark, [(0, 1), (1, 2), (2, 3)])
    )
    rows = {r["vertex"]: r["value"] for r in res.state.collect()}
    assert rows == {0: 1, 2: 2}
    assert res.converged and res.iterations >= 2


def test_mis_independent_and_maximal(spark):
    rng = np.random.RandomState(11)
    pairs = sorted({(int(a), int(b))
                    for a, b in rng.randint(0, 40, size=(120, 2)) if a != b})
    res = algorithms.maximal_independent_set(_edges(spark, pairs))
    mis = {r["vertex"] for r in res.state.collect()}
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    # independent: no two members adjacent
    for v in mis:
        assert not (adj[v] & mis)
    # maximal: every non-member has a member neighbor
    for v in adj:
        assert v in mis or (adj[v] & mis)
    assert res.converged


def test_mis_capped_rounds_prefix(spark):
    """max_rounds=1 returns exactly the first layer of the full run."""
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    full = algorithms.maximal_independent_set(_edges(spark, pairs))
    capped = algorithms.maximal_independent_set(
        _edges(spark, pairs), max_rounds=1
    )
    f = {r["vertex"]: r["value"] for r in full.state.collect()}
    c = {r["vertex"]: r["value"] for r in capped.state.collect()}
    assert c == {v: rd for v, rd in f.items() if rd == 1}
    assert not capped.converged


def test_mis_empty_and_selfloop(spark):
    res = algorithms.maximal_independent_set(_edges(spark, [(7, 7)]))
    assert res.state.count() == 0 and res.converged


def test_weighted_pagerank_blocked_matches_flat(spark):
    """Blocked weighted PageRank (pre-normalized fractions) reproduces the
    flat weighted plan (weighted out-degree divide) to float tolerance."""
    pairs = [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 4.0), (2, 0, 1.5),
             (3, 2, 1.0), (1, 3, 2.5), (3, 0, 0.5), (2, 3, 1.0)]
    e = spark.createDataFrame(pairs, "src long, dst long, weight double")
    flat = algorithms.pagerank(e, weighted=True, threshold=0.0, max_iter=8)
    blocked = algorithms.pagerank(
        e, weighted=True, threshold=0.0, max_iter=8,
        engine="blocked", p=2, dense_threshold=2,
    )
    f = {r.vertex: r.value for r in flat.state.collect()}
    b = {r.vertex: r.value for r in blocked.state.collect()}
    assert set(f) == set(b)
    for v in f:
        assert b[v] == pytest.approx(f[v], rel=1e-9)


def _brandes_ref(pairs, sources, max_depth):
    """Depth-bounded Brandes reference (per-source BFS + accumulation)."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for s, d in pairs:
        if s != d:
            adj[s].append(d)
    bt = defaultdict(float)
    for s in sources:
        dist, sigma, order = {s: 0}, {s: 1.0}, []
        dq = deque([s])
        while dq:
            v = dq.popleft()
            order.append(v)
            if dist[v] == max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    dq.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = defaultdict(float)
        for v in reversed(order):
            for w in adj[v]:
                if dist.get(w) == dist[v] + 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if v != s:
                bt[v] += delta[v]
    return bt


def test_betweenness_matches_brandes_reference(spark):
    rng = np.random.RandomState(3)
    pairs = sorted({(int(a), int(b))
                    for a, b in rng.randint(0, 25, size=(80, 2)) if a != b})
    sources = [0, 1, 2]
    out = algorithms.betweenness_sampled(
        _edges(spark, pairs), sources, max_depth=4
    )
    got = {r["vertex"]: r["betweenness"] for r in out.collect()}
    ref = _brandes_ref(pairs, sources, 4)
    verts = {v for p in pairs for v in p}
    assert set(got) == verts
    for v in verts:
        assert got[v] == pytest.approx(round(ref.get(v, 0.0), 6), abs=2e-6)


def test_betweenness_path_golden(spark):
    """Path 0->1->2->3, source 0: delta(2)=1 (for 3), delta(1)=2 (for 2,3)."""
    out = algorithms.betweenness_sampled(
        _edges(spark, [(0, 1), (1, 2), (2, 3)]), [0], max_depth=4
    )
    got = {r["vertex"]: r["betweenness"] for r in out.collect()}
    assert got == {0: 0.0, 1: 2.0, 2: 1.0, 3: 0.0}


def test_betweenness_depth_truncation(spark):
    """max_depth=1: no vertex lies strictly between the source and a
    reachable target, so every delta is 0."""
    out = algorithms.betweenness_sampled(
        _edges(spark, [(0, 1), (1, 2), (2, 3)]), [0], max_depth=1
    )
    got = {r["vertex"]: r["betweenness"] for r in out.collect()}
    assert set(got.values()) == {0.0}


def test_modularity_two_cliques_golden(spark):
    """Two triangles joined by one bridge, labeled by clique: numpy-exact
    Q on the symmetrized edge list."""
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 1)],
        "vertex long, label long",
    )
    out = algorithms.modularity(_edges(spark, pairs), labels).first()
    # symmetrized M = 14; per community: deg = 7, intra = 6
    expected = round(12 / 14 - 2 * (7 / 14) ** 2, 6)
    assert out["modularity"] == pytest.approx(expected, abs=1e-9)
    assert out["n_communities"] == 2


def test_modularity_single_community_is_zero(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    labels = spark.createDataFrame(
        [(v, 42) for v in range(3)], "vertex long, label long"
    )
    out = algorithms.modularity(_edges(spark, pairs), labels).first()
    assert out["modularity"] == pytest.approx(0.0, abs=1e-9)
    assert out["n_communities"] == 1


def test_modularity_singleton_partition(spark):
    """Every vertex its own community: Q = -sum(deg^2)/M^2 (no intra)."""
    pairs = [(0, 1), (1, 2)]
    labels = spark.createDataFrame(
        [(v, v) for v in range(3)], "vertex long, label long"
    )
    out = algorithms.modularity(_edges(spark, pairs), labels).first()
    expected = round(0.0 - (1 + 4 + 1) / 16.0, 6)
    assert out["modularity"] == pytest.approx(expected, abs=1e-9)
    assert out["n_communities"] == 3


def _coloring_checks(pairs, col, rounds_converged):
    adj = {}
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    assert set(col) == set(adj), "every edge-list vertex gets a color"
    for v, ns in adj.items():
        for u in ns:
            assert col[v] != col[u], f"monochromatic edge {v}-{u}"
    max_deg = max(len(ns) for ns in adj.values())
    assert len(set(col.values())) <= max_deg + 1
    assert rounds_converged


@pytest.mark.parametrize("strategy", ["palette", "jp"])
def test_coloring_proper_total_bounded_random(spark, strategy):
    rng = np.random.RandomState(7)
    pairs = sorted({(int(a), int(b))
                    for a, b in rng.randint(0, 50, size=(200, 2)) if a != b})
    res = algorithms.greedy_coloring(_edges(spark, pairs), strategy=strategy)
    col = {r["vertex"]: r["value"] for r in res.state.collect()}
    _coloring_checks(pairs, col, res.converged)
    if strategy == "palette":
        # the density-independent round bound is the point of the default
        # strategy (measured 3 here vs 13 for jp; deterministic hashes)
        assert res.iterations <= 8


@pytest.mark.parametrize("strategy", ["palette", "jp"])
def test_coloring_complete_graph_uses_n_colors(spark, strategy):
    """K5: every pair adjacent, so all 5 colors 0..4 appear (= Delta+1)."""
    pairs = [(i, j) for i in range(5) for j in range(5) if i < j]
    res = algorithms.greedy_coloring(_edges(spark, pairs), strategy=strategy)
    col = {r["vertex"]: r["value"] for r in res.state.collect()}
    _coloring_checks(pairs, col, res.converged)
    assert sorted(col.values()) == [0, 1, 2, 3, 4]


@pytest.mark.parametrize("strategy", ["palette", "jp"])
def test_coloring_deterministic_across_runs(spark, strategy):
    """Pure function of the edge set: two runs agree color-for-color."""
    rng = np.random.RandomState(3)
    pairs = sorted({(int(a), int(b))
                    for a, b in rng.randint(0, 30, size=(80, 2)) if a != b})
    a = algorithms.greedy_coloring(_edges(spark, pairs), strategy=strategy)
    b = algorithms.greedy_coloring(_edges(spark, pairs), strategy=strategy)
    ca = {r["vertex"]: r["value"] for r in a.state.collect()}
    cb = {r["vertex"]: r["value"] for r in b.state.collect()}
    assert ca == cb


def test_coloring_jp_star_two_colors(spark):
    """Star K1,6 under JP: the mex packs hub + leaves into exactly 2
    color classes (palette may legally spread leaves across its
    degree-sized palette, so this invariant is JP-specific)."""
    pairs = [(0, i) for i in range(1, 7)]
    res = algorithms.greedy_coloring(_edges(spark, pairs), strategy="jp")
    col = {r["vertex"]: r["value"] for r in res.state.collect()}
    _coloring_checks(pairs, col, res.converged)
    assert len(set(col.values())) == 2


def test_coloring_empty_and_selfloop(spark):
    res = algorithms.greedy_coloring(_edges(spark, [(9, 9)]))
    assert res.state.count() == 0 and res.converged
    with pytest.raises(ValueError):
        algorithms.greedy_coloring(_edges(spark, [(0, 1)]), strategy="rainbow")


def _sim_moves(pairs, rounds):
    """Exact Python mirror of algorithms._moves_round (integer scores,
    Grappolo singleton guard, (score desc, label asc) tie-break)."""
    se = set()
    for s, d in pairs:
        if s != d:
            se.add((s, d))
            se.add((d, s))
    verts = sorted({v for ed in se for v in ed})
    deg = {v: 0 for v in verts}
    for s, _ in se:
        deg[s] += 1
    m_tot = sum(deg.values())
    lab = {v: v for v in verts}
    for _ in range(rounds):
        cd, cs, lk = {}, {}, {}
        for v in verts:
            cd[lab[v]] = cd.get(lab[v], 0) + deg[v]
            cs[lab[v]] = cs.get(lab[v], 0) + 1
        for s, d in se:
            key = (s, lab[d])
            lk[key] = lk.get(key, 0) + 1
        new = {}
        for v in verts:
            a = lab[v]
            lk_a = lk.get((v, a), 0)
            best = None
            for (vv, c), k in lk.items():
                if vv != v or c == a:
                    continue
                if not (cs[a] > 1 or cs[c] > 1 or c < a):
                    continue
                s_ = (k - lk_a) * m_tot - deg[v] * (cd[c] - (cd[a] - deg[v]))
                if s_ <= 0:
                    continue
                if best is None or (s_, -c) > (best[0], -best[1]):
                    best = (s_, c)
            new[v] = best[1] if best else a
        lab = new
    return lab


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_modularity_moves_matches_bruteforce(spark, rounds):
    rng = np.random.RandomState(19)
    pairs = sorted({(int(a), int(b))
                    for a, b in rng.randint(0, 40, size=(130, 2)) if a != b})
    got = {
        r["vertex"]: r["label"]
        for r in algorithms.modularity_local_moves(
            _edges(spark, pairs), rounds=rounds
        ).collect()
    }
    assert got == _sim_moves(pairs, rounds)


def test_louvain_two_cliques_golden(spark):
    """Two triangles + bridge: level-1 moves get Q=0.1735, the level-2
    contraction merges to the ideal 2-community split Q=5/14-... =
    0.357143 — the multi-level machinery demonstrably beats one level."""
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    res = algorithms.louvain(_edges(spark, pairs), levels=2, rounds=3)
    assert res.modularity == pytest.approx(round(12 / 14 - 2 * (7 / 14) ** 2, 6))
    assert res.n_communities == 2
    lab = {r["vertex"]: r["label"] for r in res.labels.collect()}
    assert lab[0] == lab[1] == lab[2] != lab[3]
    assert lab[3] == lab[4] == lab[5]
    # Q history: never-regressing argmax, level 2 strictly better here
    assert max(q for _, _, q in res.history) == pytest.approx(res.modularity)
    q_l1 = max(q for lv, _, q in res.history if lv <= 1)
    assert res.modularity > q_l1


def test_louvain_dominates_prefixes_random(spark):
    rng = np.random.RandomState(23)
    pairs = sorted({(int(a), int(b))
                    for a, b in rng.randint(0, 30, size=(70, 2)) if a != b})
    e = _edges(spark, pairs)
    res = algorithms.louvain(e, levels=2, rounds=2)
    q_singleton = res.history[0][2]
    m2 = algorithms.modularity_local_moves(e, rounds=2)
    q_m2 = algorithms.modularity(e, m2).first()["modularity"]
    assert res.modularity >= q_singleton
    assert res.modularity >= q_m2 - 1e-9
    # labels cover every vertex exactly once
    assert res.labels.count() == len({v for ed in pairs for v in ed})


def test_louvain_empty_and_selfloop(spark):
    res = algorithms.louvain(_edges(spark, [(4, 4)]), levels=2, rounds=2)
    assert res.labels.count() == 0 and res.levels == 0


def _brute_coreness(pairs):
    """Textbook sequential peeling: repeatedly remove a minimum-degree
    vertex; its core number is the running maximum of those minimums."""
    adj = {}
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    core, k = {}, 0
    live = {v: set(ns) for v, ns in adj.items()}
    while live:
        v = min(live, key=lambda x: (len(live[x]), x))
        k = max(k, len(live[v]))
        core[v] = k
        for u in live[v]:
            live[u].discard(v)
        del live[v]
    return core


def test_coreness_matches_sequential_peeling(spark):
    rng = np.random.RandomState(31)
    pairs = sorted({(int(a), int(b))
                    for a, b in rng.randint(0, 45, size=(180, 2)) if a != b})
    res = algorithms.coreness(_edges(spark, pairs), max_rounds=100)
    got = {r["vertex"]: r["value"] for r in res.state.collect()}
    assert res.converged
    assert got == _brute_coreness(pairs)


def test_coreness_golden_triangle_with_tail(spark):
    """Triangle 0-1-2 (core 2) with path tail 2-3-4 (core 1)."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    res = algorithms.coreness(_edges(spark, pairs), max_rounds=20)
    got = {r["vertex"]: r["value"] for r in res.state.collect()}
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1}
    assert res.converged


def test_coreness_capped_rounds_upper_bound(spark):
    """A capped run is a valid pointwise upper bound on the fixpoint
    (estimates are monotone non-increasing from degree)."""
    pairs = [(i, i + 1) for i in range(30)]  # path: everyone core 1
    capped = algorithms.coreness(_edges(spark, pairs), max_rounds=1)
    got = {r["vertex"]: r["value"] for r in capped.state.collect()}
    assert all(v >= 1 for v in got.values())
    full = algorithms.coreness(_edges(spark, pairs), max_rounds=50)
    fin = {r["vertex"]: r["value"] for r in full.state.collect()}
    assert set(fin.values()) == {1}
    assert all(got[v] >= fin[v] for v in fin)


def test_coreness_empty_and_selfloop(spark):
    res = algorithms.coreness(_edges(spark, [(3, 3)]), max_rounds=5)
    assert res.state.count() == 0 and res.converged


def test_triangle_sampled_full_fraction_is_exact(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (0, 3)]
    e = _edges(spark, pairs)
    exact = algorithms.triangle_count(e)
    est, t = algorithms.triangle_count_sampled(e, sample_frac=1.0)
    assert t == exact and est == float(exact)
    with pytest.raises(ValueError):
        algorithms.triangle_count_sampled(e, sample_frac=0.0)


def test_triangle_sampled_deterministic_and_sane(spark):
    """K25 (2300 triangles): the hash-sampled estimate is a pure function
    of the edge set (two runs identical) and lands within a loose
    unbiased-estimator window."""
    pairs = [(i, j) for i in range(25) for j in range(25) if i < j]
    e = _edges(spark, pairs)
    exact = algorithms.triangle_count(e)
    a = algorithms.triangle_count_sampled(e, sample_frac=0.5)
    b = algorithms.triangle_count_sampled(e.repartition(5), sample_frac=0.5)
    assert a == b
    assert 0.3 * exact <= a[0] <= 3.0 * exact


def test_powerlaw_alpha_star_golden(spark):
    """Star K1,8, d_min=1: degrees are hub 8 + eight 1s;
    alpha = 1 + 9 / (ln 16 + 8 ln 2) = 1 + 9/(12 ln 2)."""
    import math

    pairs = [(0, i) for i in range(1, 9)]
    row = algorithms.degree_powerlaw_alpha(
        _edges(spark, pairs), "both", d_min=1
    ).first()
    expected = 1.0 + 9.0 / (12.0 * math.log(2.0))
    assert row["n_tail"] == 9
    assert row["alpha"] == pytest.approx(round(expected, 6), abs=2e-6)
    assert row["sigma"] == pytest.approx(
        round((expected - 1.0) / 3.0, 6), abs=2e-6
    )


def test_powerlaw_alpha_dmin_filters_tail(spark):
    pairs = [(0, i) for i in range(1, 9)] + [(1, 2)]
    row = algorithms.degree_powerlaw_alpha(
        _edges(spark, pairs), "both", d_min=2
    ).first()
    assert row["n_tail"] == 3  # hub deg 8, vertices 1 and 2 deg 2
    assert row["d_min"] == 2


# ---------------------------------------------------------------------------
# Borůvka minimum spanning forest
# ---------------------------------------------------------------------------


def _wedges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, weight double")


def _kruskal_weight(triples):
    """Reference MSF total weight + edge count (union-find Kruskal).
    With ties the edge SET may differ from Borůvka's, but the total
    weight is unique (matroid exchange), so weight is the invariant."""
    par = {}

    def find(x):
        while par.setdefault(x, x) != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    tot, cnt = 0.0, 0
    for w, a, b in sorted((w, min(a, b), max(a, b)) for a, b, w in triples):
        ra, rb = find(a), find(b)
        if ra != rb:
            par[ra] = rb
            tot += w
            cnt += 1
    return tot, cnt


def test_boruvka_matches_kruskal_random(spark):
    import random

    rng = random.Random(7)
    n = 60
    triples = []
    seen = set()
    for _ in range(220):
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        if key in seen:
            continue
        seen.add(key)
        triples.append((a, b, float(rng.randint(1, 9))))  # heavy ties
    res = algorithms.boruvka_msf(_wedges(spark, triples))
    assert res.converged
    rows = res.state.collect()
    ref_w, ref_cnt = _kruskal_weight(triples)
    assert len(rows) == ref_cnt
    assert sum(r.w for r in rows) == pytest.approx(ref_w)
    # forest property: no cycles => per-component edge count = n - c;
    # verify against the repo's own CC labels on the forest edges
    cc = algorithms.connected_components_star(
        res.state.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    n_forest_verts = cc.state.count()
    n_comps = cc.state.select("value").distinct().count()
    assert len(rows) == n_forest_verts - n_comps


def test_boruvka_deterministic_tie_break(spark):
    """Triangle with all-equal weights: the (w, a, b) order keeps
    (1,2) and (1,3), drops (2,3) — deterministic despite the tie."""
    triples = [(1, 2, 5.0), (2, 3, 5.0), (1, 3, 5.0)]
    res = algorithms.boruvka_msf(_wedges(spark, triples))
    assert sorted((r.a, r.b) for r in res.state.collect()) == [(1, 2), (1, 3)]


def test_boruvka_multi_component_and_parallel_edges(spark):
    """Two components; parallel edges collapse to min weight; both
    orientations of the same pair are one undirected edge."""
    triples = [
        (1, 2, 3.0), (2, 1, 1.0),          # parallel, keep w=1
        (2, 3, 2.0),
        (10, 11, 4.0),
    ]
    res = algorithms.boruvka_msf(_wedges(spark, triples))
    got = sorted((r.a, r.b, r.w) for r in res.state.collect())
    assert got == [(1, 2, 1.0), (2, 3, 2.0), (10, 11, 4.0)]


def test_boruvka_empty(spark):
    res = algorithms.boruvka_msf(_wedges(spark, []))
    assert res.state.count() == 0 and res.converged


# ---------------------------------------------------------------------------
# Densest subgraph (Bahmani parallel greedy peel)
# ---------------------------------------------------------------------------


def _peel_reference(pairs, mult, max_rounds):
    """Pure-Python replay of the exact peel recurrence."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    verts = {v for e in edges for v in e}
    series, levels = [], []
    r = 0
    while verts and r < max_rounds:
        r += 1
        n, m = len(verts), len(edges)
        series.append((r, n, m, m / n))
        levels.append(set(verts))
        deg = {v: 0 for v in verts}
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        keep = {v for v in verts if deg[v] * n > mult * m}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
        verts = keep
    best_round, _, _, best_d = min(series, key=lambda t: (-t[3], t[0]))
    return series, levels[best_round - 1], best_round, best_d


def test_densest_clique_plus_path(spark):
    """K6 (density 2.5) + a long path: the peel strips the path and the
    best level isolates the clique."""
    import itertools

    k6 = list(itertools.combinations(range(6), 2))
    path = [(i, i + 1) for i in range(100, 140)]
    pairs = k6 + path
    d = algorithms.densest_subgraph(_edges(spark, pairs), threshold_mult=2.2)
    ref_series, ref_members, ref_round, ref_d = _peel_reference(pairs, 2.2, 40)
    got_series = sorted(
        (r.round, r.n_vertices, r.n_edges, r.density) for r in d.series.collect()
    )
    assert [(a, b, c) for a, b, c, _ in got_series] == [
        (a, b, c) for a, b, c, _ in ref_series
    ]
    for (_, _, _, gd), (_, _, _, rd) in zip(got_series, ref_series):
        assert gd == pytest.approx(rd)
    assert d.best_round == ref_round
    assert d.best_density == pytest.approx(ref_d)
    assert sorted(r.vertex for r in d.members.collect()) == sorted(ref_members)
    assert set(ref_members) == set(range(6))  # the clique, exactly


def test_densest_peel_reference_random(spark):
    import random

    rng = random.Random(11)
    pairs = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(50), rng.randrange(50)) for _ in range(300)
            )
            if a != b
        }
    )
    d = algorithms.densest_subgraph(_edges(spark, pairs), threshold_mult=3.0)
    ref_series, ref_members, ref_round, ref_d = _peel_reference(pairs, 3.0, 40)
    got = sorted((r.round, r.n_vertices, r.n_edges) for r in d.series.collect())
    assert got == [(a, b, c) for a, b, c, _ in ref_series]
    assert d.best_round == ref_round
    assert sorted(r.vertex for r in d.members.collect()) == sorted(ref_members)


def test_densest_guarantee(spark):
    """The returned density is within 2(1+eps) of a known dense subgraph's
    density (here the planted K8, rho = 3.5)."""
    import itertools

    k8 = list(itertools.combinations(range(8), 2))
    spokes = [(0, 100 + i) for i in range(30)]
    d = algorithms.densest_subgraph(_edges(spark, k8 + spokes), threshold_mult=2.2)
    assert d.best_density >= 3.5 / 2.2


def test_densest_empty(spark):
    d = algorithms.densest_subgraph(_edges(spark, []))
    assert d.series.count() == 0 and d.members.count() == 0 and d.converged


# ---------------------------------------------------------------------------
# node2vec second-order biased walks
# ---------------------------------------------------------------------------


def _n2v_reference(pairs, walk_length, num_walks, p, q, salt="n2v"):
    """Pure-Python replay of the exact node2vec recurrence."""
    import hashlib

    adj = {}
    for s, d in sorted(set(pairs)):
        adj.setdefault(s, []).append(d)
    eset = set(pairs)
    verts = sorted({v for e in pairs for v in e})
    out = {}
    for start in verts:
        for w in range(num_walks):
            prev, cur = start, start
            out[(start, w, 0)] = start
            for t in range(1, walk_length + 1):
                nbrs = adj.get(cur, [])
                if not nbrs:
                    nxt = cur
                else:
                    u = int(
                        hashlib.sha256(
                            f"{salt}:{start}:{w}:{t}".encode()
                        ).hexdigest()[:8],
                        16,
                    ) / 2**32
                    ws = [
                        (1.0 / p if x == prev
                         else (1.0 if (prev, x) in eset else 1.0 / q))
                        for x in nbrs
                    ]
                    tgt = u * sum(ws)
                    c, nxt = 0.0, nbrs[-1]
                    for x, wt in zip(nbrs, ws):
                        c += wt
                        if c > tgt:
                            nxt = x
                            break
                prev, cur = cur, nxt
                out[(start, w, t)] = cur
    return out


def test_node2vec_matches_reference_replay(spark):
    """Every pick on a graph with sinks, return edges and non-neighbor
    hops matches the pure-Python inverse-CDF replay bit-exactly."""
    pairs = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (0, 2), (2, 0),
             (3, 4)]  # 4 is a sink
    res = algorithms.node2vec_walks(
        _edges(spark, pairs), walk_length=5, num_walks=2, p=0.5, q=2.0
    )
    got = {(r.start, r.walk_id, r.step): r.vertex for r in res.collect()}
    assert got == _n2v_reference(pairs, 5, 2, 0.5, 2.0)


def test_node2vec_uniform_limit_matches_first_step_bias(spark):
    """p = q = 1 collapses every weight to 1; step-1 picks must then be
    plain inverse-CDF uniform picks over the sorted neighbor list."""
    import hashlib

    pairs = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 0)]
    res = algorithms.node2vec_walks(
        _edges(spark, pairs), walk_length=1, num_walks=4, p=1.0, q=1.0
    )
    got = {(r.start, r.walk_id): r.vertex
           for r in res.where("step = 1").collect()}
    nbrs = {0: [1, 2, 3], 1: [0], 2: [0], 3: [0]}
    for (start, w), v in got.items():
        u = int(hashlib.sha256(f"n2v:{start}:{w}:1".encode()).hexdigest()[:8],
                16) / 2**32
        ns = nbrs[start]
        assert v == ns[min(int(u * len(ns)), len(ns) - 1)]


def test_effective_diameter_exact_path_and_clique(spark):
    """Directed 4-path 0→1→2→3: N = [4, 7, 9, 10]; 0.9·10 = 9 ⇒ first
    hit at h = 2 exactly (b = 9 ≥ 9), interpolated
    eff = 1 + (9-7)/(9-7) = 2.0. Clique: everything reachable at h = 1,
    eff = interpolation between h=0 and h=1."""
    path = [(0, 1), (1, 2), (2, 3)]
    got = algorithms.effective_diameter_exact(
        _edges(spark, path), max_h=3
    ).first().eff_diameter
    assert got == pytest.approx(2.0)
    import itertools

    k4 = [(a, b) for a, b in itertools.permutations(range(4), 2)]
    got_k4 = algorithms.effective_diameter_exact(
        _edges(spark, k4), max_h=2
    ).first().eff_diameter
    # N(0)=4, N(1)=16=N(2); 0.9*16=14.4 -> eff = 0 + (14.4-4)/(16-4)
    assert got_k4 == pytest.approx(round(10.4 / 12, 6))


def test_fabp_matches_numpy_jacobi(spark):
    """4 Jacobi iterations of b <- phi + c'Ab - aDb on a small undirected
    graph, recomputed densely with NumPy (identical constants)."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    h = 0.05
    priors_rows = [(0, 1.0), (4, -1.0)]
    priors = spark.createDataFrame(priors_rows, "vertex long, prior double")
    res = algorithms.fabp(
        _edges(spark, pairs), priors, h=h, max_iter=4, threshold=0.0
    )
    got = {r["vertex"]: r["value"] for r in res.state.collect()}

    n = 5
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = A[d, s] = 1.0
    D = A.sum(axis=1)
    phi = np.zeros(n)
    for v, p in priors_rows:
        phi[v] = p
    hh = 4.0 * h * h
    a = hh / (1.0 - hh)
    c2 = 2.0 * h / (1.0 - hh)
    b = phi.copy()
    for _ in range(4):
        b = phi + c2 * (A @ b) - a * (D * b)
    for v in range(n):
        assert got[v] == pytest.approx(b[v], abs=1e-12)
    assert res.iterations == 4


def test_fabp_contracts_to_linear_system_solution(spark):
    """With c'·λ_max < 1 the Jacobi iteration converges to the solution of
    (I + aD - c'A)·b = phi — the FaBP linear system itself."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    h = 0.05
    priors = spark.createDataFrame([(0, 1.0)], "vertex long, prior double")
    res = algorithms.fabp(
        _edges(spark, pairs), priors, h=h, max_iter=100, threshold=1e-12
    )
    got = {r["vertex"]: r["value"] for r in res.state.collect()}
    assert res.converged

    n = 5
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = A[d, s] = 1.0
    D = np.diag(A.sum(axis=1))
    phi = np.zeros(n)
    phi[0] = 1.0
    hh = 4.0 * h * h
    a = hh / (1.0 - hh)
    c2 = 2.0 * h / (1.0 - hh)
    b_exact = np.linalg.solve(np.eye(n) + a * D - c2 * A, phi)
    for v in range(n):
        assert got[v] == pytest.approx(b_exact[v], abs=1e-9)
    # guilt-by-association: the positively seeded vertex's neighbors score
    # higher than the far end of the path
    assert got[1] > got[4] and got[2] > got[4]


def test_power_iteration_matches_numpy(spark):
    """5 normalized products vs dense NumPy; lambda estimate converges on
    the true spectral radius of the symmetrized adjacency."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    state, lam, metrics = algorithms.power_iteration(
        _edges(spark, pairs), max_iter=5
    )
    got = {r["vertex"]: r["value"] for r in state.collect()}

    n = 5
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = A[d, s] = 1.0
    x = np.full(n, 1.0 / np.sqrt(n))
    nrm = 1.0
    for _ in range(5):
        x = A @ x
        nrm = np.sqrt((x**2).sum())
        x = x / nrm
    for v in range(n):
        assert got[v] == pytest.approx(x[v], abs=1e-12)
    assert lam == pytest.approx(nrm, abs=1e-12)
    # true lambda_max for reference: power iteration should be within 5%
    true_lam = max(abs(np.linalg.eigvalsh(A)))
    assert abs(lam - true_lam) / true_lam < 0.05
    assert len(metrics) == 5


def test_power_iteration_empty_graph(spark):
    state, lam, metrics = algorithms.power_iteration(_edges(spark, []), max_iter=3)
    assert state.count() == 0 and lam == 0.0 and metrics == []


def test_global_clustering_triangle_with_pendant(spark):
    """Triangle + pendant: T = 1, wedges = 1+1+3 = 5, C = 3/5."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    row = algorithms.global_clustering(_edges(spark, pairs)).first()
    assert row.n_triangles == 1 and row.n_wedges == 5
    assert row.global_cc == pytest.approx(0.6)


def test_rich_club_triangle_with_pendant(spark):
    """k=1 club = the triangle (fully connected, phi = 1); k=2 club has a
    single member (phi = 0 by convention)."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    rows = {r.k: r for r in algorithms.rich_club(_edges(spark, pairs), [1, 2]).collect()}
    assert rows[1].n_nodes == 3 and rows[1].n_edges == 3 and rows[1].phi == 1.0
    assert rows[2].n_nodes == 1 and rows[2].phi == 0.0


def test_trustrank_matches_numpy(spark):
    """4 iterations of t <- a*A_norm^T t + (1-a)*d vs dense NumPy; teleport
    only to seeds, t0 = d."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 0)]
    seeds = spark.createDataFrame([(0,), (3,)], "vertex long")
    res = algorithms.trustrank(
        _edges(spark, pairs), seeds, alpha=0.85, max_iter=4, threshold=0.0
    )
    got = {r["vertex"]: r["value"] for r in res.state.collect()}

    n = 6
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = 1.0
    od = A.sum(axis=1)
    P = np.divide(A, od[:, None], out=np.zeros_like(A), where=od[:, None] > 0)
    dvec = np.zeros(n)
    dvec[[0, 3]] = 0.5
    t = dvec.copy()
    for _ in range(4):
        t = 0.85 * (P.T @ t) + (1.0 - 0.85) * dvec
    for v in range(n):
        assert got[v] == pytest.approx(t[v], abs=1e-12)
    assert res.iterations == 4
    # trust flows only from seeds: vertex 5 has no in-edges and is not a
    # seed, so its trust is exactly 0
    assert got[5] == 0.0


def test_hitting_probability_matches_numpy(spark):
    """k-step absorbing-walk recurrence h <- 1_S else P@h vs dense NumPy."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 0), (4, 3)]
    seeds = spark.createDataFrame([(3,)], "vertex long")
    res = algorithms.hitting_probability(
        _edges(spark, pairs), seeds, max_iter=4, threshold=0.0
    )
    got = {r["vertex"]: r["value"] for r in res.state.collect()}

    n = 6
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = 1.0
    od = A.sum(axis=1)
    P = np.divide(A, od[:, None], out=np.zeros_like(A), where=od[:, None] > 0)
    h = np.zeros(n)
    h[3] = 1.0
    for _ in range(4):
        h = P @ h
        h[3] = 1.0
    for v in range(n):
        assert got[v] == pytest.approx(h[v], abs=1e-12)
    assert res.iterations == 4
    # the seed is absorbing (exactly 1) and vertex 2 reaches it in 1 of 2
    # branches then more via the cycle
    assert got[3] == 1.0
    assert got[2] > 0.5


def test_hitting_probability_monotone_and_bounded(spark):
    """h is a probability (0 <= h <= 1) and non-decreasing in k."""
    pairs = [(i, (i + 1) % 8) for i in range(8)] + [(0, 4), (2, 6)]
    edges = _edges(spark, pairs)
    seeds = spark.createDataFrame([(4,)], "vertex long")
    prev = None
    for k in (1, 2, 4):
        got = {
            r["vertex"]: r["value"]
            for r in algorithms.hitting_probability(
                edges, seeds, max_iter=k, threshold=0.0
            ).state.collect()
        }
        assert all(0.0 <= v <= 1.0 + 1e-15 for v in got.values())
        if prev is not None:
            assert all(got[v] >= prev[v] - 1e-15 for v in prev)
        prev = got


def test_spam_mass_trusted_seed_low_mass(spark):
    """A page whose rank comes entirely from the seed's vouching has low
    mass; a page ranked only by unvouched links has mass ~1."""
    # seed 0 links to 1; spam farm 10..14 all link to 5 (no trust path)
    pairs = [(0, 1), (1, 0)] + [(i, 5) for i in range(10, 15)]
    seeds = spark.createDataFrame([(0,)], "vertex long")
    rows = {
        r["vertex"]: r
        for r in algorithms.spam_mass(
            _edges(spark, pairs), seeds, max_iter=10
        ).collect()
    }
    # mass = (pr - trust)/pr, rounded; spam target 5 got zero trust
    assert rows[5].trust == 0.0 and rows[5].mass == 1.0
    # the directly-vouched page keeps most of its rank as trust
    assert rows[1].mass < 0.5
    for r in rows.values():
        assert r.mass == pytest.approx((r.pr - r.trust) / r.pr, abs=1e-6)


def test_sweep_cut_two_triangles(spark):
    """Two triangles joined by one bridge: the sweep's conductance minimum
    is the first triangle (phi = 1/7); every prefix checked by hand."""
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5)]
    scores = spark.createDataFrame(
        [(0, 0.3), (1, 0.3), (2, 0.3), (3, 0.01), (4, 0.01), (5, 0.01)],
        "vertex long, score double",
    )
    rows = {r["k"]: r for r in
            algorithms.sweep_cut(_edges(spark, pairs), scores, top_k=10).collect()}
    # ranking by score/deg desc, vertex asc: 0, 1, 2, 4, 5, 3
    order = [rows[k]["vertex"] for k in sorted(rows)]
    assert order == [0, 1, 2, 4, 5]  # k=6 (full set) filtered: complement 0
    exp = {
        1: (2, 2, 1.0),
        2: (2, 4, 0.5),
        3: (1, 7, round(1 / 7, 6)),
        4: (3, 9, 0.6),
        5: (3, 11, 1.0),
    }
    for k, (cut, vol, phi) in exp.items():
        assert (rows[k]["cut_edges"], rows[k]["vol"]) == (cut, vol)
        assert rows[k]["phi"] == pytest.approx(phi, abs=1e-9)
    # the ACL local cluster = argmin phi = the seed triangle
    best = min(rows.values(), key=lambda r: (r["phi"], r["k"]))
    assert best["k"] == 3


def test_maximal_matching_path_and_star(spark):
    """Path 1-2-3-4: (1,2) matches round 1, (3,4) round 2. Star: exactly
    one edge (the lowest leaf) matches."""
    res = algorithms.maximal_matching(
        _edges(spark, [(1, 2), (2, 3), (3, 4)]), priority="lex")
    got = {(r.a, r.b): r.value for r in res.state.collect()}
    assert got == {(1, 2): 1, (3, 4): 2}
    assert res.converged

    res2 = algorithms.maximal_matching(
        _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)]), priority="lex"
    )
    got2 = {(r.a, r.b): r.value for r in res2.state.collect()}
    assert got2 == {(0, 1): 1}


def test_maximal_matching_valid_and_maximal(spark):
    """On a hashed random graph: output is a matching (no shared vertex)
    and maximal (every live edge lost an endpoint)."""
    pairs = [(i * 7 % 40, (i * 13 + 3) % 40) for i in range(60)]
    pairs = [(a, b) for a, b in pairs if a != b]
    res = algorithms.maximal_matching(_edges(spark, pairs))
    matched = [(r.a, r.b) for r in res.state.collect()]
    used = [v for e in matched for v in e]
    assert len(used) == len(set(used))  # no vertex twice
    mset = set(used)
    und = {(min(a, b), max(a, b)) for a, b in pairs}
    for a, b in und:
        # maximality: every undirected edge touches a matched vertex
        assert a in mset or b in mset
    assert res.converged


def test_pagerank_standard_matches_numpy_and_conserves_mass(spark):
    """Dangling redistribution vs dense NumPy Google-matrix iteration;
    total rank conserved at 1 every run."""
    pairs = [(0, 1), (1, 2), (2, 0), (0, 3), (4, 0)]  # 3 is a sink
    res = algorithms.pagerank_standard(
        _edges(spark, pairs), alpha=0.85, max_iter=10, threshold=0.0
    )
    got = {r["vertex"]: r["value"] for r in res.state.collect()}

    n = 5
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = 1.0
    od = A.sum(axis=1)
    P = np.divide(A, od[:, None], out=np.zeros_like(A), where=od[:, None] > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        g = r[od == 0].sum()
        r = 0.85 * (P.T @ r + g / n) + 0.15 / n
    for v in range(n):
        assert got[v] == pytest.approx(r[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the sink's parked mass went SOMEWHERE: with redistribution the sink
    # holds less than it would absorbing forever
    assert got[3] < 0.5


def test_ppr_push_matches_numpy_and_invariants(spark):
    """Batch forward push vs a NumPy replay of the identical rule; mass
    p+r conserved at 1; final residuals below the push threshold."""
    pairs = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0), (2, 3)]
    alpha, eps = 0.2, 1e-3
    res = algorithms.ppr_push(
        _edges(spark, pairs), seed=0, alpha=alpha, eps=eps, max_rounds=60
    )
    got = {r_["vertex"]: (r_["p"], r_["r"]) for r_ in res.state.collect()}
    assert res.converged

    n = 5
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = 1.0
    deg = A.sum(axis=1)
    p, r = np.zeros(n), np.zeros(n)
    r[0] = 1.0
    for _ in range(60):
        U = (r >= eps * deg) & (r > 0)
        if not U.any():
            break
        push = np.where(U & (deg > 0), r, 0.0)
        p = p + alpha * push + np.where(U & (deg == 0), r, 0.0)
        inflow = A.T @ np.divide(
            (1 - alpha) * push, deg, out=np.zeros(n), where=deg > 0
        )
        r = np.where(U, 0.0, r) + inflow

    for v in range(n):
        ep, er = p[v], r[v]
        gp, gr = got.get(v, (0.0, 0.0))
        assert gp == pytest.approx(ep, abs=1e-12)
        assert gr == pytest.approx(er, abs=1e-12)
    total = sum(a + b for a, b in got.values())
    assert total == pytest.approx(1.0, abs=1e-9)
    for v, (_, rv) in got.items():
        assert rv < eps * max(deg[v], 1e-300) or rv == 0.0


def test_square_count_known_graphs(spark):
    """C4 has exactly 1 square, K4 has 3, a triangle has 0; the center cap
    drops squares through excluded hubs."""
    c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert algorithms.square_count(_edges(spark, c4)).first()["squares"] == 1
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert algorithms.square_count(_edges(spark, k4)).first()["squares"] == 3
    tri = [(0, 1), (1, 2), (2, 0)]
    assert algorithms.square_count(_edges(spark, tri)).first()["squares"] == 0
    # cap: in C4 every middle has degree 2; capping below kills the square
    got = algorithms.square_count(
        _edges(spark, c4), max_center_degree=1
    ).first()["squares"]
    assert got == 0


def test_trustrank_predicate_all_faces_agree(spark):
    """Predicate-seed TrustRank: flat scalar face == struct-seed face ==
    blocked CSR face, bit-comparable at round-12 precision."""
    pairs = [(i, (i * 7 + 3) % 30) for i in range(60)] + [(0, 1), (1, 2)]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = _edges(spark, pairs)
    pred = (lambda c: c % 5 == 0, lambda ids: ids % 5 == 0)

    verts = (edges.select(F.col("src").alias("vertex"))
             .union(edges.select(F.col("dst").alias("vertex"))).distinct())
    seeds = verts.filter(F.col("vertex") % 5 == 0)

    struct_face = {r["vertex"]: r["value"] for r in algorithms.trustrank(
        edges, seeds=seeds, max_iter=4, threshold=0.0).state.collect()}
    flat_pred = {r["vertex"]: r["value"] for r in algorithms.trustrank(
        edges, seed_pred=pred, max_iter=4, threshold=0.0).state.collect()}
    blocked = {r["vertex"]: r["value"] for r in algorithms.trustrank(
        edges, seed_pred=pred, max_iter=4, threshold=0.0,
        engine="blocked", p=4, dense_threshold=3).state.collect()}

    assert set(struct_face) == set(flat_pred)
    for v in struct_face:
        assert flat_pred[v] == pytest.approx(struct_face[v], abs=1e-12)
        assert blocked[v] == pytest.approx(struct_face[v], abs=1e-9)


def test_dag_depth_golden_and_cycle_contract(spark):
    # diamond + a tail: 0->1, 0->2, 1->3, 2->3, 3->4
    dag = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    res = algorithms.dag_depth(dag)
    assert res.converged
    got = {r.vertex: r.value for r in res.state.collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 1.0, 3: 2.0, 4: 3.0}
    # frontier decay: the max-plus semi-ring ships fewer messages as
    # depths settle (delta messaging); converges in longest-path rounds
    assert res.iterations <= 4
    msgs = [m.messages_shuffled for m in res.metrics]
    assert msgs[-1] == 0 or msgs[-1] < msgs[0]
    # cycle: no fixpoint -> unconverged at the cap, flagged to the caller
    cyc = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    res2 = algorithms.dag_depth(cyc, max_iter=5)
    assert not res2.converged and res2.iterations == 5


def test_sssp_tree_parents_and_tie_break(spark):
    # 0 -1-> 1 -1-> 3 ; 0 -1-> 2 -1-> 3 : two equal-cost paths to 3,
    # tie must break to the LOWEST parent (1); 4 unreachable
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0), (4, 5, 1.0)],
        "src long, dst long, weight double",
    )
    res = algorithms.sssp_tree(edges, 0)
    assert res.converged
    got = {r.vertex: (r.value.dist, r.value.parent) for r in res.state.collect()}
    assert got[0] == (0.0, -1)
    assert got[1] == (1.0, 0)
    assert got[2] == (1.0, 0)
    assert got[3] == (2.0, 1)  # tie -> lowest parent
    from flexgraph_spark.gimv import SSSP_INF
    assert got[4][0] == SSSP_INF and got[4][1] == -1
    # parent distances are consistent: dist(v) == dist(parent) + w
    for v, (d, p) in got.items():
        if p >= 0:
            assert abs(d - (got[p][0] + 1.0)) < 1e-12


def test_trussness_golden_levels(spark):
    # K4 on {0..3} (trussness 4), a separate triangle {10,11,12}
    # (trussness 3), and a pendant edge (20,21) (trussness 2)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tri = [(10, 11), (10, 12), (11, 12)]
    edges = spark.createDataFrame(
        k4 + tri + [(20, 21)], "src long, dst long"
    )
    got = {
        (r.a, r.b): r.trussness
        for r in algorithms.trussness(edges, k_max=10).collect()
    }
    assert len(got) == 10
    assert all(got[e] == 4 for e in k4)
    assert all(got[e] == 3 for e in tri)
    assert got[(20, 21)] == 2
    # k_max cap labels survivors with the cap value
    capped = {
        (r.a, r.b): r.trussness
        for r in algorithms.trussness(edges, k_max=3).collect()
    }
    assert all(capped[e] == 3 for e in k4 + tri)
    assert capped[(20, 21)] == 2


# ---------------------------------------------------------------------------
# Directed motif census (dyad_census / triad_census)
# ---------------------------------------------------------------------------

def _triad_type_brute(adj: set, tri) -> str:
    """Independent brute-force triad classifier: works on the raw directed
    adjacency of the triple (no pair-state encoding), igraph conventions."""
    a, b, c = tri
    pairs = [(a, b), (a, c), (b, c)]

    def st(u, v):
        f, r = (u, v) in adj, (v, u) in adj
        return "M" if (f and r) else ("A" if (f or r) else "N")

    states = {frozenset(p): st(*p) for p in pairs}
    M = sum(1 for v in states.values() if v == "M")
    A = sum(1 for v in states.values() if v == "A")
    if M == 0 and A == 0:
        return "003"
    if M == 0 and A == 1:
        return "012"
    if M == 1 and A == 0:
        return "102"
    if M == 3:
        return "300"
    if M == 2:
        return "210" if A == 1 else "201"
    verts = [a, b, c]
    apairs = [p for p in pairs if states[frozenset(p)] == "A"]
    if M == 1 and A == 1:
        mpair = next(p for p in pairs if states[frozenset(p)] == "M")
        (u, v) = apairs[0]
        w = u if u not in mpair else v          # the non-mutual vertex
        x = v if u not in mpair else u
        return "111D" if (w, x) in adj else "111U"
    if M == 0 and A == 2:
        center = (set(apairs[0]) & set(apairs[1])).pop()
        dirs = [(u, v) if (u, v) in adj else (v, u) for (u, v) in apairs]
        co = sum(1 for (u, _v) in dirs if u == center)
        return {2: "021D", 0: "021U", 1: "021C"}[co]
    if M == 1 and A == 2:
        mpair = next(p for p in pairs if states[frozenset(p)] == "M")
        w = next(v for v in verts if v not in mpair)
        co = sum(1 for x in mpair if (w, x) in adj)
        return {2: "120D", 0: "120U", 1: "120C"}[co]
    # M == 0, A == 3: cyclic iff every vertex sends exactly one edge
    outdeg = {v: 0 for v in verts}
    for (u, v) in pairs:
        uu = u if (u, v) in adj else v
        outdeg[uu] += 1
    return "030C" if all(o == 1 for o in outdeg.values()) else "030T"


def _census_brute(edge_list):
    from itertools import combinations

    adj = {(u, v) for (u, v) in edge_list if u != v}
    verts = sorted({u for e in edge_list for u in e})
    counts = {t: 0 for t in algorithms.TRIAD_TYPES}
    for tri in combinations(verts, 3):
        counts[_triad_type_brute(adj, tri)] += 1
    return counts, adj, verts


def _motif_graphs():
    """Deterministic digraphs covering hubs, mutuals, paths, self-loops,
    and a loop-only (otherwise isolated) vertex."""
    gs = []
    for seed in (0, 1, 2):
        n = 14
        gs.append(
            [
                (i, j)
                for i in range(n)
                for j in range(n)
                if i != j and (i * 31 + j * 17 + seed * 7) % 100 < 30
            ]
        )
    hub = [(0, j) for j in range(1, 12)]                      # out-star hub
    hub += [(j, 0) for j in range(1, 12) if j % 3 == 0]       # some mutual back-edges
    hub += [(j, j + 1) for j in range(1, 11) if j % 2 == 0]   # sparse chain
    hub += [(5, 5), (13, 13)]                                 # self-loops; 13 is loop-only
    gs.append(hub)
    return gs


def test_triad_census_matches_brute_force(spark):
    for edge_list in _motif_graphs():
        df = spark.createDataFrame(edge_list, "src long, dst long")
        got = {
            r["triad_type"]: int(r["n"])
            for r in algorithms.triad_census(df).collect()
        }
        want, _adj, verts = _census_brute(edge_list)
        assert got == want, f"census mismatch on {len(edge_list)}-edge graph"
        n = len(verts)
        assert sum(got.values()) == n * (n - 1) * (n - 2) // 6
        assert set(got) == set(algorithms.TRIAD_TYPES) and len(got) == 16


def test_dyad_census_matches_brute_force(spark):
    for edge_list in _motif_graphs():
        df = spark.createDataFrame(edge_list, "src long, dst long")
        row = algorithms.dyad_census(df).collect()[0]
        _counts, adj, verts = _census_brute(edge_list)
        from itertools import combinations

        m = a = 0
        for (u, v) in combinations(sorted(verts), 2):
            f, r = (u, v) in adj, (v, u) in adj
            if f and r:
                m += 1
            elif f or r:
                a += 1
        n = len(verts)
        assert row["n_vertices"] == n
        assert row["mutual"] == m
        assert row["asym"] == a
        assert int(row["null_dyads"]) == n * (n - 1) // 2 - m - a


# ---------------------------------------------------------------------------
# SlashBurn hub-removal ordering
# ---------------------------------------------------------------------------

def _slashburn_brute(edge_list, k, max_rounds):
    """Independent reference: plain-Python SlashBurn with the library's
    documented conventions (hub (deg desc, v) front / spokes
    (size desc, label, v) back / residual GCC vertex-asc middle)."""
    und, verts = {}, set()
    for u, v in edge_list:
        verts.update((u, v))
        if u != v:
            und.setdefault(u, set()).add(v)
            und.setdefault(v, set()).add(u)
    cur, n = set(verts), len(verts)
    f, b, out, rounds = 0, len(verts), {}, 0
    while rounds < max_rounds and cur:
        rounds += 1
        deg = {v: sum(1 for w in und.get(v, ()) if w in cur) for v in cur}
        hubs = sorted(cur, key=lambda v: (-deg[v], v))[:k]
        for i, v in enumerate(hubs):
            out[v] = (f + i, rounds, "hub")
        f += len(hubs)
        rem = cur - set(hubs)
        if not rem:
            cur = set()
            break
        lab = {v: v for v in rem}
        stable = False
        while not stable:
            stable = True
            for v in rem:
                m = min([lab[v]] + [lab[w] for w in und.get(v, ()) if w in rem])
                if m < lab[v]:
                    lab[v], stable = m, False
        comps = {}
        for v in rem:
            comps.setdefault(lab[v], []).append(v)
        sizes = {l: len(vs) for l, vs in comps.items()}
        gcc = min(sizes, key=lambda l: (-sizes[l], l))
        spokes = sorted(
            (v for v in rem if lab[v] != gcc),
            key=lambda v: (-sizes[lab[v]], lab[v], v),
        )
        s = len(spokes)
        for i, v in enumerate(spokes):
            out[v] = (b - s + i, rounds, "spoke")
        b -= s
        cur = set(comps[gcc])
    for i, v in enumerate(sorted(cur)):
        out[v] = (f + i, rounds + 1, "gcc")
    return out, rounds


def _slashburn_graphs():
    import random

    hub = [(0, j) for j in range(1, 20)] + [(1, j) for j in range(20, 30)]
    hub += [(20, 21), (22, 23), (23, 24), (40, 41), (5, 5), (99, 99)]
    rnd = random.Random(7)
    rand30 = [(rnd.randrange(30), rnd.randrange(30)) for _ in range(80)]
    path = [(i, i + 1) for i in range(20)]  # high diameter: hits the round cap
    return [("hubspoke", hub, 2, 5), ("rand30", rand30, 3, 4), ("path", path, 2, 3)]


def test_slashburn_matches_brute_force(spark):
    for name, el, k, mr in _slashburn_graphs():
        df = spark.createDataFrame(el, "src long, dst long")
        res = algorithms.slashburn(df, k=k, max_rounds=mr)
        got = {
            r["vertex"]: (r["position"], r["round"], r["role"])
            for r in res.state.collect()
        }
        want, wrounds = _slashburn_brute(el, k, mr)
        assert got == want, f"slashburn mismatch on {name}"
        assert res.iterations == wrounds
        positions = sorted(p for (p, _, _) in got.values())
        assert positions == list(range(len(got))), f"not a permutation on {name}"


def test_slashburn_improves_block_locality(spark):
    """The reason slashburn exists: on a hub-dominated graph, range-
    blocking the REORDERED ids touches far fewer (block_row, block_col)
    cells than range-blocking the original (shuffled) ids — fewer, denser
    blocks for the blocked CSR engine."""
    import random

    n, p = 240, 8
    rnd = random.Random(11)
    perm = list(range(n))
    rnd.shuffle(perm)  # original ids carry no locality
    el = []
    for hub in (perm[0], perm[1], perm[2]):
        el += [(hub, perm[j]) for j in range(3, n, 2) if perm[j] != hub]
    el += [(perm[i], perm[i + 1]) for i in range(3, n - 1, 7)]
    df = spark.createDataFrame(el, "src long, dst long")

    res = algorithms.slashburn(df, k=3, max_rounds=6)
    pos = res.state.select("vertex", "position")

    def nonempty_cells(edges, id_map, n_verts):
        e = (
            edges.join(id_map.withColumnRenamed("vertex", "src"), "src")
            .withColumnRenamed("position", "ps")
            .join(id_map.withColumnRenamed("vertex", "dst"), "dst")
            .withColumnRenamed("position", "pd")
        )
        return (
            e.select(
                (F.col("ps") * p / n_verts).cast("long").alias("br"),
                (F.col("pd") * p / n_verts).cast("long").alias("bc"),
            )
            .distinct()
            .count()
        )

    verts = df.select(F.col("src").alias("vertex")).union(
        df.select(F.col("dst").alias("vertex"))
    ).distinct()
    identity = verts.select("vertex", F.col("vertex").alias("position"))
    base = nonempty_cells(df, identity, n)
    ordered = nonempty_cells(df, pos, n)
    assert ordered < base, (ordered, base)
    # hubs-first: every edge's source or dest lands in the first block row/col
    assert ordered <= 3 * p, (ordered, base)


def test_oddball_matches_numpy_and_flags_plants(spark):
    """oddball_scores ≡ an independent NumPy EDPL fit, and the planted
    near-clique / star shapes out-score the random background."""
    import math
    import random
    from itertools import combinations

    import numpy as np

    rnd = random.Random(3)
    el = [(rnd.randrange(60), rnd.randrange(60)) for _ in range(120)]
    clique = list(range(100, 108))
    el += list(combinations(clique, 2))          # near-clique anomaly
    el += [(200, j) for j in range(201, 231)]    # star anomaly (center 200)
    df = spark.createDataFrame(el, "src long, dst long")
    got = {
        r["vertex"]: (r["n_i"], r["e_i"], r["score"])
        for r in algorithms.oddball_scores(df).collect()
    }

    und = {tuple(sorted(e)) for e in el if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    feats = {}
    for v, nb in adj.items():
        tri = sum(1 for a, b in combinations(sorted(nb), 2) if (a, b) in und)
        feats[v] = (len(nb) + 1, len(nb) + tri)
    xs = np.log([feats[v][0] for v in sorted(feats)])
    ys = np.log([feats[v][1] for v in sorted(feats)])
    theta = ((xs * ys).mean() - xs.mean() * ys.mean()) / (
        (xs * xs).mean() - xs.mean() ** 2
    )
    lnc = ys.mean() - theta * xs.mean()
    assert set(got) == set(feats)
    for v, (n_i, e_i) in feats.items():
        f = math.exp(lnc + theta * math.log(n_i))
        want = max(e_i, f) / min(e_i, f) * math.log(abs(e_i - f) + 1)
        gn, ge, gs = got[v]
        assert (gn, ge) == (n_i, e_i), v
        assert abs(gs - want) < 1e-9, (v, gs, want)
    top = sorted(got, key=lambda v: -got[v][2])[:10]
    assert 200 in top, "star center not flagged"
    assert any(v in top for v in clique), "clique members not flagged"


def test_oddball_regular_graph_degenerate_fit(spark):
    """Zero variance in log n (a cycle: every vertex degree 2) must not
    divide by zero — theta falls back to 0 and scores stay finite."""
    import math

    n = 12
    el = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(el, "src long, dst long")
    rows = algorithms.oddball_scores(df).collect()
    assert len(rows) == n
    for r in rows:
        assert (r["n_i"], r["e_i"]) == (3, 2)
        assert math.isfinite(r["score"])


def test_bipartite_check_golden(spark):
    """Even cycle -> bipartite, odd cycle -> one odd edge, path ->
    bipartite, K4 -> non-bipartite; verdicts and all counts exact."""
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (4, 1),          # C4 (bipartite)
         (10, 11), (11, 12), (12, 10),            # C3 (odd)
         (20, 21),                                # edge (bipartite)
         (30, 31), (30, 32), (30, 33), (31, 32), (31, 33), (32, 33)],  # K4
    )
    got = {
        r.root: (r.n_vertices, r.n_edges, r.odd_edges, r.is_bipartite)
        for r in algorithms.bipartite_check(e, max_iter=20).collect()
    }
    # K4 BFS from 30: dist 30=0, 31/32/33=1; same-parity edges are the
    # three among the level-1 set: (31,32), (31,33), (32,33)
    assert got == {
        1: (4, 4, 0, 1),
        10: (3, 3, 1, 0),
        20: (2, 1, 0, 1),
        30: (4, 6, 3, 0),
    }


def test_bipartite_check_k4_odd_edges(spark):
    k4 = [(30, 31), (30, 32), (30, 33), (31, 32), (31, 33), (32, 33)]
    row = algorithms.bipartite_check(_edges(spark, k4), max_iter=20).collect()[0]
    assert (row.root, row.n_vertices, row.n_edges, row.is_bipartite) == (30, 4, 6, 0)
    assert row.odd_edges == 3  # the three level-1/level-1 edges of K4


def test_rooted_bfs_distances(spark):
    """RootedBFS state = (component min id, true BFS distance from it) —
    vs a Python BFS on a random digraph's symmetrization."""
    import collections
    import random

    rng = random.Random(13)
    pairs = list({(rng.randrange(40), rng.randrange(40)) for _ in range(55)})
    res = gimv.run(
        algorithms.symmetrize(_edges(spark, pairs)), gimv.RootedBFS(), max_iter=60
    )
    assert res.converged
    got = {
        r.vertex: (r.value.root, r.value.dist) for r in res.state.collect()
    }
    adj = collections.defaultdict(set)
    verts = set()
    for s, d in pairs:
        verts.update((s, d))
        adj[s].add(d)
        adj[d].add(s)
    # python oracle: component min roots, then BFS dist from each root
    want = {}
    seen = set()
    for v in sorted(verts):
        if v in seen:
            continue
        comp = {v}
        q = [v]
        while q:
            q = [u for x in q for u in adj[x] if u not in comp]
            comp.update(q)
        root = min(comp)
        dist = {root: 0}
        q = [root]
        d = 0
        while q:
            d += 1
            q = [u for x in q for u in adj[x] if u not in dist]
            for u in q:
                dist[u] = d
        for u in comp:
            want[u] = (root, dist[u])
        seen |= comp
    assert got == want


# ---------------------------------------------------------------------------
# SimRank (Monte-Carlo, coupled reverse-walk fingerprints)
# ---------------------------------------------------------------------------


def _simrank_pair_dp(pairs, a0, b0, c, depth):
    """Per-pair DP: start mass 1 on (a0, b0); step both walks uniformly
    over in-neighbors (independent); walks die at in-degree-0; the mass
    first reaching the diagonal at step t contributes c^t."""
    verts = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(verts)}
    inn = [[] for _ in verts]
    for s, d in pairs:
        inn[idx[d]].append(idx[s])
    cur = {(idx[a0], idx[b0]): 1.0}
    total = 0.0
    for t in range(1, depth + 1):
        nxt = {}
        for (a, b), m in cur.items():
            if not inn[a] or not inn[b]:
                continue
            w = m / (len(inn[a]) * len(inn[b]))
            for a2 in inn[a]:
                for b2 in inn[b]:
                    nxt[(a2, b2)] = nxt.get((a2, b2), 0.0) + w
        cur = {}
        for (a2, b2), m in nxt.items():
            if a2 == b2:
                total += m * (c ** t)
            else:
                cur[(a2, b2)] = m
    return total


def test_simrank_mc_converges_to_pair_dp(spark):
    """Many coupled runs approximate the exact truncated meeting value:
    the Fogaras-Racz coupling preserves each pair's first-meeting law, so
    the MC mean must settle near the independent-walk DP value."""
    # two "siblings" 1 and 2 both cited by 0 and 3 -> high simrank(1, 2)
    pairs = [(0, 1), (0, 2), (3, 1), (3, 2), (1, 0), (2, 3), (2, 0)]
    got = {
        (r["a"], r["b"]): r["simrank"]
        for r in algorithms.simrank(
            _edges(spark, pairs), queries=[1], walk_length=4, num_runs=400
        ).collect()
    }
    exact = _simrank_pair_dp(pairs, 1, 2, 0.6, 4)
    assert exact > 0.1  # the fixture really is a high-similarity pair
    assert got[(1, 2)] == pytest.approx(exact, abs=0.08)
    # never negative, never above c (tau >= 1 for a != b)
    assert all(0.0 < v <= 0.6 for v in got.values())


def test_simrank_deterministic_across_parallelism(spark):
    pairs = [(0, 1), (0, 2), (3, 1), (3, 2), (1, 3), (2, 0), (4, 1), (4, 2)]
    e = _edges(spark, pairs)
    a = algorithms.simrank(e.repartition(1), queries=[1, 2], walk_length=4,
                           num_runs=6).collect()
    b = algorithms.simrank(e.repartition(7), queries=[1, 2], walk_length=4,
                           num_runs=6).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_simrank_walk_dies_at_source_vertices(spark):
    """0 -> 1, 0 -> 2: the only in-neighbor of 1 and 2 is 0, whose own
    in-degree is 0. The walks from 1 and 2 meet at 0 at step 1 (score c)
    and then terminate — no spurious later meetings, and vertex 0 itself
    (in-degree 0) never scores against anyone."""
    pairs = [(0, 1), (0, 2)]
    rows = algorithms.simrank(
        _edges(spark, pairs), queries=[0, 1], walk_length=5, num_runs=3
    ).collect()
    got = {(r["a"], r["b"]): r["simrank"] for r in rows}
    assert got == {(1, 2): pytest.approx(0.6)}


def test_simrank_topk_truncates_per_query(spark):
    pairs = [(i, 9) for i in range(6)] + [(9, i) for i in range(6)]
    out = algorithms.simrank(
        _edges(spark, pairs), queries=[0], walk_length=3, num_runs=4, topk=2
    )
    assert out.count() <= 2


# ---------------------------------------------------------------------------
# GraphSAGE-style neighbor sampling
# ---------------------------------------------------------------------------


def test_sample_neighborhoods_respects_fanouts_and_edges(spark):
    pairs = [(s, d) for s in range(8) for d in range(8) if s != d]
    e = _edges(spark, pairs)
    out = algorithms.sample_neighborhoods(e, fanouts=(3, 2)).collect()
    eset = set(pairs)
    per_parent = {}
    for r in out:
        assert (r["parent"], r["vertex"]) in eset  # sampled edges are real
        per_parent.setdefault((r["root"], r["hop"], r["parent"]), set()).add(
            r["vertex"]
        )
    for (root, hop, parent), kids in per_parent.items():
        assert len(kids) <= (3 if hop == 1 else 2)
    # hop-1 parents are the roots themselves
    assert all(r["parent"] == r["root"] for r in out if r["hop"] == 1)


def test_sample_neighborhoods_hierarchical_equals_plain_topf(spark):
    """The bucketed two-stage top-f must return EXACTLY the plain window
    top-f (the oracle's form) — exactness of hierarchical top-k."""
    pairs = [(0, d) for d in range(1, 40)] + [(1, d) for d in range(5, 15)]
    e = _edges(spark, pairs)
    plain = algorithms.sample_neighborhoods(e, fanouts=(4,), num_buckets=1)
    bucketed = algorithms.sample_neighborhoods(e, fanouts=(4,), num_buckets=8)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bucketed.collect())
    )


def test_sample_neighborhoods_shared_sampling_is_consistent(spark):
    """Two roots that reach the same hop-2 parent see the SAME sampled
    children (per-hop shared sampling)."""
    pairs = [(0, 2), (1, 2), (2, 3), (2, 4), (2, 5), (2, 6)]
    out = algorithms.sample_neighborhoods(
        _edges(spark, pairs), fanouts=(1, 2)
    ).collect()
    kids = {}
    for r in out:
        if r["hop"] == 2 and r["parent"] == 2:
            kids.setdefault(r["root"], set()).add(r["vertex"])
    assert kids[0] == kids[1] and len(kids[0]) == 2


# ---------------------------------------------------------------------------
# K4 counting
# ---------------------------------------------------------------------------


def test_k4_complete_graphs(spark):
    """K5 contains C(5,4)=5 K4s; K4 + pendant edge contains exactly 1."""
    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    assert algorithms.k4_count(_edges(spark, k5)) == 5
    k4p = [(a, b) for a in range(4) for b in range(4) if a < b] + [(3, 4)]
    assert algorithms.k4_count(_edges(spark, k4p)) == 1


def test_k4_none_in_triangle_free_or_sparse(spark):
    assert algorithms.k4_count(_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])) == 0
    # a triangle alone has no K4
    assert algorithms.k4_count(_edges(spark, [(0, 1), (1, 2), (2, 0)])) == 0


def test_k4_matches_bruteforce_on_random_graph(spark):
    import itertools

    rng = np.random.default_rng(7)
    n = 12
    pairs = [(a, b) for a in range(n) for b in range(n)
             if a < b and rng.random() < 0.45]
    got = algorithms.k4_count(_edges(spark, pairs))
    eset = set(pairs)
    want = sum(
        1
        for q in itertools.combinations(range(n), 4)
        if all((x, y) in eset for x, y in itertools.combinations(q, 2))
    )
    assert got == want and want > 0


def test_walk_cooccurrence_matches_python_replay(spark):
    """Replay the deterministic walks in pure Python (same sha256 rule)
    and recount window-2 pairs + PMI."""
    import hashlib
    import math

    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (2, 0)]
    got = {
        (r["center"], r["context"]): (r["n"], r["pmi"])
        for r in algorithms.walk_cooccurrence(
            _edges(spark, pairs), walk_length=3, num_walks=2, window=2
        ).collect()
    }
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
    for v in adj:
        adj[v].sort()
    verts = sorted({x for p in pairs for x in p})
    walks = []
    for start in verts:
        for wid in range(2):
            cur, trail = start, [start]
            for step in range(1, 4):
                nbrs = adj.get(cur)
                if nbrs:
                    h = int(
                        hashlib.sha256(
                            f"walk:{start}:{wid}:{step}".encode()
                        ).hexdigest()[:8],
                        16,
                    )
                    cur = nbrs[h % len(nbrs)]
                trail.append(cur)
            walks.append(trail)
    counts = {}
    for t in walks:
        for i, c in enumerate(t):
            for j, x in enumerate(t):
                if i != j and abs(i - j) <= 2:
                    counts[(c, x)] = counts.get((c, x), 0) + 1
    tot = sum(counts.values())
    nc, nx = {}, {}
    for (c, x), n in counts.items():
        nc[c] = nc.get(c, 0) + n
        nx[x] = nx.get(x, 0) + n
    want = {
        k: (n, round(math.log(n * tot / (nc[k[0]] * nx[k[1]])), 6))
        for k, n in counts.items()
    }
    assert got == want


# ---------------------------------------------------------------------------
# iFUB exact diameter
# ---------------------------------------------------------------------------


def test_diameter_ifub_known_shapes(spark):
    path = [(i, i + 1) for i in range(9)]
    row = algorithms.diameter_ifub(_edges(spark, path)).first()
    assert row["diameter"] == 9 and row["certified"] == 1
    cycle = [(i, (i + 1) % 8) for i in range(8)]
    assert algorithms.diameter_ifub(_edges(spark, cycle)).first()["diameter"] == 4
    star = [(0, i) for i in range(1, 6)]
    assert algorithms.diameter_ifub(_edges(spark, star)).first()["diameter"] == 2


def test_diameter_ifub_matches_bruteforce_random(spark):
    rng = np.random.default_rng(3)
    n = 25
    pairs = [(a, b) for a in range(n) for b in range(n)
             if a < b and rng.random() < 0.12]
    # brute force undirected BFS from every vertex
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    root = min(min(a, b) for a, b in pairs)
    # component of root
    comp, frontier = {root}, {root}
    while frontier:
        nxt = set()
        for v in frontier:
            nxt |= adj.get(v, set())
        frontier = nxt - comp
        comp |= nxt
    def bfs_ecc(s):
        dist, frontier, d = {s: 0}, {s}, 0
        while frontier:
            d += 1
            nxt = set()
            for v in frontier:
                for u in adj.get(v, ()):
                    if u not in dist:
                        dist[u] = d
                        nxt.add(u)
            frontier = nxt
        return max(dist.values())
    want = max(bfs_ecc(s) for s in comp)
    row = algorithms.diameter_ifub(_edges(spark, pairs)).first()
    assert row["diameter"] == want
    # the point of iFUB: far fewer BFS runs than vertices
    assert row["n_bfs"] <= len(comp)


def test_diameter_ifub_uses_root_component_only(spark):
    pairs = [(0, 1), (1, 2)] + [(10, 11), (11, 12), (12, 13), (13, 14)]
    row = algorithms.diameter_ifub(_edges(spark, pairs)).first()
    # max undirected degree is 2, shared by {1, 11, 12, 13}; lowest-id tie
    # rule picks root 1, whose component is the 3-path — diameter 2, not
    # the longer chain's 4.
    assert row["root"] == 1 and row["diameter"] == 2


def test_influence_spread_matches_python_live_edge_bfs(spark):
    """IC spread == BFS over the live-edge subgraph: replay the
    multiplicative-hash coin and the min-hop BFS in plain python on a
    random digraph and require identical (vertex, hops) maps, including
    isolated seeds and the hop cap."""
    from flexgraph_spark.algorithms import INFLUENCE_MOD, influence_spread
    from flexgraph_spark import fixtures

    raw = fixtures.rand_er(60, 0.06, seed=7)
    seeds = [0, 17, 34, 51, 59]
    p, cseed, max_hops = 0.5, 3, 4
    cutoff = int(p * INFLUENCE_MOD)
    live = [
        (s, d) for s, d in raw
        if s != d and (s * 2654435761 + d * 40503 + cseed * 97003)
        % INFLUENCE_MOD < cutoff
    ]
    adj = {}
    for s, d in live:
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
    edges = fixtures.edges_df(spark, raw)
    seeds_df = spark.createDataFrame([(v,) for v in seeds], "vertex long")
    got = {
        r.vertex: r.hops
        for r in influence_spread(
            edges, seeds_df, p=p, cascade_seed=cseed, max_hops=max_hops
        ).collect()
    }
    assert got == dist




def test_bridges_hand_graph(spark):
    from flexgraph_spark import fixtures
    from flexgraph_spark.oracle import py_bridges as _py_bridges
    raw = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5), (5, 6),
           (10, 11)]
    got = {(r.a, r.b) for r in
           algorithms.bridges(fixtures.edges_df(spark, raw)).collect()}
    assert got == {(2, 3), (5, 6), (10, 11)}


def test_bridges_random_vs_tarjan(spark):
    from flexgraph_spark import fixtures
    from flexgraph_spark.oracle import py_bridges as _py_bridges
    raw = fixtures.rand_er(80, 0.035, seed=11)
    got = {(r.a, r.b) for r in
           algorithms.bridges(fixtures.edges_df(spark, raw)).collect()}
    assert got == _py_bridges(raw)


def test_two_edge_components_hand_graph(spark):
    from flexgraph_spark import fixtures
    raw = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5), (5, 6),
           (10, 11)]
    got = {r.vertex: r.ecc_label for r in
           algorithms.two_edge_components(
               fixtures.edges_df(spark, raw)).collect()}
    # triangles survive; every bridge endpoint pair splits
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == got[5] == 3
    assert got[6] == 6 and got[10] == 10 and got[11] == 11


def test_vertex_cover_valid_and_2approx(spark):
    from flexgraph_spark import fixtures
    raw = fixtures.rand_er(60, 0.08, seed=3)
    edges = fixtures.edges_df(spark, raw)
    cover = {r.vertex for r in algorithms.vertex_cover(edges).collect()}
    # validity: every edge has an endpoint in the cover
    for s, d in raw:
        if s != d:
            assert s in cover or d in cover
    # 2-approx certificate: cover size == 2 * matching size
    m = algorithms.maximal_matching(edges).state.count()
    assert len(cover) == 2 * m


def test_feature_propagation_mean_and_isolated(spark):
    """One round on a hand graph: v's feature becomes the mean of its
    in-neighbors; isolated / in-degree-0 vertices keep their own."""
    edges = spark.createDataFrame([(1, 3), (2, 3), (3, 1)], "src long, dst long")
    feats = spark.createDataFrame(
        [(1, [10.0, 0.0]), (2, [20.0, 2.0]), (3, [0.0, 4.0]), (9, [7.0, 7.0])],
        "vec_id long, embedding array<float>",
    )
    got = {(r.vertex, r.j): r.x for r in
           algorithms.feature_propagation(edges, feats, k=1).collect()}
    assert got[(3, 0)] == 15.0 and got[(3, 1)] == 1.0   # mean of 1,2
    assert got[(1, 0)] == 0.0 and got[(1, 1)] == 4.0    # from 3
    assert got[(2, 0)] == 20.0                           # in-degree 0: kept
    assert got[(9, 0)] == 7.0                            # not in graph: kept
    # two rounds: v1 gets round-1 value of v3
    got2 = {(r.vertex, r.j): r.x for r in
            algorithms.feature_propagation(edges, feats, k=2).collect()}
    assert got2[(1, 0)] == 15.0


def test_closeness_sampled_star_graph(spark):
    """Star center: distance 1 from every leaf landmark -> closeness 1;
    leaves: 1 to the center-landmark? No — landmarks {0,1}: center 0 at
    dist 0 from itself and 1 from leaf-landmark 1; leaves at dist 1 from
    0 and 2 from 1 (through the center)."""
    from flexgraph_spark import fixtures

    raw = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    edges = fixtures.edges_df(spark, raw)
    got = {r.vertex: (r.n_samples, r.avg_dist, r.closeness_est)
           for r in algorithms.closeness_sampled(edges, [0, 1]).collect()}
    assert got[0] == (2, 0.5, 2.0)       # dists 0 and 1
    assert got[2] == (2, 1.5, 0.666667)  # dists 1 and 2
    assert got[1] == (2, 0.5, 2.0)       # 1 from 0, 0 from itself


def test_bridges_auto_deepens_past_max_depth(spark):
    """Regression: a BFS forest truncated by max_depth used to classify
    unreached vertices' edges as non-tree, silently poisoning the XOR
    signatures. bridges() now detects the truncation and auto-doubles —
    every edge of a depth-13 path graph is a bridge even at max_depth=4."""
    from flexgraph_spark import fixtures
    raw = [(i, i + 1) for i in range(13)]
    got = {(r.a, r.b) for r in algorithms.bridges(
        fixtures.edges_df(spark, raw), max_depth=4).collect()}
    assert got == set(raw)


def test_weighted_kcore_hand_graph(spark):
    """Triangle with heavy weights survives t=4; a pendant with weight 1
    peels, and its removal does not cascade into the triangle."""
    rows = [(0, 1, 2.0), (1, 2, 2.0), (0, 2, 2.0), (2, 3, 1.0)]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    res = algorithms.weighted_kcore(e, t=4.0)
    assert {r.vertex for r in res.state.collect()} == {0, 1, 2}
    assert res.converged
    # duplicate/reverse edges collapse to the canonical min weight
    e2 = spark.createDataFrame(
        rows + [(1, 0, 9.0)], "src long, dst long, weight double")
    assert {r.vertex for r in algorithms.weighted_kcore(e2, t=4.0)
            .state.collect()} == {0, 1, 2}


def test_weighted_kcore_total_collapse(spark):
    """A chain of weight-1 edges at t=2 unravels end-in: bounded rounds
    stop mid-peel; enough rounds reach the empty fixpoint."""
    rows = [(i, i + 1, 1.0) for i in range(6)]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    full = algorithms.weighted_kcore(e, t=2.0)
    assert full.converged and full.state.count() == 0
    one = algorithms.weighted_kcore(e, t=2.0, max_rounds=1)
    assert not one.converged and one.state.count() == 5  # endpoints peeled


def test_articulation_points_hand_graphs(spark):
    from flexgraph_spark import fixtures

    # two triangles sharing vertex 2, a pendant chain off 5, an isolated edge
    raw = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5), (5, 6),
           (10, 11)]
    got = [r.vertex for r in algorithms.articulation_points(
        fixtures.edges_df(spark, raw)).collect()]
    assert got == [2, 4, 5]
    # simple cycle: no articulation points at all
    ring = [(i, (i + 1) % 6) for i in range(6)]
    assert algorithms.articulation_points(
        fixtures.edges_df(spark, ring)).count() == 0
    # path: every interior vertex cuts
    path = [(i, i + 1) for i in range(5)]
    got = [r.vertex for r in algorithms.articulation_points(
        fixtures.edges_df(spark, path)).collect()]
    assert got == [1, 2, 3, 4]


def test_articulation_points_random_vs_tarjan(spark):
    from flexgraph_spark import fixtures
    from flexgraph_spark.oracle import py_articulation

    for seed, p in ((11, 0.035), (3, 0.08), (7, 0.02)):
        raw = fixtures.rand_er(60, p, seed=seed)
        got = {r.vertex for r in algorithms.articulation_points(
            fixtures.edges_df(spark, raw)).collect()}
        assert got == py_articulation(raw), (seed, p)


def test_articulation_points_auto_deepens(spark):
    from flexgraph_spark import fixtures

    path = [(i, i + 1) for i in range(13)]
    got = [r.vertex for r in algorithms.articulation_points(
        fixtures.edges_df(spark, path), max_depth=4).collect()]
    assert got == list(range(1, 13))


def test_biconnected_components_hand_and_bridges(spark):
    from flexgraph_spark import fixtures

    raw = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5), (5, 6),
           (10, 11)]
    rows = algorithms.biconnected_components(
        fixtures.edges_df(spark, raw)).collect()
    groups = {}
    for r in rows:
        groups.setdefault(r.bcc_id, set()).add((r.a, r.b))
    got = {frozenset(g) for g in groups.values()}
    want = {frozenset({(0, 1), (1, 2), (0, 2)}),
            frozenset({(2, 3), (3, 4), (2, 4)}),
            frozenset({(4, 5)}), frozenset({(5, 6)}),
            frozenset({(10, 11)})}
    assert got == want
    # singleton blocks == bridges (by construction, two different routes)
    singles = {next(iter(g)) for g in got if len(g) == 1}
    br = {(r.a, r.b) for r in algorithms.bridges(
        fixtures.edges_df(spark, raw)).collect()}
    assert singles == br


def test_biconnected_components_random_vs_tarjan(spark):
    from flexgraph_spark import fixtures
    from flexgraph_spark.oracle import py_biconnected

    for seed, p in ((11, 0.035), (3, 0.08)):
        raw = fixtures.rand_er(50, p, seed=seed)
        rows = algorithms.biconnected_components(
            fixtures.edges_df(spark, raw)).collect()
        groups = {}
        for r in rows:
            groups.setdefault(r.bcc_id, set()).add((r.a, r.b))
        got = {frozenset(g) for g in groups.values()}
        want = {frozenset(b) for b in py_biconnected(raw)}
        assert got == want, (seed, p)
