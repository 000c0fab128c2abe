"""Pure-NumPy reference oracles implementing the *reference's exact
semantics* (not textbook variants) for golden tests.

PageRank follows PageRankComputation.java:232-256 — teleport (1-α)/n, NO
dangling-mass redistribution during iteration, convergence when every
per-vertex |Δ| ≤ threshold, then post-hoc normalization by the rank sum.
"""

from __future__ import annotations

import numpy as np

SSSP_INF = 8.988465674311579e307


def _to_arrays(edges, n):
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    return src, dst


def pagerank(edges, n, alpha=0.85, threshold=1e-8, max_iter=100, source=None):
    """Returns normalized ranks, dict vertex -> rank for vertices 0..n-1.

    ``edges`` may address a sparse id space; ``n`` = number of vertices and
    ids are assumed in [0, n) (remap first otherwise).
    """
    src, dst = _to_arrays(edges, n)
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    if source is None:
        v = np.full(n, 1.0 / n)
    else:
        v = np.zeros(n)
        v[source] = 1.0
    safe_deg = np.where(out_deg > 0, out_deg, 1.0)
    for _ in range(max_iter):
        contrib = v[src] / safe_deg[src]
        msg = np.zeros(n)
        np.add.at(msg, dst, contrib)
        new = alpha * msg + (1.0 - alpha) / n
        if np.all(np.abs(new - v) <= threshold):
            v = new
            break
        v = new
    v = v / v.sum()
    return v


def connected_components(edges, n):
    """Min-label WCC over the symmetrized graph; label = min reachable id."""
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return np.array([find(i) for i in range(n)])


def sssp(edges_weighted, n, source):
    """Bellman-Ford with the reference's MAX/2 unreachable sentinel."""
    dist = np.full(n, SSSP_INF)
    dist[source] = 0.0
    for _ in range(n):
        changed = False
        for s, d, w in edges_weighted:
            if dist[s] < SSSP_INF and dist[s] + w < dist[d]:
                dist[d] = dist[s] + w
                changed = True
        if not changed:
            break
    return dist


def label_propagation(edges, n, max_iter=100):
    """Synchronous majority LP, tie-break lowest label, over edges as given
    (symmetrize first for undirected semantics). Mirrors the Spark program."""
    labels = np.arange(n, dtype=np.int64)
    in_nbrs = [[] for _ in range(n)]
    for s, d in edges:
        in_nbrs[d].append(s)
    for _ in range(max_iter):
        new = labels.copy()
        for v in range(n):
            if not in_nbrs[v]:
                continue
            counts = {}
            for u in in_nbrs[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def triangle_count(edges, n):
    """Exact triangle count of the undirected simple graph."""
    adj = np.zeros((n, n), dtype=bool)
    for s, d in edges:
        if s != d:
            adj[s, d] = True
            adj[d, s] = True
    a = adj.astype(np.int64)
    return int(np.trace(a @ a @ a) // 6)


def py_bridges(raw):
    """Plain-python iterative Tarjan bridge finder (low-link): the
    independent reference for algorithms.bridges' XOR-coverage
    construction (property-based gates + hand tests)."""
    adj = {}
    for s, d in raw:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    disc, low = {}, {}
    out = set()
    t = [0]
    for root in sorted(adj):
        if root in disc:
            continue
        stack = [(root, None, iter(sorted(adj[root])))]
        disc[root] = low[root] = t[0]; t[0] += 1
        while stack:
            u, parent, it = stack[-1]
            advanced = False
            for v in it:
                if v not in disc:
                    disc[v] = low[v] = t[0]; t[0] += 1
                    stack.append((v, u, iter(sorted(adj[v]))))
                    advanced = True
                    break
                elif v != parent:
                    low[u] = min(low[u], disc[v])
            if not advanced:
                stack.pop()
                if parent is not None:
                    low[parent] = min(low[parent], low[u])
                    if low[u] > disc[parent]:
                        out.add((min(u, parent), max(u, parent)))
    return out


def py_articulation(raw):
    """Plain-python iterative Tarjan articulation-point finder (low-link
    with DFS-root child counting): the independent reference for
    algorithms.articulation_points' Tarjan–Vishkin construction
    (property-based gates + hand tests)."""
    adj = {}
    for s, d in raw:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    disc, low = {}, {}
    arts = set()
    t = [0]
    for root in sorted(adj):
        if root in disc:
            continue
        root_children = 0
        stack = [(root, None, iter(sorted(adj[root])))]
        disc[root] = low[root] = t[0]
        t[0] += 1
        while stack:
            u, parent, it = stack[-1]
            advanced = False
            for v in it:
                if v not in disc:
                    disc[v] = low[v] = t[0]
                    t[0] += 1
                    stack.append((v, u, iter(sorted(adj[v]))))
                    advanced = True
                    break
                elif v != parent:
                    low[u] = min(low[u], disc[v])
            if not advanced:
                stack.pop()
                if parent is not None:
                    low[parent] = min(low[parent], low[u])
                    if parent == root:
                        root_children += 1
                    elif low[u] >= disc[parent]:
                        arts.add(parent)
        if root_children >= 2:
            arts.add(root)
    return arts


def py_biconnected(raw):
    """Plain-python Tarjan biconnected components (edge-stack algorithm):
    returns a list of blocks, each a set of canonical (a, b) edges — the
    independent reference for algorithms.biconnected_components."""
    adj = {}
    for s, d in raw:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    disc, low = {}, {}
    t = [0]
    blocks = []
    estack = []
    for root in sorted(adj):
        if root in disc:
            continue
        stack = [(root, None, iter(sorted(adj[root])))]
        disc[root] = low[root] = t[0]
        t[0] += 1
        while stack:
            u, parent, it = stack[-1]
            advanced = False
            for v in it:
                if v not in disc:
                    estack.append((min(u, v), max(u, v)))
                    disc[v] = low[v] = t[0]
                    t[0] += 1
                    stack.append((v, u, iter(sorted(adj[v]))))
                    advanced = True
                    break
                elif v != parent and disc[v] < disc[u]:
                    estack.append((min(u, v), max(u, v)))
                    low[u] = min(low[u], disc[v])
            if not advanced:
                stack.pop()
                if parent is not None:
                    low[parent] = min(low[parent], low[u])
                    if low[u] >= disc[parent]:
                        blk = set()
                        key = (min(u, parent), max(u, parent))
                        while True:
                            e = estack.pop()
                            blk.add(e)
                            if e == key:
                                break
                        blocks.append(blk)
    return blocks
