"""User-facing algorithms over an edge DataFrame (src long, dst long[, weight]).

Iterative ones run on the GIM-V runner (flat plan by default, blocked
skew-aware plan via engine='blocked'); triangle counting is a one-shot
degree-oriented join plan.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from flexgraph_spark import gimv
from flexgraph_spark.gimv import GimvResult, IterationMetrics, truncate_plan
from flexgraph_spark.graph import symmetrize

# Flat-vs-blocked crossover (measured, BENCH/BASELINE.md round 2): the
# blocked CSR engine wins when each core chews through millions of edges
# per superstep (2x flat per-core at 25M edges/core on the skewed 50M
# graph); below ~1M edges/core the per-block Python/Arrow fixed cost
# dominates and the flat plan wins. "auto" picks by edge count per core.
AUTO_EDGES_PER_CORE = 1_000_000


def choose_engine(edges: DataFrame, p: int | None = None) -> str:
    """Pick 'flat' or 'blocked' from the measured crossover: blocked when
    the per-core edge volume is high enough to amortize its per-superstep
    Arrow/NumPy fixed costs. One count() job (the runners need it anyway).
    """
    spark = edges.sparkSession
    cores = p or int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_edges = edges.count()
    return "blocked" if n_edges >= AUTO_EDGES_PER_CORE * cores else "flat"


def _dispatch(edges, prog, engine, max_iter, checkpointer, kw) -> gimv.GimvResult:
    """Route to the flat or blocked runner; ``engine='auto'`` applies the
    measured crossover (pre-built blocks force 'blocked'). Partitioning
    kwargs are translated between the engines' vocabularies
    (num_partitions <-> p) so auto callers can pass either."""
    if engine == "auto":
        if kw.get("blocks") is not None:
            engine = "blocked"
        else:
            engine = choose_engine(edges, kw.get("p") or kw.get("num_partitions"))
    if engine == "blocked":
        from flexgraph_spark import blocks

        bkw = dict(kw)
        if bkw.pop("initial_state", None) is not None:
            raise ValueError(
                "warm start (initial_state) is a flat-engine feature; the "
                "blocked engine resumes from durable checkpoints instead"
            )
        if "num_partitions" in bkw:
            bkw["p"] = bkw.pop("num_partitions")
        return blocks.run_blocked(
            edges, prog, max_iter=max_iter, checkpointer=checkpointer, **bkw
        )
    fkw = dict(kw)
    fkw.pop("dense_threshold", None)
    fkw.pop("blocks", None)
    if "p" in fkw:
        fkw["num_partitions"] = fkw.pop("p")
    return gimv.run(edges, prog, max_iter=max_iter, checkpointer=checkpointer, **fkw)


def pagerank(
    edges: DataFrame,
    alpha: float = gimv.PAGERANK_ALPHA,
    threshold: float = gimv.CONVERGE_THRESHOLD,
    max_iter: int = 100,
    source_vertex: int | None = None,
    checkpointer=None,
    engine: str = "flat",
    weighted: bool = False,
    **kw,
) -> gimv.GimvResult:
    """``weighted=True`` distributes rank proportionally to edge weight;
    requires a weight column. The flat engine runs gimv.WeightedPageRank
    (weighted out-degree in the join); other engines pre-normalize the
    weights to per-source fractions once (one setup join) and run
    gimv.NormalizedWeightedPageRank, whose kernels need no
    weighted-degree sidecar — so the blocked CSR plan serves weighted
    PageRank with the SAME block format it uses for SSSP."""
    if weighted:
        if "weight" not in edges.columns:
            raise ValueError("weighted PageRank needs a 'weight' column")
        if engine == "flat":
            prog = gimv.WeightedPageRank(
                alpha=alpha, threshold=threshold, source_vertex=source_vertex
            )
        else:
            wsum = edges.groupBy("src").agg(F.sum("weight").alias("_wsum"))
            edges = edges.join(wsum, "src").select(
                "src", "dst",
                (F.col("weight") / F.col("_wsum")).alias("weight"),
            )
            prog = gimv.NormalizedWeightedPageRank(
                alpha=alpha, threshold=threshold, source_vertex=source_vertex
            )
    else:
        prog = gimv.PageRank(
            alpha=alpha, threshold=threshold, source_vertex=source_vertex
        )
    return _dispatch(edges, prog, engine, max_iter, checkpointer, kw)


def pagerank_standard(
    edges: DataFrame,
    alpha: float = gimv.PAGERANK_ALPHA,
    threshold: float = gimv.CONVERGE_THRESHOLD,
    max_iter: int = 100,
    num_partitions: int | None = None,
    checkpointer=None,
) -> gimv.GimvResult:
    """Textbook PageRank (gimv.StandardPageRank): dangling rank mass is
    redistributed uniformly each superstep, so Σr = 1 is conserved and no
    post-hoc normalization happens — the semantics NetworkX/GraphX users
    expect, alongside the reference-faithful :func:`pagerank`. The
    dangling set is one anti-join at setup; the per-superstep mass uses
    the global_agg broadcast hook (no driver round-trip)."""
    dangling = (
        edges.select(F.col("dst").alias("vertex"))
        .distinct()
        .join(edges.select(F.col("src").alias("vertex")).distinct(),
              "vertex", "left_anti")
    )
    prog = gimv.StandardPageRank(
        dangling=dangling, alpha=alpha, threshold=threshold
    )
    return gimv.run(
        edges, prog, max_iter=max_iter, num_partitions=num_partitions,
        checkpointer=checkpointer,
    )


def connected_components(
    edges: DataFrame, max_iter: int = 100, checkpointer=None, engine: str = "flat", **kw
) -> gimv.GimvResult:
    """True WCC: symmetrizes explicitly (the reference's cc.sh does not —
    SURVEY.md §3.2 discrepancy). Weights are irrelevant to CC and would
    turn the (src, dst)-distinct into per-weight parallel edges, so they
    are dropped before symmetrizing.

    ``initial_state=`` (via the generic warm start in gimv.run) makes
    this incremental for edge ADDITIONS: old labels are per-vertex upper
    bounds on the true min-id and HashMin is monotone from any
    upper-bound init, so the warm run reaches the identical fixpoint in
    no more supersteps (pointwise dominance). After edge DELETIONS old
    labels can undershoot — recompute cold."""
    return _dispatch(
        symmetrize(edges.select("src", "dst")), gimv.ConnectedComponents(),
        engine, max_iter, checkpointer, kw,
    )


def sssp(
    edges: DataFrame,
    source_vertex: int,
    max_iter: int = 100,
    checkpointer=None,
    engine: str = "flat",
    **kw,
) -> gimv.GimvResult:
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1.0))
    return _dispatch(
        edges, gimv.SSSP(source_vertex), engine, max_iter, checkpointer, kw
    )


def label_propagation(
    edges: DataFrame, max_iter: int = 20, checkpointer=None, engine: str = "flat", **kw
) -> gimv.GimvResult:
    """Majority-label propagation (lowest-label ties) on symmetrized edges.
    ``engine='blocked'`` runs the label_count kernel family
    (blocks.run_blocked) — per-(dst, label) count partials, fused
    count-merge + argmax reduce. Weights are dropped first: LP's majority
    vote counts distinct (src, dst) pairs, and weight-distinct parallel
    edges would double-count."""
    return _dispatch(
        symmetrize(edges.select("src", "dst")), gimv.LabelPropagation(),
        engine, max_iter, checkpointer, kw,
    )


def weighted_label_propagation(
    edges: DataFrame, max_iter: int = 20, checkpointer=None,
    engine: str = "flat", **kw
) -> gimv.GimvResult:
    """Weight-summed majority LP (gimv.WeightedLabelPropagation): adopt
    the label with the largest incident edge-weight sum, ties → lowest
    label. The graph is canonicalized first — directed duplicates merge
    to ONE undirected weight per pair (sum), then both directions vote —
    so (a→b, 2) + (b→a, 3) is a single strength-5 tie between the
    endpoints, not two double-counted votes. Integer-valued weights keep
    tie detection exact. ``engine='blocked'`` runs the label_count
    kernel family with weighted votes (weights ride the CSR blocks;
    same argmax/tie rule — see gimv.WeightedLabelPropagation)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "weight",
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("weight").alias("weight"))
    )
    sym = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "weight"
    ).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "weight")
    )
    return _dispatch(
        sym, gimv.WeightedLabelPropagation(), engine, max_iter,
        checkpointer, kw,
    )


def degrees(edges: DataFrame, direction: str = "out", weighted: bool = False) -> DataFrame:
    from flexgraph_spark.graph import degrees as _d

    return _d(edges, direction, weighted=weighted)


def batch_ppr(
    edges: DataFrame,
    sources: list[int],
    max_iter: int = 10,
    alpha: float = gimv.PAGERANK_ALPHA,
    threshold: float = gimv.CONVERGE_THRESHOLD,
    checkpointer=None,
    engine: str = "flat",
    **kw,
) -> gimv.GimvResult:
    """Personalized PageRank for ALL ``sources`` in one job: the GIM-V
    state carries a k-vector per vertex, so every superstep is still one
    edge scan + one state shuffle (see gimv.BatchPPR). ``engine='blocked'``
    runs the 'batch' CSR kernel family — a flattened (n_local × k) matrix
    per block, one skew-aware gather-scatter per superstep for all k
    columns. Result state value is array<double> aligned with
    ``sources``; use :func:`ppr_long` for the exploded
    (vertex, source, ppr) face."""
    return _dispatch(
        edges, gimv.BatchPPR(sources, alpha=alpha, threshold=threshold),
        engine, max_iter, checkpointer, kw,
    )


def landmark_distances(
    edges: DataFrame,
    landmarks: list[int],
    max_iter: int = 100,
    checkpointer=None,
    engine: str = "flat",
    **kw,
) -> gimv.GimvResult:
    """Shortest-path distances from ALL ``landmarks`` in one job: the
    GIM-V state carries a k-vector of distances per vertex (gimv.BatchSSSP
    min-plus columns), so every superstep is still one edge scan + one
    state shuffle no matter how many landmarks — the batch face of
    :func:`sssp`, and the standard preprocessing step for landmark-based
    distance estimation on web graphs. Unweighted graphs get weight=1.0
    (hop counts / multi-source BFS). Use :func:`landmark_long` for the
    exploded (vertex, landmark, dist) face. ``engine='blocked'`` runs the
    'batch' CSR kernel family under the min reduce — one skew-aware
    (n_local × k) gather-scatter per superstep for all k landmarks."""
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1.0))
    return _dispatch(
        edges, gimv.BatchSSSP(landmarks), engine, max_iter, checkpointer, kw
    )


def landmark_long(res: gimv.GimvResult, landmarks: list[int]) -> DataFrame:
    """Explode a landmark_distances result to (vertex, landmark, dist)
    rows, dropping unreached (vertex, landmark) pairs."""
    lm_arr = F.array(*[F.lit(int(s)) for s in landmarks])
    return (
        res.state.select("vertex", F.posexplode("value").alias("idx", "dist"))
        .filter(F.col("dist") < gimv.SSSP_INF)
        .select(
            "vertex",
            F.element_at(lm_arr, F.col("idx") + 1).cast("long").alias("landmark"),
            "dist",
        )
    )


def earliest_arrival(
    edges: DataFrame,
    source_vertex: int,
    start_time: float = 0.0,
    dur: float = 0.0,
    max_iter: int = 100,
    checkpointer=None,
    engine: str = "flat",
    **kw,
) -> gimv.GimvResult:
    """Time-respecting earliest-arrival reachability on a temporal graph.
    ``edges`` must carry (src, dst, t) where t is the edge timestamp as a
    double (epoch seconds / day number); an edge is traversable only when
    its t >= the current arrival time at src, and arrival via the edge is
    t + ``dur``. Parallel (src, dst) edges at different times are distinct
    opportunities — do NOT dedupe. Returns per-vertex earliest arrival
    (gimv.SSSP_INF = never reachable respecting time order)."""
    if "t" in edges.columns and "weight" not in edges.columns:
        edges = edges.withColumnRenamed("t", "weight")
    if "weight" not in edges.columns:
        raise ValueError("earliest_arrival needs a 't' (or 'weight') column")
    return _dispatch(
        edges,
        gimv.EarliestArrival(source_vertex, start_time=start_time, dur=dur),
        engine, max_iter, checkpointer, kw,
    )


def latest_departure(
    edges: DataFrame,
    target_vertex: int,
    deadline: float,
    dur: float = 0.0,
    max_iter: int = 100,
    engine: str = "flat",
    **kw,
) -> DataFrame:
    """Latest time one can LEAVE each vertex and still reach
    ``target_vertex`` by ``deadline`` respecting time order — the dual of
    :func:`earliest_arrival`, solved by the same program on the reversed
    graph under negation: with t' = -(t + dur), departure(v) =
    -arrival'(v) and the deadline becomes the start time. Returns
    (vertex, departure), dropping vertices that cannot make it."""
    if "t" in edges.columns and "weight" not in edges.columns:
        edges = edges.withColumnRenamed("t", "weight")
    if "weight" not in edges.columns:
        raise ValueError("latest_departure needs a 't' (or 'weight') column")
    rev = edges.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        (-(F.col("weight") + F.lit(float(dur)))).alias("weight"),
    )
    res = _dispatch(
        rev,
        gimv.EarliestArrival(target_vertex, start_time=-float(deadline),
                             dur=float(dur)),
        engine, max_iter, None, kw,
    )
    return res.state.filter(F.col("value") < gimv.SSSP_INF).select(
        "vertex", (-F.col("value")).alias("departure")
    )


def fastest_path(
    edges: DataFrame,
    source_vertex: int,
    dur: float = 0.0,
    max_iter: int = 100,
    max_departures: int = 64,
    engine: str = "flat",
    **kw,
) -> DataFrame:
    """Fastest time-respecting path durations from ``source_vertex``:
    min over feasible departures of (arrival - departure). The optimal
    departure is always one of the source's out-edge timestamps, so this
    runs ONE :class:`gimv.BatchEarliestArrival` job with a column per
    distinct departure time (ascending, capped at ``max_departures`` —
    exact when the source has at most that many distinct out-times, a
    documented earliest-departures approximation beyond). Returns
    (vertex, duration) for vertices reachable respecting time order."""
    if "t" in edges.columns and "weight" not in edges.columns:
        edges = edges.withColumnRenamed("t", "weight")
    if "weight" not in edges.columns:
        raise ValueError("fastest_path needs a 't' (or 'weight') column")
    deps = [
        float(r.weight)
        for r in edges.filter(F.col("src") == int(source_vertex))
        .select("weight").distinct().orderBy("weight")
        .limit(int(max_departures)).collect()
    ]
    if not deps:
        spark = edges.sparkSession
        return spark.createDataFrame(
            [(int(source_vertex), 0.0)], "vertex long, duration double"
        )
    res = _dispatch(
        edges,
        gimv.BatchEarliestArrival(int(source_vertex), deps, dur=dur),
        engine, max_iter, None, kw,
    )
    dep_arr = F.array(*[F.lit(d) for d in deps])
    dur_col = F.array_min(
        F.zip_with(
            "value", dep_arr,
            lambda a, d: F.when(a < gimv.SSSP_INF, a - d),
        )
    )
    return (
        res.state.select("vertex", dur_col.alias("duration"))
        .filter(F.col("duration").isNotNull())
    )


def landmark_estimates(
    res: gimv.GimvResult, pairs: DataFrame
) -> DataFrame:
    """Landmark (ALT-style) distance estimates: for each (u, v) row of
    ``pairs``, est = min over landmarks of d(L,u) + d(L,v) — an upper
    bound on d(u, v) when the landmark run used symmetrized edges (the
    Das Sarma et al. sketch estimator). ``res`` is a
    :func:`landmark_distances` result; pairs with no landmark reaching
    both sides are dropped. One broadcast-sized pair table joins the
    state twice; the arithmetic is a zip_with + array_min, no shuffle
    beyond the two joins."""
    su = res.state.select(F.col("vertex").alias("u"), F.col("value").alias("_du"))
    sv = res.state.select(F.col("vertex").alias("v"), F.col("value").alias("_dv"))
    return (
        pairs.join(su, "u")
        .join(sv, "v")
        .select(
            "u", "v",
            F.array_min(
                F.zip_with("_du", "_dv", lambda a, b: a + b)
            ).alias("est"),
        )
        .filter(F.col("est") < gimv.SSSP_INF)
    )


def wl_graph_hash(res: gimv.GimvResult) -> DataFrame:
    """Whole-graph WL fingerprint from a :func:`wl_colors` result: the
    commutative hash-sum of the color HISTOGRAM (color, count) — equal
    for 1-WL-equivalent graphs at that depth, order- and partitioning-
    invariant, and one row out no matter the graph size (groupBy color,
    then a single decimal sum — no global sort, no collect)."""
    from flexgraph_spark.sketches import sha_long

    hist = res.state.groupBy(F.col("value").alias("color")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return hist.agg(
        F.sum(
            sha_long(
                F.concat_ws(":", F.col("color"), F.col("cnt")), "wl-g"
            ).cast("decimal(38,0)")
        ).cast("string").alias("fingerprint")
    )


def kcenter(
    edges: DataFrame,
    k: int,
    start_vertex: int | None = None,
    max_iter: int = 100,
    symmetrize_edges: bool = True,
    **kw,
) -> DataFrame:
    """Greedy k-center (farthest-first traversal, Gonzalez 1985 — the
    2-approximation, and the k-center CORESET selector for data
    selection): start from ``start_vertex`` (default lowest id), then
    k-1 times add the vertex FARTHEST from the chosen set (ties ->
    lowest id; unreached vertices are infinitely far, so new components
    get covered first). Each round is one batched landmark job over the
    current centers; the driver only takes one argmax row per round.
    Returns the final assignment (vertex, center, dist) — nearest center
    by hop distance, ties to the earliest-chosen center — dropping
    vertices no center reaches within ``max_iter`` hops."""
    from flexgraph_spark.graph import symmetrize

    if k < 1:
        raise ValueError("kcenter needs k >= 1")
    edges = edges.select("src", "dst")
    if symmetrize_edges:
        edges = symmetrize(edges)
    if start_vertex is None:
        start_vertex = int(
            edges.agg(F.min(F.least(F.col("src"), F.col("dst")))).first()[0]
        )
    centers = [int(start_vertex)]
    res = None
    for _ in range(1, k):
        res = landmark_distances(edges, centers, max_iter=max_iter, **kw)
        far = (
            res.state.select("vertex", F.array_min("value").alias("d"))
            .orderBy(F.col("d").desc(), F.col("vertex").asc())
            .first()
        )
        centers.append(int(far.vertex))
    res = landmark_distances(edges, centers, max_iter=max_iter, **kw)
    # nearest center per vertex: min struct(dist, position) breaks ties
    # toward the earliest-chosen center
    best = F.array_min(
        F.zip_with(
            "value",
            F.array(*[F.lit(i) for i in range(len(centers))]),
            lambda d, i: F.struct(d.alias("d"), i.alias("i")),
        )
    )
    cen_arr = F.array(*[F.lit(c) for c in centers])
    return (
        res.state.select("vertex", best.alias("_b"))
        .filter(F.col("_b.d") < gimv.SSSP_INF)
        .select(
            "vertex",
            F.element_at(cen_arr, F.col("_b.i") + 1).cast("long").alias("center"),
            F.col("_b.d").alias("dist"),
        )
    )


def double_sweep(
    edges: DataFrame,
    start_vertex: int | None = None,
    max_iter: int = 100,
    symmetrize_edges: bool = True,
    **kw,
) -> DataFrame:
    """Double-sweep diameter lower bound (Magnien/Latapy/Habib): BFS from
    ``start_vertex`` (default: lowest vertex id), hop to the farthest
    reached vertex (ties -> lowest id), BFS again from there — the second
    eccentricity is a certified lower bound on the diameter, empirically
    tight on real-world graphs. Two :func:`landmark_distances` jobs plus
    one driver-side argmax between them (setup-scale, not per-superstep).
    Returns one row: (start, peripheral, ecc_start, diameter_lb)."""
    from flexgraph_spark.graph import symmetrize

    cols = ["src", "dst"]
    if symmetrize_edges:
        edges = symmetrize(edges.select(*cols))
    else:
        edges = edges.select(*cols)
    if start_vertex is None:
        start_vertex = int(
            edges.agg(F.min(F.least(F.col("src"), F.col("dst")))).first()[0]
        )

    def _bfs_far(src: int):
        res = landmark_distances(edges, [src], max_iter=max_iter, **kw)
        far = (
            res.state.select("vertex", F.element_at("value", 1).alias("d"))
            .filter(F.col("d") < gimv.SSSP_INF)
            .orderBy(F.col("d").desc(), F.col("vertex").asc())
            .first()
        )
        return int(far.vertex), float(far.d)

    peripheral, ecc_start = _bfs_far(int(start_vertex))
    _, diameter_lb = _bfs_far(peripheral)
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(int(start_vertex), peripheral, ecc_start, diameter_lb)],
        "start long, peripheral long, ecc_start double, diameter_lb double",
    )


def wl_colors(
    edges: DataFrame,
    rounds: int = 3,
    symmetrize_edges: bool = True,
    checkpointer=None,
    **kw,
) -> gimv.GimvResult:
    """Weisfeiler–Lehman color refinement for ``rounds`` rounds
    (gimv.WLRefinement): returns per-vertex colors where equal color ⇔
    1-WL-equivalent depth-``rounds`` neighborhoods (modulo sha collisions)
    — structural-role detection, graph-symmetry finding, and the
    per-vertex half of WL graph hashing. Colors re-hash every round, so
    pass a fixed ``rounds`` (partition stabilization = the distinct-color
    count stops growing round over round; refinement only ever splits
    classes)."""
    from flexgraph_spark.graph import symmetrize

    if symmetrize_edges:
        edges = symmetrize(edges.select("src", "dst"))
    return gimv.run(
        edges, gimv.WLRefinement(), max_iter=rounds,
        checkpointer=checkpointer, **kw,
    )


def ppr_long(res: gimv.GimvResult, sources: list[int]) -> DataFrame:
    """Explode a batch_ppr result to (vertex, source, ppr) rows."""
    src_arr = F.array(*[F.lit(int(s)) for s in sources])
    return res.state.select(
        "vertex", F.posexplode("value").alias("idx", "ppr")
    ).select(
        "vertex", F.element_at(src_arr, F.col("idx") + 1).alias("source"), "ppr"
    )


def random_walks(
    edges: DataFrame,
    walk_length: int = 4,
    num_walks: int = 1,
    salt: str = "walk",
) -> DataFrame:
    """Deterministic uniform random walks from every vertex — the
    node2vec/DeepWalk corpus-generation step, reproducible at any
    parallelism: step ``t`` of walk ``w`` from ``start`` moves to the
    neighbor at index ``sha256(salt:start:w:t) mod out_degree`` in the
    dst-sorted adjacency order. No RNG state, so reruns/retries/stragglers
    emit identical walks and an ANSI-SQL oracle replays them bit-exactly.

    Returns (start, walk_id, step, vertex), step 0..walk_length; walks
    that reach a sink (no out-edges) stay there.

    Scale shape: the adjacency is a POSITION table (src, idx, dst) built
    with one row_number window — never a collected neighbor array — so a
    hub's neighbors stay spread across partitions and each step is two
    hash joins keyed on the current vertex: frontier⋈degree (pick the
    index) then frontier⋈position (fetch the neighbor). Both shuffles are
    keyed by the frontier's current vertex; hot vertices fan out only as
    much as the walk mass that actually sits on them. Plans grow linearly
    with walk_length; lineage is truncated every 8 steps.
    """
    from pyspark.sql import Window

    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct()
    pos = e.withColumn(
        "idx", F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1
    ).select(F.col("src").alias("p_src"), "idx", F.col("dst").alias("p_dst"))
    deg = e.groupBy("src").agg(F.count("*").alias("deg")).select(
        F.col("src").alias("d_src"), "deg"
    )
    pos = pos.persist()
    deg = deg.persist()

    verts = e.select(F.col("src").alias("v")).union(
        e.select(F.col("dst").alias("v"))
    ).distinct()
    frontier = verts.crossJoin(
        spark.range(num_walks).select(F.col("id").alias("walk_id"))
    ).select(F.col("v").alias("start"), "walk_id", F.col("v").alias("cur"))

    out = frontier.select(
        "start", "walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex")
    )
    for step in range(1, walk_length + 1):
        h = F.conv(
            F.substring(
                F.sha2(
                    F.concat_ws(
                        ":", F.lit(salt), F.col("start"), F.col("walk_id"),
                        F.lit(str(step)),
                    ),
                    256,
                ),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        stepped = (
            frontier.join(deg, frontier.cur == deg.d_src, "left")
            .withColumn("_pick", h % F.col("deg"))
            .join(
                pos,
                (F.col("cur") == F.col("p_src")) & (F.col("_pick") == F.col("idx")),
                "left",
            )
            .select(
                "start", "walk_id",
                F.coalesce(F.col("p_dst"), F.col("cur")).alias("cur"),
            )
        )
        frontier = truncate_plan(stepped) if step % 8 == 0 else stepped
        out = out.union(
            frontier.select(
                "start", "walk_id", F.lit(step).alias("step"),
                F.col("cur").alias("vertex"),
            )
        )
    return out


def _alternating_blocked(
    edges: DataFrame, max_iter: int, scaled: bool, normalize: bool, kw: dict
) -> GimvResult:
    """Shared blocked path for hits/salsa (gimv.AlternatingPropagation —
    vertex doubling + parity masking; see its docstring). Returns the
    flat faces' (vertex, hub, auth) state restricted to graph vertices;
    ``normalize`` applies the deferred end L2 normalization (HITS)."""
    import math

    from flexgraph_spark import blocks

    spark = edges.sparkSession
    if kw.get("blocks") is not None:
        raise ValueError(
            "hits/salsa blocked run over the DOUBLED vertex space — "
            "prebuilt blocks of the original graph decode to the wrong "
            "grid; drop --blocks and let the run prepartition the "
            "doubled edge set"
        )
    e = edges.select("src", "dst").distinct()
    mx = e.agg(F.greatest(F.max("src"), F.max("dst"))).first()[0]
    if mx is None:
        empty = spark.createDataFrame([], "vertex long, hub double, auth double")
        return GimvResult(state=empty, iterations=0, converged=True, metrics=[])
    n = int(mx) + 1
    e2 = e.select("src", (F.col("dst") + n).alias("dst")).unionByName(
        e.select((F.col("dst") + n).alias("src"), F.col("src").alias("dst"))
    )
    res = blocks.run_blocked(
        e2, gimv.AlternatingPropagation(n, scaled=scaled),
        max_iter=2 * max_iter, n=2 * n,
        p=kw.get("p"),
        dense_threshold=kw.get(
            "dense_threshold", blocks.DENSE_THRESHOLD_DEFAULT),
    )
    st = res.state
    verts = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    hub = st.filter(F.col("vertex") < n).select(
        "vertex", F.col("value").alias("hub")
    )
    auth = st.filter(F.col("vertex") >= n).select(
        (F.col("vertex") - n).alias("vertex"), F.col("value").alias("auth")
    )
    state = verts.join(hub, "vertex").join(auth, "vertex")
    if normalize:
        state = truncate_plan(state)
        row = state.agg(
            F.sum(F.col("hub") * F.col("hub")).alias("hh"),
            F.sum(F.col("auth") * F.col("auth")).alias("aa"),
        ).first()
        hn = math.sqrt(row["hh"] or 0.0) or 1.0
        an = math.sqrt(row["aa"] or 0.0) or 1.0
        state = state.select(
            "vertex",
            (F.col("hub") / F.lit(hn)).alias("hub"),
            (F.col("auth") / F.lit(an)).alias("auth"),
        )
    return GimvResult(
        state=state, iterations=max_iter, converged=False,
        metrics=res.metrics,
    )


def hits(
    edges: DataFrame, max_iter: int = 10, num_partitions: int | None = None,
    engine: str = "flat", **kw
) -> GimvResult:
    """HITS (Kleinberg hubs & authorities) over a directed edge set.

    Per iteration: ``auth(v) = Σ_{u→v} hub(u)`` then L2-normalize;
    ``hub(u) = Σ_{u→v} auth(v)`` then L2-normalize. Init hub = 1. Runs a
    FIXED ``max_iter`` iterations (the recurrence depth is the contract —
    oracle-unrollable like pagerank10). Returns state (vertex, hub, auth).

    Two alternating GIM-V products (M^T ⊗ hub then M ⊗ auth) — not a
    single VertexProgram (the state is a pair and the matrix flips per
    half-step), so it runs as its own flat loop. Scale shape mirrors
    gimv.run: TWO pinned edge copies (by src and by dst) so neither
    half-step ever reshuffles the edge table — only the (small) vertex
    states move; shuffle_hash hints keep Catalyst from broadcasting the
    edge side. The L2 norm piggybacks as an Observation on the job that
    materializes the raw sums (the gimv.run convergence-vote trick), so
    each half-step runs exactly ONE edge join in ONE job — the first cut
    recomputed the edge join in a separate norm-aggregate job (2x edge
    scans per half-step, measured ~2x the superstep wall time).

    ``engine='blocked'`` runs the alternation on the CSR kernels via
    vertex doubling + parity masking (gimv.AlternatingPropagation) with
    the per-half-step L2 normalizations DEFERRED to one end normalize —
    exact at gate depths (values ∝-preserved per half-step); contiguous
    ids [0, n), pre-deduped edges.
    """
    import math
    if engine == "blocked":
        return _alternating_blocked(
            edges, max_iter, scaled=False, normalize=True, kw=kw
        )
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e_src = edges.select("src", "dst").repartition(p, "src").persist()
    n_edges = e_src.count()
    e_dst = e_src.repartition(p, "dst").persist()
    e_dst.count()
    verts = (
        e_src.select(F.col("src").alias("vertex"))
        .union(e_src.select(F.col("dst").alias("vertex")))
        .distinct()
        .repartition(p, "vertex")
        .persist()
    )
    n = verts.count()
    if n == 0:
        for df in (e_src, e_dst, verts):
            df.unpersist()
        empty = spark.createDataFrame([], "vertex long, hub double, auth double")
        return GimvResult(state=empty, iterations=0, converged=True, metrics=[])

    def _raw_with_norm(raw: DataFrame):
        """Materialize sparse raw sums (one job); the L2 norm rides on the
        same job as an Observation — no second pass over the edge join."""
        from pyspark.sql import Observation

        obs = Observation()
        raw = truncate_plan(
            raw.observe(obs, F.sum(F.col("raw") * F.col("raw")).alias("ss"))
        )
        nrm = math.sqrt(obs.get["ss"] or 0.0) or 1.0
        return raw, nrm

    def _normalized(raw: DataFrame, nrm: float, out_col: str) -> DataFrame:
        """vertex-complete, L2-normalized (vertex, out_col): a shallow lazy
        plan over the CACHED raw sums (safe to consume twice)."""
        return verts.join(raw, "vertex", "left").select(
            "vertex",
            (F.coalesce("raw", F.lit(0.0)) / F.lit(nrm)).alias(out_col),
        )

    hub = truncate_plan(verts.select("vertex", F.lit(1.0).alias("hub")))
    auth = None
    cached: list[DataFrame] = []
    metrics: list[IterationMetrics] = []
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for it in range(1, max_iter + 1):
            t0 = time.time()
            a_raw, a_nrm = _raw_with_norm(
                e_src.join(
                    hub.withColumnRenamed("vertex", "src").hint("shuffle_hash"), "src"
                )
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.sum("hub").alias("raw"))
            )
            new_auth = _normalized(a_raw, a_nrm, "auth")
            h_raw, h_nrm = _raw_with_norm(
                e_dst.join(
                    new_auth.withColumnRenamed("vertex", "dst").hint("shuffle_hash"),
                    "dst",
                )
                .groupBy(F.col("src").alias("vertex"))
                .agg(F.sum("auth").alias("raw"))
            )
            new_hub = _normalized(h_raw, h_nrm, "hub")
            # previous iteration's raws are no longer referenced by any
            # live plan (this iteration's states sit on a_raw/h_raw)
            for old in cached:
                old.unpersist()
            if it == 1:
                hub.unpersist()
            cached = [a_raw, h_raw]
            hub, auth = new_hub, new_auth
            metrics.append(
                IterationMetrics(
                    iteration=it,
                    messages_shuffled=2 * n_edges,
                    changed=n,
                    edges_scanned=2 * n_edges,
                    seconds=time.time() - t0,
                )
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    state = hub.join(auth, "vertex")
    e_src.unpersist()
    e_dst.unpersist()
    verts.unpersist()
    return GimvResult(state=state, iterations=max_iter, converged=False, metrics=metrics)


def kcore(
    edges: DataFrame,
    k: int,
    max_rounds: int = 50,
    num_partitions: int | None = None,
) -> GimvResult:
    """k-core membership by iterative peeling on the symmetrized simple
    graph (self-loops dropped): repeatedly remove vertices whose degree in
    the surviving induced subgraph is < k, until a fixpoint (every survivor
    has ≥ k surviving neighbors). Returns state = (vertex) survivors.

    Peeling is monotone — once the fixpoint is reached further rounds are
    no-ops — so a fixed-round unroll ≥ the convergence depth is oracle-
    exact, and capping ``max_rounds`` equals the oracle's same-depth unroll
    even when not yet converged. Per round: two semi-joins of the pinned
    edge table against the shrinking survivor set (src side reuses the
    pinned partitioning; dst side shuffles only the surviving edges) + one
    count aggregate; the survivor state is the only full-size shuffle."""
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = (
        symmetrize(edges.filter(F.col("src") != F.col("dst")).select("src", "dst"))
        .repartition(p, "src")
        .persist()
    )
    edges_count = und.count()
    alive = und.select(F.col("src").alias("vertex")).distinct().repartition(p, "vertex")
    alive = truncate_plan(alive)
    n_alive = alive.count()
    metrics: list[IterationMetrics] = []
    converged = False
    rounds = 0
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for rounds in range(1, max_rounds + 1):
            t0 = time.time()
            deg = (
                und.join(
                    alive.withColumnRenamed("vertex", "src").hint("shuffle_hash"),
                    "src",
                )
                .join(
                    alive.withColumnRenamed("vertex", "dst").hint("shuffle_hash"),
                    "dst",
                )
                .groupBy(F.col("src").alias("vertex"))
                .agg(F.count("*").alias("d"))
            )
            new_alive = truncate_plan(
                deg.filter(F.col("d") >= k).select("vertex").repartition(p, "vertex")
            )
            m = new_alive.count()
            metrics.append(
                IterationMetrics(
                    iteration=rounds,
                    messages_shuffled=m,
                    changed=n_alive - m,
                    edges_scanned=edges_count,
                    seconds=time.time() - t0,
                )
            )
            old = alive
            alive = new_alive
            old.unpersist()
            if m == n_alive:
                converged = True
                break
            n_alive = m
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        und.unpersist()
    return GimvResult(state=alive, iterations=rounds, converged=converged, metrics=metrics)


def weighted_kcore(
    edges: DataFrame,
    t,
    max_rounds: int = 50,
    num_partitions: int | None = None,
) -> GimvResult:
    """Generalized (weighted) core: iteratively peel vertices whose
    SURVIVING weighted degree — the sum of incident edge weights on the
    symmetrized simple graph — is < ``t`` (Eidsaa & Almaas's s-core, the
    weighted sibling of :func:`kcore`'s count peel; on a link graph with
    link weights = co-citation counts this is the "strongly-embedded
    pages" query that plain k-core gets wrong on hub-adjacent leaves).

    Edges canonicalize to the undirected pair (least, greatest) with the
    MIN weight of any parallel/reverse duplicate — a deterministic
    contract the SQL oracle replays. Weights are cast to decimal(38,6)
    so the ``>= t`` peel condition is EXACT arithmetic: float sums would
    make the boundary order-dependent across executor counts (and across
    engines), which a monotone peel then amplifies into different
    survivor sets. Peeling is monotone, so a bounded ``max_rounds`` run
    equals the oracle's same-depth unroll (the kcore gate trick).
    Returns state = (vertex) survivors; per-round plan = kcore's two
    semi-joins + one sum aggregate on uniform keys."""
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    wd = F.col("weight").cast("decimal(38,6)")
    canon = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            wd.alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    und = (
        canon.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w")
        .unionByName(
            canon.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
        )
        .repartition(p, "src")
        .persist()
    )
    edges_count = und.count()
    alive = und.select(F.col("src").alias("vertex")).distinct().repartition(p, "vertex")
    alive = truncate_plan(alive)
    n_alive = alive.count()
    thr = F.lit(str(t)).cast("decimal(38,6)")
    metrics: list[IterationMetrics] = []
    converged = False
    rounds = 0
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for rounds in range(1, max_rounds + 1):
            t0 = time.time()
            deg = (
                und.join(
                    alive.withColumnRenamed("vertex", "src").hint("shuffle_hash"),
                    "src",
                )
                .join(
                    alive.withColumnRenamed("vertex", "dst").hint("shuffle_hash"),
                    "dst",
                )
                .groupBy(F.col("src").alias("vertex"))
                .agg(F.sum("w").alias("wd"))
            )
            new_alive = truncate_plan(
                deg.filter(F.col("wd") >= thr).select("vertex")
                .repartition(p, "vertex")
            )
            m = new_alive.count()
            metrics.append(
                IterationMetrics(
                    iteration=rounds,
                    messages_shuffled=m,
                    changed=n_alive - m,
                    edges_scanned=edges_count,
                    seconds=time.time() - t0,
                )
            )
            old = alive
            alive = new_alive
            old.unpersist()
            if m == n_alive:
                converged = True
                break
            n_alive = m
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        und.unpersist()
    return GimvResult(state=alive, iterations=rounds, converged=converged, metrics=metrics)


def neighborhood_function(
    edges: DataFrame, max_h: int, num_partitions: int | None = None
) -> DataFrame:
    """EXACT neighborhood function N(h) = |{(v, u) : dist(v, u) <= h}| for
    h = 0..max_h over the directed graph (self-pairs count at h = 0).

    Validation-scale face of HADI-style diameter estimation: it
    materializes the full reachable-pair set (pairs_h = pairs_{h-1} union
    pairs_{h-1} join edges, distinct), which is O(V * avg-reach) rows — the
    thing a 100 TB graph cannot afford. Use :func:`hadi` (HLL-sketch
    recurrence, O(V) state) at scale; this face exists to oracle-gate it.
    Returns a DataFrame (h int, n_pairs long).
    """
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select(F.col("src").alias("via"), F.col("dst").alias("u"))
        .distinct()
        .repartition(p, "via")
        .persist()
    )
    e.count()
    pairs = truncate_plan(
        e.select(F.col("via").alias("v"), F.col("via").alias("u"))
        .union(e.select(F.col("u").alias("v"), F.col("u").alias("u")))
        .distinct()
        .repartition(p, "u")
    )
    series = [(0, pairs.count())]
    for h in range(1, max_h + 1):
        hop = (
            pairs.withColumnRenamed("u", "via")
            .join(e.hint("shuffle_hash"), "via")
            .select("v", "u")
        )
        new_pairs = truncate_plan(
            pairs.union(hop).distinct().repartition(p, "u")
        )
        pairs.unpersist()
        pairs = new_pairs
        series.append((h, pairs.count()))
    pairs.unpersist()
    e.unpersist()
    return spark.createDataFrame(series, "h int, n_pairs long")


@dataclass
class HadiResult:
    """HADI output: the estimated neighborhood-function series
    (h int, n_est double), the interpolated effective diameter, and the
    superstep metrics (messages_shuffled = frontier sketches shipped)."""

    series: DataFrame
    eff_diameter: float
    iterations: int
    converged: bool
    metrics: list[IterationMetrics] = field(default_factory=list)
    closeness: DataFrame | None = None
    radius: DataFrame | None = None


def hadi(
    edges: DataFrame,
    max_h: int = 32,
    lg_k: int = 12,
    ratio: float = 0.9,
    num_partitions: int | None = None,
    with_closeness: bool = False,
    with_radius: bool = False,
) -> HadiResult:
    """HADI-style effective-diameter estimation (Kang et al., the PEGASUS /
    GIM-V lineage the reference descends from — gim_v's 4th classic
    instantiation next to PageRank/RWR, CC, SSSP) re-expressed on Spark's
    JVM-native HLL sketches.

    State is one HyperLogLog sketch per vertex, initialized to {v}; one
    superstep is the OR semi-ring GIM-V product
    ``sketch_v(h) = sketch_v(h-1) ∪ ⋃_{v→u} sketch_u(h-1)`` — combine2 is
    the neighbor's sketch, combineAll/apply are ``hll_union_agg`` /
    ``hll_union`` (register-wise max: associative, commutative, idempotent,
    all JVM DataSketches — zero Python in the loop). N(h) is the sum of
    per-vertex ``hll_sketch_estimate``; the 90%-effective diameter is the
    (linearly interpolated) smallest h with N(h) >= ratio * N(H).

    Scale shape: edges pinned by dst once (messages pull the DST sketch and
    reduce on src, so the edge table never reshuffles; only O(V) sketch
    state moves). Union is monotone + idempotent, so frontier/delta
    messaging is EXACT: only vertices whose serialized sketch changed last
    superstep re-send (DataSketches serialization is a function of register
    state, so byte-equality witnesses fixpoint), and the convergent tail
    joins a shrinking frontier — the same nonzero-only-vector behavior as
    cache/DoubleVectorCache.java:68-101, reaching converged=True when the
    frontier empties. Per-superstep driver traffic is two scalar
    aggregates (N(h), frontier size).
    """
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst").distinct().repartition(p, "dst").persist()
    n_edges = e.count()
    verts = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .repartition(p, "vertex")
    )
    init = verts.groupBy("vertex").agg(
        F.hll_sketch_agg("vertex", F.lit(lg_k)).alias("sk")
    )
    if with_closeness:
        # per-vertex effective closeness (Kang et al. centralities work,
        # same sketch lineage): harmonic(v) ~= sum_h (N_v(h)-N_v(h-1))/h —
        # accumulate the per-vertex estimate delta each superstep, all
        # JVM-side column arithmetic riding on the existing state pass
        init = init.select(
            "vertex", "sk",
            F.hll_sketch_estimate("sk").alias("est"),
            F.lit(0.0).alias("harm"),
        )
    if with_radius:
        # per-vertex effective radius (the PEGASUS HADI radius plot):
        # keep the per-h estimate series — O(max_h) doubles per vertex —
        # and read the smallest qualifying h off the array at the end
        init = init.withColumn(
            "ests", F.array(F.hll_sketch_estimate("sk"))
        )
    state = truncate_plan(init)
    frontier = state
    n_frontier = state.count()
    first_est = state.agg(
        F.sum(F.hll_sketch_estimate("sk")).alias("n")
    ).first()["n"]
    series = [(0, float(first_est))]
    metrics: list[IterationMetrics] = []
    converged = False
    it = 0
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for it in range(1, max_h + 1):
            t0 = time.time()
            sent = n_frontier
            msgs = (
                e.join(
                    frontier.withColumnRenamed("vertex", "dst").hint("shuffle_hash"),
                    "dst",
                )
                .groupBy(F.col("src").alias("vertex"))
                .agg(F.hll_union_agg("sk").alias("msg"))
            )
            new_sk = F.when(F.col("msg").isNull(), F.col("sk")).otherwise(
                F.hll_union("sk", "msg")
            )
            cols = [
                F.col("vertex"),
                new_sk.alias("sk"),
                (
                    F.col("msg").isNotNull()
                    & (F.hll_union("sk", "msg") != F.col("sk"))
                ).cast("int").alias("_changed"),
            ]
            if with_closeness:
                est_new = F.hll_sketch_estimate(new_sk)
                cols += [
                    est_new.alias("est"),
                    (
                        F.col("harm")
                        + F.greatest(est_new - F.col("est"), F.lit(0.0))
                        / F.lit(float(it))
                    ).alias("harm"),
                ]
            if with_radius:
                cols.append(
                    F.concat(
                        F.col("ests"), F.array(F.hll_sketch_estimate(new_sk))
                    ).alias("ests")
                )
            new_state = truncate_plan(
                state.join(msgs.hint("shuffle_hash"), "vertex", "left")
                .select(*cols)
            )
            row = new_state.agg(
                F.sum(F.hll_sketch_estimate("sk")).alias("n"),
                F.sum("_changed").alias("c"),
            ).first()
            series.append((it, float(row["n"])))
            n_frontier = int(row["c"] or 0)
            if frontier is not state:
                frontier.unpersist()
            state.unpersist()
            state = new_state.drop("_changed")
            frontier = new_state.filter(F.col("_changed") == 1).drop("_changed")
            metrics.append(
                IterationMetrics(
                    iteration=it,
                    messages_shuffled=sent,
                    changed=n_frontier,
                    edges_scanned=n_edges,
                    seconds=time.time() - t0,
                )
            )
            if n_frontier == 0:
                converged = True
                break
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    closeness = None
    if with_closeness:
        closeness = truncate_plan(
            state.select("vertex", F.round("harm", 6).alias("harmonic"))
        )
    radius = None
    if with_radius:
        # integer-scaled ratio test (den*est >= num*last): exact when the
        # HLL estimates are exact small integers — `est >= 0.9 * last`
        # would fail at (9, 10) because 0.9*10 rounds up in binary — and
        # equivalent to est >= ratio*last on fractional estimates at scale
        from fractions import Fraction

        frac = Fraction(ratio).limit_denominator(10**6)
        qual = F.transform(
            F.col("ests"),
            lambda x, i: F.when(
                F.lit(frac.denominator) * x
                >= F.lit(frac.numerator) * F.element_at(F.col("ests"), -1),
                i,
            ),
        )
        radius = truncate_plan(
            state.select(
                "vertex",
                F.array_min(qual).cast("long").alias("eff_radius"),
                F.round(F.element_at(F.col("ests"), -1), 4).alias("n_reach_est"),
            )
        )
    e.unpersist()
    state.unpersist()
    n_max = series[-1][1]
    eff = float(series[-1][0])
    for (h0, a), (h1, b) in zip(series, series[1:]):
        if b >= ratio * n_max:
            eff = h0 + (ratio * n_max - a) / (b - a) if b > a else float(h1)
            break
    if series[0][1] >= ratio * n_max:
        eff = 0.0
    return HadiResult(
        series=spark.createDataFrame(series, "h int, n_est double"),
        eff_diameter=eff,
        iterations=it,
        converged=converged,
        metrics=metrics,
        closeness=closeness,
        radius=radius,
    )


def hadi_registers(
    edges: DataFrame, max_h: int = 3, precision: int = 4
) -> DataFrame:
    """Register-TABLE face of HADI — the same OR semi-ring recurrence
    ``sketch_v(h) = sketch_v(h-1) ∪ ⋃_{v→u} sketch_u(h-1)`` run on the
    repo's own sha256 HLL registers (sketches.hll_registers contract:
    bucket = sha_long(v,'hll') % 2^precision, ρ = leftmost-1 position of
    the remaining 60-precision bits) instead of JVM DataSketches. Union
    of sketches = register-wise max, so one superstep is a union +
    groupBy(vertex, bucket) max — integer-exact, and a SQL oracle
    replays EVERY register at EVERY h bit-for-bit (the hadi_registers
    gate): reach sets via unrolled pair-BFS, registers via the identical
    sha/bucket/ρ arithmetic. That value-gates the HADI recurrence itself;
    the production :func:`hadi` path (DataSketches, frontier messaging,
    estimate readout) keeps hadi_precision as its accuracy gate.

    Returns long-form ``(h, vertex, bucket, m)`` for h = 0..max_h
    (non-empty buckets only). Gate-scale face: per-vertex register ROWS
    (≤ 2^precision per vertex per level) rather than packed sketch bytes
    — at 100 TB run :func:`hadi` (O(V) packed sketches, delta
    messaging); this face exists to pin its algebra under the oracle."""
    from flexgraph_spark.sketches import sha_long

    m_buckets = 1 << precision
    avail = 60 - precision
    e = edges.select("src", "dst").distinct()
    verts = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    hv = sha_long(F.col("vertex"), "hll")
    rem = F.shiftright(hv, precision)
    rho = (
        F.when(rem == 0, F.lit(avail + 1))
        .otherwise(F.lit(avail) - (F.length(F.bin(rem)) - F.lit(1)))
    )
    state = verts.select(
        "vertex", (hv % F.lit(m_buckets)).alias("bucket"), rho.alias("m")
    )
    levels = [state.withColumn("h", F.lit(0))]
    for k in range(1, max_h + 1):
        msgs = e.join(state.withColumnRenamed("vertex", "dst"), "dst").select(
            F.col("src").alias("vertex"), "bucket", "m"
        )
        state = truncate_plan(
            state.unionByName(msgs)
            .groupBy("vertex", "bucket")
            .agg(F.max("m").alias("m"))
        )
        levels.append(state.withColumn("h", F.lit(k)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("h", "vertex", "bucket", "m")


def _oriented_triangles(edges: DataFrame, und: DataFrame | None = None):
    """Shared degree-oriented triangle plan: returns (oriented, closed, deg)
    where ``closed`` has one row per distinct triangle with its three
    vertices (u, w1, w2) and ``oriented`` is persisted (caller unpersists).
    Orientation from the lower-(degree, id) endpoint keeps wedge
    enumeration on LOW-degree vertices — the hub-skew-safe plan.

    ``und`` (optional): precomputed undirected simple pair table with
    columns (a < b) — callers that already hold the canonical dyad table
    (:func:`triad_census`) pass it to skip the distinct."""
    if und is None:
        und = (
            edges.filter(F.col("src") != F.col("dst"))
            .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
            .distinct()
        )
    deg = (
        und.select(F.col("a").alias("vertex"))
        .union(und.select(F.col("b").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("degree"))
    )
    ranked = und.join(
        deg.withColumnRenamed("vertex", "a").withColumnRenamed("degree", "da"), "a"
    ).join(deg.withColumnRenamed("vertex", "b").withColumnRenamed("degree", "db"), "b")
    oriented = ranked.select(
        F.when(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
            F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
        )
        .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
        .alias("e")
    ).select("e.u", "e.v")
    # oriented feeds FOUR plan branches (both wedge sides + both directions
    # of the closing probe); persist so the dedup + degree joins run once.
    oriented = oriented.persist()
    e1 = oriented.select(F.col("u"), F.col("v").alias("w1"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("w2"))
    wedges = e1.join(e2, "u").filter(F.col("w1") < F.col("w2"))
    closed = wedges.join(
        oriented.select(F.col("u").alias("w1"), F.col("v").alias("w2")).union(
            oriented.select(F.col("v").alias("w1"), F.col("u").alias("w2"))
        ),
        ["w1", "w2"],
    )
    return oriented, closed, deg


def local_clustering(edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient over the undirected simple
    graph: (vertex, degree, triangles, lcc) with
    ``lcc = 2·T(v) / (d(v)·(d(v)−1))`` (0.0 for degree < 2).

    Reuses the degree-oriented triangle plan (each triangle appears once as
    a (u, w1, w2) row); per-vertex counts come from exploding the three
    endpoints — a uniform-ish shuffle on vertex ids, never a hub self-join."""
    oriented, closed, deg = _oriented_triangles(edges)
    tri = (
        closed.select(
            F.explode(F.array(F.col("u"), F.col("w1"), F.col("w2"))).alias("vertex")
        )
        .groupBy("vertex")
        .agg(F.count("*").alias("triangles"))
    )
    out = (
        deg.join(tri, "vertex", "left")
        .select(
            "vertex",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree").cast("double") * (F.col("degree") - 1.0)),
            )
            .otherwise(0.0)
            .alias("lcc"),
        )
    )
    from flexgraph_spark.textops import _materialize

    out = _materialize(out)
    oriented.unpersist()
    return out


def triangle_count(edges: DataFrame) -> int:
    """Exact triangle count, degree-oriented (scalable): orient each
    undirected edge from the lower-(degree, id) endpoint to the higher one,
    enumerate wedges at the low vertex, close them against the oriented
    edge set. Every triangle is counted exactly once and wedge work
    concentrates on LOW-degree vertices, which is what survives hub skew at
    web scale (the join-on-hub explosion never materializes).
    """
    oriented, closed, _deg = _oriented_triangles(edges)
    n = closed.count()
    oriented.unpersist()
    return n


def global_clustering(edges: DataFrame) -> DataFrame:
    """Global clustering coefficient (transitivity) of the undirected
    simple graph: ``C = 3·#triangles / #wedges`` with
    ``#wedges = Σ_v d(v)·(d(v)−1)/2``.

    One row (n_triangles, n_wedges, global_cc). Triangles come from the
    degree-oriented wedge plan (:func:`triangle_count` — hub-skew-safe at
    web scale); wedges are a single degree aggregation. Both are plain
    shuffles on uniform keys; nothing here is worse than the triangle
    count itself at 100 TB.
    """
    spark = edges.sparkSession
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    wedges = int(
        deg.agg(
            F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("w")
        ).first()["w"]
        or 0
    )
    tri = triangle_count(edges)
    cc = round(3.0 * tri / wedges, 6) if wedges else 0.0
    return spark.createDataFrame(
        [(tri, wedges, cc)],
        "n_triangles long, n_wedges long, global_cc double",
    )


def rich_club(edges: DataFrame, ks: list[int]) -> DataFrame:
    """Rich-club coefficients of the undirected simple graph: for each
    degree cutoff k, ``φ(k) = 2·E_k / (N_k·(N_k−1))`` where N_k counts
    vertices with degree > k and E_k the edges with BOTH endpoints of
    degree > k (Colizza et al. 2006 — the unnormalized coefficient).

    Rows (k, n_nodes, n_edges, phi). ONE conditional-aggregation pass over
    the degree-joined edge set serves every k (no per-k rescan), and one
    pass over the degree table — both all-JVM partial aggregates, so the
    100 TB cost is two scans regardless of len(ks).
    """
    spark = edges.sparkSession
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    e2 = (
        und.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    )
    erow = e2.agg(
        *[
            F.sum(
                F.when((F.col("da") > k) & (F.col("db") > k), 1).otherwise(0)
            ).cast("long").alias(f"e{k}")
            for k in ks
        ]
    ).first()
    nrow = deg.agg(
        *[
            F.sum(F.when(F.col("d") > k, 1).otherwise(0)).cast("long").alias(f"n{k}")
            for k in ks
        ]
    ).first()
    rows = []
    for k in ks:
        nk = int(nrow[f"n{k}"] or 0)
        ek = int(erow[f"e{k}"] or 0)
        phi = round(2.0 * ek / (nk * (nk - 1.0)), 6) if nk >= 2 else 0.0
        rows.append((k, nk, ek, phi))
    return spark.createDataFrame(
        rows, "k long, n_nodes long, n_edges long, phi double"
    )


def k4_count(edges: DataFrame) -> int:
    """Exact 4-clique (K4) count, degree-oriented (the kClist /
    arboricity-bounded shape, Danisch et al. WWW 2018): every K4 has a
    unique TOP vertex in the (degree, id) total order, and its other
    three vertices form exactly one canonical triangle row of the shared
    degree-oriented plan, so

        K4 = |{(triangle (u, w1, w2), x) : u→x, w1→x, w2→x oriented}|

    — three hash joins of the triangle table against the oriented edge
    set. Completion work keys on (vertex, x) pairs and the oriented set
    points low→high, so a hub only ever appears as the RECEIVING end:
    the same skew argument that makes :func:`triangle_count` survive
    web-scale degree distributions (FlexGraph itself stops at matrix
    powers; this extends the PEGASUS-lineage motif family one level).

    Join order: the candidate fan-out starts from w2 — the HIGHEST of
    the three triangle vertices in the (degree, id) orientation order,
    hence the one with the fewest out-neighbors above it — and the u
    join runs last (measured 1.7× faster than fanning out from u at
    bench scale: 13s vs 27s on the 2.1M-triangle graph; counts
    identical by construction).
    """
    oriented, closed, _deg = _oriented_triangles(edges)
    o = oriented
    k4 = (
        closed.join(o.select(F.col("u").alias("w2"), F.col("v").alias("x")), "w2")
        .join(o.select(F.col("u").alias("w1"), F.col("v").alias("x")), ["w1", "x"])
        .join(o.select("u", F.col("v").alias("x")), ["u", "x"])
    )
    n = k4.count()
    oriented.unpersist()
    return n


def square_count(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """Global 4-cycle (square) count over the simple undirected graph:
    every unordered vertex pair {u, w} with ``cn`` common neighbors
    closes C(cn, 2) squares through its diagonal, and each square has
    exactly two diagonals, so

        squares = Σ_{u<w} C(cn(u,w), 2) / 2   (exact integer arithmetic)

    — the next motif up from the triangle rows (PEGASUS-family matrix-
    power analyses). Wedge generation fans out C(deg(m), 2) per middle
    vertex m, the same hub quadratic the triangle plan orients away but a
    common-neighbor count cannot; ``max_center_degree`` caps the middles
    for a documented truncation at web scale (hubs excluded — the
    standard practice for square/butterfly counting on power-law graphs);
    None = exact (the oracle face). Returns one row (squares long).
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    adj = und.select(F.col("a").alias("m"), F.col("b").alias("x")).union(
        und.select(F.col("b").alias("m"), F.col("a").alias("x"))
    )
    if max_center_degree is not None:
        deg = adj.groupBy("m").agg(F.count("*").alias("_d"))
        adj = adj.join(
            deg.filter(F.col("_d") <= max_center_degree).select("m"), "m"
        )
    l = adj.select("m", F.col("x").alias("u"))
    r = adj.select("m", F.col("x").alias("w"))
    cn = (
        l.join(r, "m")
        .filter(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count("*").alias("c"))
    )
    return cn.agg(
        (F.coalesce(F.sum(F.col("c") * (F.col("c") - 1) / 2), F.lit(0.0)) / 2)
        .cast("long")
        .alias("squares")
    )


def link_prediction(
    edges: DataFrame,
    topk: int | None = 20,
    max_bridge_degree: int | None = None,
) -> DataFrame:
    """Common-neighbor link prediction over the undirected simple graph:
    for every non-adjacent pair (x, y) with at least one common neighbor,
    ``(x, y, common, aa_score, jaccard)`` where

    * ``common``   = |N(x) ∩ N(y)|,
    * ``aa_score`` = Σ_{z ∈ N(x)∩N(y)} 1/ln(deg z)   (Adamic-Adar),
    * ``jaccard``  = common / (deg x + deg y − common),

    returning the global top-``topk`` by (aa_score desc, x, y) — the
    "which pages/repos should link but don't" query over a link graph.
    ``topk=None`` returns ALL scored open pairs unsorted (callers rank
    however they like). Keep explicit ``topk`` values small (top-k runs as
    TakeOrderedAndProject, whose per-partition heap is O(k) — a huge k,
    e.g. 10**9, allocates a 2k-slot buffer per partition and OOMs the
    executor; "huge k" IS "all pairs", which is what ``None`` is for).

    Plan: one wedge self-join THROUGH each bridge vertex z (neighbors of z
    pair up), aggregated on the (x, y) pair key, then an anti-join against
    the existing edge set and two broadcast-free degree joins. The wedge
    fan-out is deg(z)², so hubs dominate the pair count at web scale;
    ``max_bridge_degree`` excludes bridges above a degree cap — the
    standard Adamic-Adar practice, principled because a bridge's weight
    1/ln(deg z) decays toward zero exactly as its fan-out explodes (a
    10⁶-degree hub contributes ≤ 0.073 per pair). With the cap the pair
    key space is bounded by Σ_{deg z ≤ cap} deg(z)² and the aggregation
    is an ordinary uniform shuffle; the pairs themselves are the skew-safe
    wedge orientation (x < y).
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    und = und.persist()
    deg = (
        und.select(F.col("a").alias("vertex"))
        .union(und.select(F.col("b").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("degree"))
    )
    # adjacency through the bridge: z's full neighbor list (both endpoints)
    adj = und.select(F.col("a").alias("z"), F.col("b").alias("n")).union(
        und.select(F.col("b").alias("z"), F.col("a").alias("n"))
    )
    bridge = adj.join(deg.withColumnRenamed("vertex", "z"), "z")
    if max_bridge_degree is not None:
        bridge = bridge.filter(F.col("degree") <= max_bridge_degree)
    left = bridge.select("z", F.col("n").alias("x"), F.col("degree").alias("dz"))
    right = bridge.select("z", F.col("n").alias("y"))
    wedges = left.join(right, "z").filter(F.col("x") < F.col("y"))
    pair_scores = wedges.groupBy("x", "y").agg(
        F.count("*").alias("common"),
        F.sum(1.0 / F.log(F.col("dz").cast("double"))).alias("aa_score"),
    )
    # drop already-linked pairs (x < y matches und's (a, b) orientation)
    open_pairs = pair_scores.join(
        und.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    out = (
        open_pairs.join(
            deg.select(F.col("vertex").alias("x"), F.col("degree").alias("dx")), "x"
        )
        .join(deg.select(F.col("vertex").alias("y"), F.col("degree").alias("dy")), "y")
        .select(
            "x",
            "y",
            F.col("common").cast("long").alias("common"),
            F.col("aa_score"),
            (
                F.col("common")
                / (F.col("dx") + F.col("dy") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
    )
    if topk is not None:
        out = out.orderBy(F.col("aa_score").desc(), "x", "y").limit(topk)
    from flexgraph_spark.textops import _materialize

    out = _materialize(out)
    und.unpersist()
    return out


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every vertex u connects its strictly-LARGER
    neighbors to min(N(u) ∪ {u}). Emitted edges keep the (u > v)
    orientation invariant."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        # no distinct here: output is already (u > v)-oriented, so the
        # small-star that always follows dedups it in its own first
        # shuffle — a distinct here would be a whole extra exchange
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient every edge large→small, then each vertex u
    connects its (all smaller) neighbors and itself to the minimum one."""
    o = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    nbr = (
        o.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    # (u, m) "own" edges are exactly the mins table — one row per u
    # already, no distinct needed on that side
    own = mins.select("u", F.col("m").alias("v"))
    return nbr.union(own).distinct()


def connected_components_star(
    edges: DataFrame, max_iter: int = 50, num_partitions: int | None = None
) -> GimvResult:
    """Connected components by alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — O(log² n) rounds worst case, ~log n observed,
    versus HashMin GIM-V's O(diameter) rounds.

    Why it exists next to ``connected_components``: at 10^12-file link
    scale the graph has chain-shaped tails (page chains, monotone ID
    ranges) whose diameter is easily 10³⁺, and every HashMin superstep is
    a full E-scan even with delta messaging (the frontier walks the chain
    one hop per round). Star contraction instead halves long paths every
    round and operates on a SHRINKING edge set, so total work is
    O(E log n) with geometrically-decaying rounds. The output contract is
    identical — label = min vertex id of the component — so the same
    recursive-CTE oracle gates both (cc_labels / cc_star rows).

    Scale notes: the per-round ``groupBy(u).min`` is partially
    aggregatable (map-side combine absorbs hub fan-in); the mins join
    duplicates one m per neighbor, which is the algorithm's required
    output size, and AQE's skew-join split handles hub u keys. Each round
    is cut from the lineage via truncate_plan (same compounding-statistics
    trap as the GIM-V loop, gimv.truncate_plan docstring). Convergence is
    detected by edge-set fixpoint via (count, Σ xxhash64) signature — no
    exceptAll shuffle; a signature collision would need a 64-bit hash-sum
    tie on different sets.

    Reference parity: same result as FlexGraph's HashMin cc
    (PageRankComputation-family min semi-ring, SURVEY §2.2); this is the
    contraction-style alternative the reference runs diameter rounds for.
    """
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v"))
        .distinct()
    )
    if num_partitions:
        e = e.repartition(num_partitions, "u")
    e = truncate_plan(e)
    sig = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)).alias("h"),
    ).first()
    metrics: list[IterationMetrics] = []
    converged = False
    rounds = 0
    for i in range(max_iter):
        t0 = time.time()
        prev, prev_sig = e, sig
        e = truncate_plan(_small_star(_large_star(prev)))
        sig = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)).alias("h"),
        ).first()
        prev.unpersist(blocking=False)
        rounds = i + 1
        changed = 0 if (sig.n, sig.h) == (prev_sig.n, prev_sig.h) else int(sig.n)
        metrics.append(
            IterationMetrics(
                iteration=rounds,
                messages_shuffled=int(sig.n),
                changed=changed,
                edges_scanned=int(prev_sig.n),
                seconds=time.time() - t0,
            )
        )
        if changed == 0:
            converged = True
            break
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    labels = (
        verts.join(
            e.select(F.col("u").alias("vertex"), F.col("v").alias("label")),
            "vertex",
            "left",
        )
        .select("vertex", F.coalesce("label", "vertex").alias("value"))
    )
    return GimvResult(
        state=labels, iterations=rounds, converged=converged, metrics=metrics
    )


def closeness_exact(
    edges: DataFrame, max_h: int, num_partitions: int | None = None
) -> DataFrame:
    """EXACT bounded harmonic (effective) closeness over out-distances:

        harmonic(v) = Σ_{u ≠ v, dist(v,u) ≤ max_h} 1 / dist(v,u)

    (vertex, harmonic) rows, harmonic rounded to 6 decimals; vertices that
    reach nothing within ``max_h`` get 0.0.

    Validation-scale face of ``hadi(with_closeness=True)`` — it
    materializes the full (v, u, dist) reachable-pair set via layered
    frontier BFS (new pairs anti-joined against known pairs each hop),
    which is O(V · avg-reach) rows: fine at oracle scale, unaffordable at
    100 TB, where the HLL accumulator (O(V) state) is the real path. This
    face exists to oracle-gate the semantics.
    """
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "src")
        .persist()
    )
    e.count()
    # vertex universe from the UNFILTERED edges: a self-loop-only vertex
    # still exists (harmonic 0), it just reaches nothing
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    known = truncate_plan(
        e.select(F.col("src").alias("v"), F.col("dst").alias("u"), F.lit(1).alias("d"))
    )
    frontier = known
    for h in range(2, max_h + 1):
        cand = (
            frontier.select("v", F.col("u").alias("src"))
            .join(e.hint("shuffle_hash"), "src")
            .select("v", F.col("dst").alias("u"))
            .where(F.col("v") != F.col("u"))
            .distinct()
        )
        new = cand.join(known.select("v", "u"), ["v", "u"], "left_anti").select(
            "v", "u", F.lit(h).alias("d")
        )
        new_known = truncate_plan(known.union(new))
        n_new = new_known.count() - known.count()
        known.unpersist()
        known = new_known
        frontier = known.where(F.col("d") == h)
        if n_new == 0:
            break
    out = (
        verts.join(
            known.groupBy(F.col("v").alias("vertex")).agg(
                F.sum(1.0 / F.col("d")).alias("h_raw")
            ),
            "vertex",
            "left",
        )
        .select("vertex", F.round(F.coalesce("h_raw", F.lit(0.0)), 6).alias("harmonic"))
    )
    out = truncate_plan(out)
    known.unpersist()
    e.unpersist()
    return out


def ktruss(
    edges: DataFrame, k: int, max_rounds: int = 50
) -> GimvResult:
    """k-truss subgraph by iterative support peeling: keep an (undirected,
    simple) edge only while it participates in >= k-2 triangles among the
    SURVIVING edges; repeat until fixpoint (or ``max_rounds``). Returns
    GimvResult whose state is the surviving edge set (a, b) with a < b —
    the truss-decomposition building block one level up from k-core
    (vertex peeling, :func:`kcore`) and the standard cohesive-subgraph
    query over a link graph.

    Scale notes — INCREMENTAL peeling (the frontier/delta idea applied to
    support): round 1 runs the degree-oriented triangle plan
    (:func:`triangle_count`'s wedge join — work concentrates on
    low-degree endpoints, hub-skew-safe) ONCE and materializes a
    per-edge support table. Every later round only enumerates the
    triangles that CONTAIN a just-dropped edge (common-neighbor join of
    the dropped set against the previous adjacency — cost ∝ |dropped| ×
    degree, not the surviving graph) and subtracts their contribution:
    support_new(e) = support_old(e) − #{triangles through e with ≥ 1
    dropped edge}, which is exactly the recount (triangles of the new
    graph = triangles of the old minus those touching dropped edges).
    Per-round edge sets are therefore IDENTICAL to the recount-per-round
    formulation, so the equally-unrolled bounded-``max_rounds`` oracle
    (same trick as the kcore gate) is unchanged. Support agg and joins
    key on the uniform (a, b) pair.
    """
    if k < 3:
        raise ValueError(f"k-truss needs k >= 3, got {k}")
    und = truncate_plan(
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    n = und.count()
    metrics: list[IterationMetrics] = []
    converged = False
    rounds = 0
    sup = None  # (a, b, support) for the CURRENT edge set, exact
    dropped_df = None
    # A mid-peel failure must release the checkpointed frames held
    # between rounds (current und/sup/dropped_df bindings) instead of
    # leaking their blocks for the rest of the session — same shape as
    # the weighted_kcore finally-unpersist fix. On success the loop has
    # already released everything except the returned state.
    try:
        for r in range(1, max_rounds + 1):
            t0 = time.time()
            if r == 1:
                oriented, closed, _deg = _oriented_triangles(
                    und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
                )
                tri = closed.select("u", "w1", "w2")
                sides = (
                    tri.select(F.least("u", "w1").alias("a"),
                               F.greatest("u", "w1").alias("b"))
                    .unionAll(tri.select(F.least("u", "w2").alias("a"),
                                         F.greatest("u", "w2").alias("b")))
                    .unionAll(tri.select(F.col("w1").alias("a"),
                                         F.col("w2").alias("b")))
                )
                new_sup = sides.groupBy("a", "b").agg(F.count("*").alias("support"))
                oriented_to_release = oriented
            else:
                # triangles of the PREVIOUS graph containing >= 1 dropped
                # edge: distinct common-neighbor completion of the dropped
                # set against the previous adjacency (und ∪ dropped).
                prev_graph = und.unionByName(dropped_df)
                sym = prev_graph.select(F.col("a").alias("u"), F.col("b").alias("v")) \
                    .unionByName(prev_graph.select(F.col("b").alias("u"),
                                                   F.col("a").alias("v")))
                s1 = sym.select(F.col("u").alias("a"), F.col("v").alias("c"))
                s2 = sym.select(F.col("u").alias("b"), F.col("v").alias("c"))
                tri = (
                    dropped_df.join(s1, "a")
                    .join(s2, ["b", "c"])  # hash join on (b, c): wedge close
                    .select(F.sort_array(F.array("a", "b", "c")).alias("t"))
                    .select(
                        F.element_at("t", 1).alias("x"),
                        F.element_at("t", 2).alias("y"),
                        F.element_at("t", 3).alias("z"),
                    )
                    .distinct()
                )
                d_sides = (
                    tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
                    .unionAll(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
                    .unionAll(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
                )
                delta = d_sides.groupBy("a", "b").agg(F.count("*").alias("_d"))
                new_sup = (
                    sup.join(delta, ["a", "b"], "left")
                    .select(
                        "a", "b",
                        (F.col("support") - F.coalesce(F.col("_d"), F.lit(0)))
                        .alias("support"),
                    )
                )
                oriented_to_release = None
            strong = truncate_plan(
                new_sup.where(F.col("support") >= k - 2)
            )
            kept = truncate_plan(und.join(strong.select("a", "b"), ["a", "b"]))
            m = kept.count()
            if oriented_to_release is not None:
                oriented_to_release.unpersist()
            new_dropped = truncate_plan(und.join(kept, ["a", "b"], "left_anti"))
            und.unpersist()
            rounds = r
            metrics.append(
                IterationMetrics(
                    iteration=r,
                    messages_shuffled=m,
                    changed=n - m,
                    edges_scanned=n,
                    seconds=time.time() - t0,
                )
            )
            # support restricted to survivors (all kept edges have rows:
            # kept ⊆ strong by construction)
            sup = truncate_plan(strong.join(kept, ["a", "b"]))
            und, dropped, n, dropped_df = kept, n - m, m, new_dropped
            if dropped == 0 or n == 0:
                converged = True
                break
    except BaseException:
        for frame in (und, sup, dropped_df):
            if frame is not None:
                try:
                    frame.unpersist(blocking=False)
                except Exception:
                    pass
        raise
    return GimvResult(state=und, iterations=rounds, converged=converged, metrics=metrics)


def trussness(
    edges: DataFrame, k_max: int = 20, max_rounds: int = 100
) -> DataFrame:
    """Per-edge truss decomposition — trussness(e) = the largest k such
    that e survives the k-truss peel (2 for triangle-free edges), the
    edge-level sibling of :func:`coreness`. Peels levels upward using the
    telescoping identity k-truss(G) = k-truss((k-1)-truss(G)): each level
    runs :func:`ktruss` on the previous level's survivors only, so the
    triangle work shrinks with every level. Returns ``(a, b, trussness)``
    with a < b; edges still alive at ``k_max`` are labeled ``k_max``
    (a documented cap — raise it for deeper decompositions).

    Scale shape: max-trussness driver rounds, each a ktruss fixpoint on a
    SHRINKING edge set (the peel is monotone); one count per level is the
    only driver action. Expensive by nature (every level re-enumerates
    triangles among survivors) — the bounded-k form is the practical one.
    """
    und = truncate_plan(
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    pieces: list[DataFrame] = []
    k = 3
    while k <= k_max:
        if und.count() == 0:
            break
        res = ktruss(
            und.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            k, max_rounds=max_rounds,
        )
        kept = res.state
        removed = und.join(kept, ["a", "b"], "left_anti")
        pieces.append(
            removed.select("a", "b", F.lit(k - 1).cast("int").alias("trussness"))
        )
        und = truncate_plan(kept)
        k += 1
    # survivors at the cap
    pieces.append(und.select("a", "b", F.lit(min(k, k_max)).cast("int").alias("trussness")))
    out = pieces[0]
    for pc in pieces[1:]:
        out = out.unionByName(pc)
    return out


def katz(
    edges: DataFrame,
    alpha: float = 0.05,
    threshold: float = 0.0,
    max_iter: int = 10,
    checkpointer=None,
    engine: str = "flat",
    **kw,
) -> gimv.GimvResult:
    """Truncated Katz centrality (gimv.Katz): after ``max_iter`` supersteps
    the value is Σ_{k≤max_iter} α^k · #paths-of-length-k ending at the
    vertex. threshold=0.0 runs the full fixed depth (the oracle-unrollable
    contract); pass a positive threshold to stop at the |Δ| fixpoint
    instead. Both engines (scalar sum semi-ring)."""
    return _dispatch(
        edges, gimv.Katz(alpha=alpha, threshold=threshold),
        engine, max_iter, checkpointer, kw,
    )


def sssp_tree(
    edges: DataFrame,
    source_vertex: int,
    max_iter: int = 100,
    checkpointer=None,
    **kw,
) -> gimv.GimvResult:
    """Weighted SSSP with the shortest-path tree (gimv.SSSPTree): state is
    struct(dist, parent), ties broken to the lowest parent id by the
    struct ordering itself — deterministic routing output, same superstep
    shape/cost as plain sssp. Flat plan only."""
    return gimv.run(
        edges, gimv.SSSPTree(source_vertex), max_iter=max_iter,
        checkpointer=checkpointer, **kw,
    )


def dag_depth(
    edges: DataFrame,
    max_iter: int = 100,
    checkpointer=None,
    **kw,
) -> gimv.GimvResult:
    """DAG longest-path depth (gimv.LongestPath, max-plus semi-ring):
    depth(v) = length of the longest path ending at v, init 0 — the
    dependency/build-stage number on an import DAG. Converges in
    longest-path supersteps with frontier-only messaging (idempotent
    max). CONTRACT: the input must be acyclic — on a cycle the recurrence
    has no fixpoint and the run stops unconverged at ``max_iter``
    (``result.converged`` is False; condense SCCs first via ``scc`` when
    cycles are possible). Flat plan only."""
    return gimv.run(
        edges, gimv.LongestPath(), max_iter=max_iter,
        checkpointer=checkpointer, **kw,
    )


def fabp(
    edges: DataFrame,
    priors: DataFrame | None = None,
    h: float = 0.002,
    threshold: float = 0.0,
    max_iter: int = 10,
    num_partitions: int | None = None,
    checkpointer=None,
    prior_pred=None,
    engine: str = "flat",
    **kw,
) -> gimv.GimvResult:
    """FaBP semi-supervised belief propagation (gimv.FaBP): Jacobi-iterate
    ``b ← φ + c'·A·b − a·D·b`` on the SYMMETRIZED graph (BP runs over the
    undirected adjacency; symmetrize matches graph.symmetrize semantics so
    the SQL oracle can replicate the edge set exactly).

    ``priors``: (vertex, prior) seed beliefs — vertices absent get φ = 0.
    ``h``: homophily strength; keep c' = 2h/(1−4h²) below 1/λ_max(A) for a
    contraction (Koutra et al. 2011, Lemma 1). threshold=0.0 runs the full
    fixed depth (the oracle-unrollable contract), like katz/pagerank10.

    Two prior forms (the trustrank seeds/seed_pred split):

    * ``priors`` DataFrame (arbitrary beliefs): flat plan only — the
      state is a struct(b, phi, deg).
    * ``prior_pred(ids) -> float64[]`` — φ as a NumPy function of the
      vertex id (labeled id ranges/buckets, the common case at scale):
      gimv.FaBPPredicate collapses the state to a batch-family 2-vector
      and the degree arrives via the message sum, so pass
      ``engine='blocked'`` for the skew-aware CSR plan. Blocked
      contract: contiguous ids [0, n).

    Scale shape = gimv.run's flat plan: edges pinned by src once, only the
    (vertex, struct) state shuffles per superstep; φ and deg ride the state
    struct so no static-table re-join appears in the loop.
    """
    e = symmetrize(edges.select("src", "dst"))
    if prior_pred is not None:
        if engine != "blocked":
            raise ValueError(
                "prior_pred is the blocked-engine prior form "
                "(gimv.FaBPPredicate has no flat face) — pass "
                "engine='blocked', or a priors DataFrame for the flat plan"
            )
        prog = gimv.FaBPPredicate(prior_pred, h=h, threshold=threshold)
        if num_partitions is not None:
            kw["num_partitions"] = num_partitions
        return _dispatch(e, prog, engine, max_iter, checkpointer, kw)
    if priors is None:
        raise ValueError("fabp needs priors or prior_pred")
    if engine not in ("flat",):
        raise ValueError(
            "DataFrame priors run on the flat plan (struct state); use "
            "prior_pred=lambda ids: ... for the blocked engine"
        )
    deg = e.groupBy(F.col("src").alias("vertex")).agg(
        F.count("*").cast("double").alias("deg")
    )
    pcol = [c for c in priors.columns if c != "vertex"][0]
    prog = gimv.FaBP(
        priors=priors.select("vertex", F.col(pcol).alias("prior")),
        degrees=deg, h=h, threshold=threshold,
    )
    return gimv.run(
        e, prog, max_iter=max_iter, num_partitions=num_partitions,
        checkpointer=checkpointer,
    )


def trustrank(
    edges: DataFrame,
    seeds: DataFrame | None = None,
    alpha: float = gimv.PAGERANK_ALPHA,
    threshold: float = 0.0,
    max_iter: int = 10,
    num_partitions: int | None = None,
    checkpointer=None,
    seed_pred=None,
    engine: str = "flat",
    **kw,
) -> gimv.GimvResult:
    """TrustRank: PageRank whose teleport mass goes uniformly to a trusted
    seed set instead of all vertices — spam/trust propagation over a
    directed link graph. threshold=0.0 runs the full fixed depth (the
    oracle-unrollable contract); superstep shape and cost are PageRank's.

    Two seed-set forms:

    * ``seeds`` — a (vertex) DataFrame (arbitrary set): flat plan only
      (gimv.TrustRank, struct-valued state carrying the joined d weight).
    * ``seed_pred=(pred_col, pred_np)`` — the seed set as a PREDICATE of
      the vertex id (``pred_col(vertex_col) -> BooleanColumn`` and the
      matching NumPy ``pred_np(ids) -> bool[]``): scalar state on BOTH
      engines (gimv.TrustRankPredicate) — pass ``engine='blocked'``/
      ``'auto'`` to run the skew-aware CSR plan. |S| is counted once at
      setup. Blocked contract: contiguous ids [0, n) all present (the
      assign_ids invariant) so the predicate sees no phantom vertices.
    """
    if seed_pred is not None:
        pred_col, pred_np = seed_pred
        verts = (
            edges.select(F.col("src").alias("vertex"))
            .union(edges.select(F.col("dst").alias("vertex")))
            .distinct()
        )
        n_seeds = verts.filter(pred_col(F.col("vertex"))).count()
        prog = gimv.TrustRankPredicate(
            pred_col, pred_np, n_seeds, alpha=alpha, threshold=threshold
        )
        if num_partitions is not None:
            kw["num_partitions"] = num_partitions
        return _dispatch(edges, prog, engine, max_iter, checkpointer, kw)
    if seeds is None:
        raise ValueError("trustrank needs seeds or seed_pred")
    if engine not in ("flat",):
        raise ValueError(
            "DataFrame seed sets run on the flat plan (struct state); use "
            "seed_pred=(pred_col, pred_np) for the blocked engine"
        )
    prog = gimv.TrustRank(
        seeds=seeds.select("vertex").distinct(), alpha=alpha, threshold=threshold
    )
    return gimv.run(
        edges, prog, max_iter=max_iter, num_partitions=num_partitions,
        checkpointer=checkpointer,
    )


def hitting_probability(
    edges: DataFrame,
    seeds: DataFrame,
    threshold: float = 0.0,
    max_iter: int = 10,
    num_partitions: int | None = None,
    checkpointer=None,
) -> gimv.GimvResult:
    """k-step hitting probability (gimv.HittingProbability): per-vertex
    probability that a simple random walk reaches the absorbing seed set
    within ``max_iter`` steps. The recurrence pulls from OUT-neighbors, so
    this wrapper computes the original out-degrees once, transposes the
    edge table, and runs the standard superstep over the transpose — same
    plan shape and cost as PageRank. threshold=0.0 runs the full fixed
    depth (the oracle-unrollable contract); h is monotone in k, so any
    positive threshold gives early exact-ish stop.
    """
    od = edges.groupBy(F.col("src").alias("vertex")).agg(
        F.count("*").cast("double").alias("od")
    )
    transposed = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    prog = gimv.HittingProbability(
        seeds=seeds.select("vertex").distinct(), out_degree=od,
        threshold=threshold,
    )
    return gimv.run(
        transposed, prog, max_iter=max_iter, num_partitions=num_partitions,
        checkpointer=checkpointer,
    )


def spam_mass(
    edges: DataFrame,
    seeds: DataFrame,
    alpha: float = gimv.PAGERANK_ALPHA,
    max_iter: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Relative spam mass (Gyöngyi et al., "Link Spam Detection Based on
    Mass Estimation", VLDB 2006): ``m(v) = (PR(v) − TR(v)) / PR(v)`` —
    the fraction of a page's PageRank NOT explainable by trust flowing
    from the good-seed set. High m ⇒ rank comes mostly from unvouched
    (potentially spam) linkage. Composition of the two existing programs
    at the same iteration depth: one PageRank run (rank-sum normalized,
    reference semantics) + one TrustRank run, one join, column math.
    Returns (vertex, pr, trust, mass), values rounded to 6 decimals
    FIRST so mass is a deterministic function of the published pr/trust
    (the oracle composes the same rounded recurrences). PR(v) > 0 always
    (uniform teleport), so the ratio is total.
    """
    pr = gimv.run(
        edges, gimv.PageRank(alpha=alpha, threshold=0.0),
        max_iter=max_iter, num_partitions=num_partitions,
    ).state.select("vertex", F.round("value", 6).alias("pr"))
    tr = trustrank(
        edges, seeds, alpha=alpha, threshold=0.0, max_iter=max_iter,
        num_partitions=num_partitions,
    ).state.select("vertex", F.round("value", 6).alias("trust"))
    return (
        pr.join(tr, "vertex")
        .select(
            "vertex", "pr", "trust",
            F.round((F.col("pr") - F.col("trust")) / F.col("pr"), 6).alias("mass"),
        )
    )


def ppr_push(
    edges: DataFrame,
    seed: int,
    alpha: float = 0.15,
    eps: float = 1e-5,
    max_rounds: int = 50,
    num_partitions: int | None = None,
) -> GimvResult:
    """Personalized PageRank by BATCH forward push (Andersen, Chung, Lang
    FOCS 2006, all-qualifying-at-once variant): maintain (p, r) with
    p(s)=0, r(s)=1; each round EVERY vertex whose residual clears the
    push threshold (``r(u) ≥ eps·d(u)``) pushes — ``p(u) += α·r(u)`` and
    each out-neighbor receives ``(1−α)·r(u)/d(u)`` of residual. Stops
    when no vertex qualifies; then ``p`` approximates the α-teleport PPR
    from the seed with per-vertex residual error below ``eps·d(v)``.

    THE local-computation half of ACL clustering (feed ``p`` to
    :func:`sweep_cut`): work is proportional to pushed mass (O(1/(ε·α))
    touched edges), NOT graph size — on a 100 TB graph a small seed's
    cluster never scans the full edge set because each round's message
    join is against only the qualifying frontier. Total residual Σr
    shrinks by α·(pushed fraction) per round, so rounds are
    O(log(1/ε)/α)-ish; capping ``max_rounds`` is exact-comparable on any
    engine (deterministic batch rule — the oracle unrolls it). Dangling
    qualifiers (d=0) absorb their whole residual into p (a walk at a
    sink never leaves; keeps Σ(p+r) = 1). Returns state
    (vertex, p, r) over the TOUCHED vertex set only (untouched vertices
    have p = r = 0 implicitly).
    """
    spark = edges.sparkSession
    p_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    e = (
        edges.select("src", "dst")
        .repartition(p_parts, "src")
        .persist()
    )
    # static degree table, materialized once (per-round lookups must not
    # rescan the edge set; at cluster scale store it bucketed by vertex so
    # the round's new-vertex lookup co-locates)
    deg = e.groupBy(F.col("src").alias("vertex")).agg(
        F.count("*").cast("double").alias("deg")
    ).persist()
    deg.count()
    state = truncate_plan(
        deg.filter(F.col("vertex") == seed)
        .select("vertex", F.lit(0.0).alias("p"), F.lit(1.0).alias("r"), "deg")
        .unionByName(
            spark.createDataFrame(
                [(seed, 0.0, 1.0, 0.0)], "vertex long, p double, r double, deg double"
            ).join(deg.select("vertex"), "vertex", "left_anti")
        )
    )
    metrics: list[IterationMetrics] = []
    converged = False
    rounds = 0
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for k in range(1, max_rounds + 1):
            t0 = time.time()
            qual = F.col("r") >= eps * F.col("deg")
            pushing = state.filter(qual & (F.col("r") > 0))
            obs = Observation()
            pushing = pushing.observe(obs, F.count(F.lit(1)).alias("c"))
            inflow = (
                e.join(
                    pushing.filter(F.col("deg") > 0)
                    .select(F.col("vertex").alias("src"),
                            ((1.0 - alpha) * F.col("r") / F.col("deg")).alias("_m"))
                    .hint("shuffle_hash"),
                    "src",
                )
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.sum("_m").alias("_in"))
            )
            # new touched vertices enter with p=0, r=0 (+ inflow) and their
            # static degree
            updated = (
                state.join(inflow, "vertex", "full")
                .join(deg.withColumnRenamed("deg", "_d2"), "vertex", "left")
                .select(
                    "vertex",
                    (
                        F.coalesce("p", F.lit(0.0))
                        + F.when(
                            F.coalesce("r", F.lit(0.0)) > 0,
                            F.when(
                                qual & (F.col("deg") > 0),
                                alpha * F.col("r"),
                            ).when(
                                qual & (F.col("deg") <= 0), F.col("r")
                            ).otherwise(0.0),
                        ).otherwise(0.0)
                    ).alias("p"),
                    (
                        F.when(
                            F.coalesce("r", F.lit(0.0)) > 0,
                            F.when(qual, 0.0).otherwise(F.col("r")),
                        ).otherwise(0.0)
                        + F.coalesce("_in", F.lit(0.0))
                    ).alias("r"),
                    F.coalesce("deg", "_d2", F.lit(0.0)).alias("deg"),
                )
            )
            new_state = truncate_plan(updated)
            n_push = int(obs.get["c"] or 0)
            state.unpersist()
            state = new_state
            rounds = k
            metrics.append(
                IterationMetrics(
                    iteration=k,
                    messages_shuffled=n_push,
                    changed=n_push,
                    edges_scanned=n_push,
                    seconds=time.time() - t0,
                )
            )
            if n_push == 0:
                converged = True
                break
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    e.unpersist()
    deg.unpersist()
    return GimvResult(
        state=state.select("vertex", "p", "r"),
        iterations=rounds,
        converged=converged,
        metrics=metrics,
    )


def sweep_cut(
    edges: DataFrame,
    scores: DataFrame,
    top_k: int = 100,
    score_col: str = "score",
) -> DataFrame:
    """Sweep cut over a ranking vector (Andersen, Chung, Lang, FOCS 2006
    — the evaluation half of PPR local graph clustering): order vertices
    by score/degree, and for every prefix S_k of the top ``top_k`` report
    its conductance φ(S_k) = cut(S_k) / min(vol(S_k), vol(V̄)) over the
    symmetrized graph. The caller feeds any per-vertex score (typically a
    personalized-PageRank vector); the best prefix is the ACL local
    cluster around the seed. Returns one row per prefix size:
    (k, vertex, cut_edges, vol, phi) — vertex is the k-th vertex added;
    prefixes whose complement volume is 0 are dropped (φ undefined).

    Determinism: ordering is (score/deg DESC, vertex ASC); pass scores
    ROUNDED to a fixed precision if cross-engine reproducibility matters
    (the driver query feeds round-6 PPR).

    Scale shape: the only full-graph work is symmetrize + degree count +
    one broadcast join of the (≤ top_k)-row rank table onto the edges;
    the prefix-cut series is computed from ±1 RANK EVENTS (an edge is cut
    exactly for prefixes k ∈ [min_rank, max_rank)), so no per-prefix
    edge rescan — cut(k) is a running sum over a ≤ top_k-row table. The
    top-k pick is a distributed TakeOrdered; nothing sorts the full
    vertex set in one partition."""
    from pyspark.sql import Window

    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count("*").alias("deg"))
    )
    # total volume 2m = Σdeg, folded in as a 1-row broadcast (no driver
    # action — the whole operator stays one lazy plan)
    tot = deg.agg(F.sum("deg").alias("_v2"))
    key = (F.col(score_col) / F.col("deg")).alias("_key")
    topk = (
        scores.join(deg, "vertex")
        .select("vertex", "deg", key)
        .orderBy(F.desc("_key"), F.asc("vertex"))
        .limit(top_k)
    )
    w_rank = Window.orderBy(F.desc("_key"), F.asc("vertex"))
    ranked = topk.withColumn("k", F.row_number().over(w_rank)).select(
        "vertex", "deg", "k"
    )
    sentinel = top_k + 1  # "outside the sweep" — edge stays cut past top_k
    ra = F.broadcast(ranked.select(F.col("vertex").alias("a"), F.col("k").alias("ka")))
    rb = F.broadcast(ranked.select(F.col("vertex").alias("b"), F.col("k").alias("kb")))
    er = (
        und.join(ra, "a", "left")
        .join(rb, "b", "left")
        .filter(F.col("ka").isNotNull() | F.col("kb").isNotNull())
        .select(
            F.least(
                F.coalesce("ka", F.lit(sentinel)), F.coalesce("kb", F.lit(sentinel))
            ).alias("lo"),
            F.greatest(
                F.coalesce("ka", F.lit(sentinel)), F.coalesce("kb", F.lit(sentinel))
            ).alias("hi"),
        )
    )
    deltas = (
        er.select(
            F.explode(
                F.array_compact(
                    F.array(
                        F.struct(F.col("lo").alias("k"), F.lit(1).alias("d")),
                        F.when(
                            F.col("hi") <= top_k,
                            F.struct(F.col("hi").alias("k"), F.lit(-1).alias("d")),
                        ),
                    )
                )
            ).alias("ev")
        )
        .groupBy(F.col("ev.k").alias("k"))
        .agg(F.sum("ev.d").alias("dd"))
    )
    w_cum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    ser = (
        ranked.join(deltas, "k", "left")
        .select(
            "k", "vertex", "deg", F.coalesce("dd", F.lit(0)).alias("dd")
        )
        .select(
            "k",
            "vertex",
            F.sum("dd").over(w_cum).alias("cut_edges"),
            F.sum("deg").over(w_cum).alias("vol"),
        )
    )
    return (
        ser.crossJoin(F.broadcast(tot))
        .filter(F.col("_v2") - F.col("vol") > 0)
        .select(
            "k", "vertex", "cut_edges", "vol",
            F.round(
                F.col("cut_edges")
                / F.least(F.col("vol"), F.col("_v2") - F.col("vol")),
                6,
            ).alias("phi"),
        )
    )


def power_iteration(
    edges: DataFrame,
    max_iter: int = 5,
    num_partitions: int | None = None,
    engine: str = "flat",
    **kw,
) -> tuple[DataFrame, float, list[IterationMetrics]]:
    """Principal eigenvector + spectral radius of the SYMMETRIZED adjacency
    by power iteration (the HEIGEN / PEGASUS spectral-analysis headline at
    matrix-vector-product scale): x₀ = 1/√n, then ``x ← A·x / ‖A·x‖₂``
    for a FIXED ``max_iter`` products. Returns (state, lambda_est,
    metrics) where state = (vertex, value) with value the final unit
    eigenvector component and ``lambda_est = ‖A·x_{k−1}‖₂`` — the Rayleigh
    estimate of λ_max given ‖x_{k−1}‖ = 1.

    Deterministic (positive start vector on a nonnegative symmetric matrix
    keeps every iterate nonnegative — no sign ambiguity), so the whole
    recurrence is SQL-unrollable for the oracle gate.

    Scale shape mirrors hits(): ONE edge copy pinned by src (A symmetric,
    so the src-pinned copy serves Aᵀ = A), only the O(V) vector shuffles
    per product, and the L2 norm rides the SAME job that materializes the
    raw product as an Observation — one edge join, one job per iteration.

    ``engine='blocked'`` runs the products on the CSR kernels via
    DEFERRED NORMALIZATION — the blocked engine's answer to a per-step
    global scalar: since x_k ∝ A^k·x₀ whatever the intermediate scaling,
    the loop runs k−1 UNNORMALIZED sum-kernel supersteps (gimv.MatVec —
    no driver scalar inside the loop at all, strictly fewer
    synchronization points than the flat face) and a single flat readout
    product recovers λ = ‖A·y‖/‖y‖ and the unit eigenvector exactly
    (float64 headroom: ‖y‖ grows like λ^k ≲ 1e10 at gate depths; rescale
    periodically for deeper runs). Blocked contract: contiguous ids
    [0, n); phantom isolated ids go to 0 after one product and are
    dropped from the output."""
    import math

    spark = edges.sparkSession
    if engine == "blocked":
        return _power_iteration_blocked(edges, max_iter, kw)
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        symmetrize(edges.select("src", "dst"))
        .repartition(p, "src")
        .persist()
    )
    n_edges = e.count()
    verts = (
        e.select(F.col("src").alias("vertex")).distinct()
        .repartition(p, "vertex")
        .persist()
    )
    n = verts.count()
    if n == 0:
        e.unpersist()
        verts.unpersist()
        empty = spark.createDataFrame([], "vertex long, value double")
        return empty, 0.0, []

    x = truncate_plan(
        verts.select("vertex", F.lit(1.0 / math.sqrt(n)).alias("value"))
    )
    lam = 0.0
    metrics: list[IterationMetrics] = []
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for it in range(1, max_iter + 1):
            t0 = time.time()
            obs = Observation()
            raw = truncate_plan(
                e.join(
                    x.withColumnRenamed("vertex", "src").hint("shuffle_hash"),
                    "src",
                )
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.sum("value").alias("raw"))
                .observe(obs, F.sum(F.col("raw") * F.col("raw")).alias("ss"))
            )
            lam = math.sqrt(obs.get["ss"] or 0.0)
            nrm = lam or 1.0
            new_x = truncate_plan(
                verts.join(raw, "vertex", "left").select(
                    "vertex",
                    (F.coalesce("raw", F.lit(0.0)) / F.lit(nrm)).alias("value"),
                )
            )
            raw.unpersist()
            x.unpersist()
            x = new_x
            metrics.append(
                IterationMetrics(
                    iteration=it, messages_shuffled=n_edges, changed=n,
                    edges_scanned=n_edges, seconds=time.time() - t0,
                )
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    e.unpersist()
    verts.unpersist()
    return x, lam, metrics


def _power_iteration_blocked(edges, max_iter, kw):
    """Deferred-normalization blocked face of :func:`power_iteration` —
    see its docstring. k−1 unnormalized MatVec supersteps on the CSR
    kernels, then one flat readout product for (x, λ)."""
    import math

    from flexgraph_spark import blocks

    spark = edges.sparkSession
    e = symmetrize(edges.select("src", "dst")).persist()
    n_edges = e.count()
    verts = (
        e.select(F.col("src").alias("vertex")).distinct().persist()
    )
    n = verts.count()
    if n == 0:
        e.unpersist()
        verts.unpersist()
        empty = spark.createDataFrame([], "vertex long, value double")
        return empty, 0.0, []
    if max_iter <= 1:
        y = verts.select("vertex", F.lit(1.0).alias("value"))
        metrics = []
    else:
        res = blocks.run_blocked(
            e, gimv.MatVec(), max_iter=max_iter - 1,
            p=kw.get("p"), dense_threshold=kw.get(
                "dense_threshold", blocks.DENSE_THRESHOLD_DEFAULT),
        )
        # phantom ids ([0, n) slots absent from the graph) are exact
        # zeros after the first product; drop them so norms and output
        # match the flat (graph-vertex) face
        y = res.state.join(verts, "vertex")
        metrics = res.metrics
    y = gimv.truncate_plan(y)
    raw = (
        e.join(y.withColumnRenamed("vertex", "src").hint("shuffle_hash"),
               "src")
        .groupBy(F.col("dst").alias("vertex"))
        .agg(F.sum("value").alias("raw"))
    )
    row = (
        verts.join(raw, "vertex", "left")
        .agg(
            F.sum(F.coalesce("raw", F.lit(0.0))
                  * F.coalesce("raw", F.lit(0.0))).alias("ss_raw"),
        )
        .crossJoin(y.agg(F.sum(F.col("value") * F.col("value")).alias("ss_y")))
        .first()
    )
    nrm_raw = math.sqrt(row["ss_raw"] or 0.0)
    nrm_y = math.sqrt(row["ss_y"] or 0.0)
    lam = (nrm_raw / nrm_y) if nrm_y > 0 else 0.0
    x = gimv.truncate_plan(
        verts.join(raw, "vertex", "left").select(
            "vertex",
            (F.coalesce("raw", F.lit(0.0)) / F.lit(nrm_raw or 1.0))
            .alias("value"),
        )
    )
    y.unpersist()
    e.unpersist()
    verts.unpersist()
    metrics = metrics + [
        IterationMetrics(
            iteration=len(metrics) + 1, messages_shuffled=n_edges,
            changed=n, edges_scanned=n_edges, seconds=0.0,
        )
    ]
    return x, lam, metrics


def salsa(
    edges: DataFrame, max_iter: int = 10, num_partitions: int | None = None,
    engine: str = "flat", **kw
) -> GimvResult:
    """SALSA (Lempel & Moran, stochastic HITS): per iteration
    ``auth(v) = Σ_{u→v} hub(u)/outdeg(u)`` then
    ``hub(u) = Σ_{u→v} auth(v)/indeg(v)``; init hub = 1. Both half-step
    matrices are column-stochastic, so no per-iteration normalization is
    needed (total hub mass is conserved onto non-dangling vertices) — the
    recommender-graph variant of :func:`hits` that damps the
    high-degree-hub dominance HITS suffers on skewed link graphs.
    Runs a FIXED ``max_iter`` recurrence (oracle-unrollable).

    Scale shape mirrors :func:`hits`: TWO pinned edge copies (by src and
    by dst) so neither half-step reshuffles the edge table — only the
    small vertex states move; shuffle_hash hints keep Catalyst from
    broadcasting the edge side. Degrees are computed ONCE and ride inside
    the pinned edge copies as extra columns (``odeg`` on the src copy,
    ``ideg`` on the dst copy), so supersteps never join a degree table —
    the same degrees-ride-with-the-edges trick as the blocked engine's
    ``gdeg`` arrays (blocks.py).

    ``engine='blocked'``: vertex doubling + parity masking
    (gimv.AlternatingPropagation, ``scaled=True``) — in the doubled
    graph ``gdeg`` IS odeg for hubs and ideg for authorities, so both
    SALSA denominators ride the standard degree plumbing and no
    normalization of any kind is deferred (SALSA has none); blocked
    values equal flat values outright. Contiguous ids [0, n).
    """
    if engine == "blocked":
        return _alternating_blocked(
            edges, max_iter, scaled=True, normalize=False, kw=kw
        )
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst").distinct()
    odeg = e.groupBy("src").agg(F.count("*").cast("double").alias("odeg"))
    ideg = e.groupBy("dst").agg(F.count("*").cast("double").alias("ideg"))
    e_src = (
        e.join(odeg, "src").select("src", "dst", "odeg")
        .repartition(p, "src").persist()
    )
    n_edges = e_src.count()
    e_dst = (
        e.join(ideg, "dst").select("src", "dst", "ideg")
        .repartition(p, "dst").persist()
    )
    e_dst.count()
    verts = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .repartition(p, "vertex")
        .persist()
    )
    n = verts.count()
    if n == 0:
        for df in (e_src, e_dst, verts):
            df.unpersist()
        empty = spark.createDataFrame([], "vertex long, hub double, auth double")
        return GimvResult(state=empty, iterations=0, converged=True, metrics=[])

    def _complete(raw: DataFrame, out_col: str) -> DataFrame:
        raw = truncate_plan(raw)
        return raw, verts.join(raw, "vertex", "left").select(
            "vertex", F.coalesce("raw", F.lit(0.0)).alias(out_col)
        )

    hub = truncate_plan(verts.select("vertex", F.lit(1.0).alias("hub")))
    auth = None
    cached: list[DataFrame] = []
    metrics: list[IterationMetrics] = []
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for it in range(1, max_iter + 1):
            t0 = time.time()
            a_raw, new_auth = _complete(
                e_src.join(
                    hub.withColumnRenamed("vertex", "src").hint("shuffle_hash"),
                    "src",
                )
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.sum(F.col("hub") / F.col("odeg")).alias("raw")),
                "auth",
            )
            h_raw, new_hub = _complete(
                e_dst.join(
                    new_auth.withColumnRenamed("vertex", "dst").hint("shuffle_hash"),
                    "dst",
                )
                .groupBy(F.col("src").alias("vertex"))
                .agg(F.sum(F.col("auth") / F.col("ideg")).alias("raw")),
                "hub",
            )
            for old in cached:
                old.unpersist()
            if it == 1:
                hub.unpersist()
            cached = [a_raw, h_raw]
            hub, auth = new_hub, new_auth
            metrics.append(
                IterationMetrics(
                    iteration=it,
                    messages_shuffled=2 * n_edges,
                    changed=n,
                    edges_scanned=2 * n_edges,
                    seconds=time.time() - t0,
                )
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    state = hub.join(auth, "vertex")
    e_src.unpersist()
    e_dst.unpersist()
    verts.unpersist()
    return GimvResult(state=state, iterations=max_iter, converged=False, metrics=metrics)


def scc(
    edges: DataFrame,
    max_outer: int = 50,
    max_inner: int = 200,
    num_partitions: int | None = None,
) -> GimvResult:
    """Strongly connected components by iterative coloring + color-local
    backward reach (Orzan's coloring / FW-BW family): each outer round
    (1) floods ``color(v) = min active vertex that reaches v`` forward to
    fixpoint (HashMin over the live subgraph), (2) for every root
    (``color(v) == v``) collects its SCC as the vertices that reach the
    root through SAME-COLOR vertices (frontier BFS over the intra-color
    edge subset — exact: any vertex on a path v ⇒ root inside a root's
    color class is itself colored by the root, see Orzan 2004), then
    (3) removes the extracted SCCs and repeats on the shrinking remainder.
    Returns state (vertex, value) with value = min member id of the SCC —
    the same label contract as :func:`connected_components`, so the oracle
    is the transitive-closure mutual-reachability SQL.

    Scale notes: every outer round shrinks BOTH the vertex and edge sets
    (at minimum the global-min vertex's SCC and everything it colors out);
    the forward HashMin fixpoint is frontier/delta-style — only vertices
    whose color changed last step re-send — and the backward pass joins
    only the NEW frontier against the intra-color edges, so the tail
    iterations touch O(frontier), not O(E). All fixpoints cut lineage via
    truncate_plan. Worst case (a path graph) degenerates to O(n) rounds
    like every label-propagation SCC; real link graphs with one giant SCC
    finish in 1-2 outer rounds.
    """
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    live_e = truncate_plan(
        edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
        .distinct().repartition(p, "src")
    )
    live_v = truncate_plan(
        live_e.select(F.col("src").alias("vertex"))
        .union(live_e.select(F.col("dst").alias("vertex")))
        .distinct().repartition(p, "vertex")
    )
    n_live = live_v.count()
    assigned: list[DataFrame] = []
    metrics: list[IterationMetrics] = []
    converged = False
    rounds = 0
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for outer in range(1, max_outer + 1):
            if n_live == 0:
                converged = True
                break
            t0 = time.time()
            edges_scanned = 0
            # (1) forward min-color flood, frontier-only after step 1. The
            # changed count rides on the SAME job that materializes the new
            # color state (Observation on truncate_plan's eager
            # localCheckpoint — the gimv.run convergence-vote trick), so
            # each flood step is exactly ONE Spark job.
            color = truncate_plan(
                live_v.select("vertex", F.col("vertex").alias("color"))
            )
            frontier = color  # every vertex "changed" at init
            for _ in range(max_inner):
                inc = (
                    live_e.join(
                        frontier.select(
                            F.col("vertex").alias("src"), "color"
                        ).hint("shuffle_hash"),
                        "src",
                    )
                    .groupBy(F.col("dst").alias("vertex"))
                    .agg(F.min("color").alias("inc"))
                )
                obs = Observation()
                new_color = truncate_plan(
                    color.join(inc.hint("shuffle_hash"), "vertex", "left")
                    .select(
                        "vertex",
                        F.least("color", F.coalesce("inc", "color")).alias("color"),
                        (F.coalesce("inc", "color") < F.col("color")).alias("chg"),
                    )
                    .observe(obs, F.sum(F.col("chg").cast("int")).alias("c"))
                )
                n_chg = int(obs.get["c"] or 0)
                edges_scanned += n_chg
                color.unpersist()
                color = new_color.select("vertex", "color")
                # lazy filter over the checkpointed new_color — no extra job
                frontier = new_color.filter("chg").select("vertex", "color")
                if n_chg == 0:
                    break
            # (2) intra-color edges + backward frontier BFS from the roots
            intra = truncate_plan(
                live_e.join(
                    color.select(F.col("vertex").alias("src"),
                                 F.col("color").alias("c_src")).hint("shuffle_hash"),
                    "src",
                )
                .join(
                    color.select(F.col("vertex").alias("dst"),
                                 F.col("color").alias("c_dst")).hint("shuffle_hash"),
                    "dst",
                )
                .filter(F.col("c_src") == F.col("c_dst"))
                .select("src", "dst")
                .repartition(p, "dst")
            )
            # ``reached`` is the lazy union of checkpointed BFS layers — the
            # anti-join sees a shallow union plan (each layer is an
            # in-memory LogicalRDD), so no per-step re-materialization of
            # the accumulated set is needed. New-layer counts ride on the
            # layer's own truncate job as Observations.
            roots = truncate_plan(
                color.filter(F.col("vertex") == F.col("color")).select("vertex")
            )
            layers = [roots]
            reached = roots
            bfront = roots
            for _ in range(max_inner):
                obs = Observation()
                nxt = truncate_plan(
                    intra.join(
                        bfront.select(F.col("vertex").alias("dst")).hint(
                            "shuffle_hash"
                        ),
                        "dst",
                    )
                    .select(F.col("src").alias("vertex"))
                    .distinct()
                    .join(reached, "vertex", "left_anti")
                    .observe(obs, F.count(F.lit(1)).alias("c"))
                )
                n_new = int(obs.get["c"] or 0)
                if n_new == 0:
                    nxt.unpersist()
                    break
                layers.append(nxt)
                reached = reached.union(nxt)
                bfront = nxt
            # (3) extract, shrink. ``assigned`` stays a list of checkpointed
            # per-round extracts (consumed only at the very end — no
            # per-round union re-materialization); the live-vertex count
            # rides on new_live_v's truncate job as an Observation.
            obs_got = Observation()
            got = truncate_plan(
                reached.join(color, "vertex")
                .select("vertex", F.col("color").alias("value"))
                .observe(obs_got, F.count(F.lit(1)).alias("c"))
            )
            n_got = int(obs_got.get["c"] or 0)
            assigned.append(got)
            obs_live = Observation()
            new_live_v = truncate_plan(
                live_v.join(reached, "vertex", "left_anti")
                .observe(obs_live, F.count(F.lit(1)).alias("c"))
            )
            new_live_e = truncate_plan(
                live_e.join(new_live_v.withColumnRenamed("vertex", "src"), "src")
                .join(new_live_v.withColumnRenamed("vertex", "dst"), "dst")
                .select("src", "dst")
                .repartition(p, "src")
            )
            for df in (live_v, live_e, color, intra, *layers):
                df.unpersist()
            live_v, live_e = new_live_v, new_live_e
            n_prev, n_live = n_live, int(obs_live.get["c"] or 0)
            rounds = outer
            metrics.append(
                IterationMetrics(
                    iteration=outer,
                    messages_shuffled=edges_scanned,
                    changed=n_got,
                    edges_scanned=n_prev,
                    seconds=time.time() - t0,
                )
            )
            if n_live == 0:
                converged = True
                break
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    live_v.unpersist()
    live_e.unpersist()
    if assigned:
        labels = assigned[0]
        for frame in assigned[1:]:
            labels = labels.union(frame)
    else:
        labels = spark.createDataFrame([], "vertex long, value long")
    # vertices that only ever appear as isolated endpoints of self-loops /
    # filtered edges: everything in the original edge set must get a label
    all_v = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    state = all_v.join(labels, "vertex", "left").select(
        "vertex", F.coalesce("value", "vertex").alias("value")
    )
    return GimvResult(
        state=state, iterations=rounds, converged=converged, metrics=metrics
    )


def condensation_levels(
    edges: DataFrame,
    max_levels: int = 200,
    num_partitions: int | None = None,
    scc_labels: DataFrame | None = None,
) -> DataFrame:
    """Condensation-DAG topological levels: contract the graph by its SCCs
    (:func:`scc` + graph.contract_graph — the condensation is acyclic by
    construction), then assign each condensation node
    ``level = length of the longest condensation path ending at it``
    (sources = 0) by iterative max-relaxation. Returns one row per ORIGINAL
    vertex: (vertex, scc_id, level) — the canonical "stage number" of a
    dependency graph (module build order, pipeline phases) with cycles
    collapsed first.

    Pass ``scc_labels`` (a (vertex, value) state from :func:`scc`) to skip
    recomputing the decomposition.

    Scale notes: the relaxation runs on the CONDENSED graph (|SCCs| nodes
    — orders of magnitude smaller than V on real link graphs), with
    max-semi-ring frontier messaging (only nodes whose level rose re-send;
    exact because levels only increase), one Spark job per step via the
    Observation-on-truncate trick. Longest-path layering needs #levels
    rounds — bounded by the condensation's depth, not V.
    """
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if scc_labels is None:
        scc_labels = scc(edges, num_partitions=num_partitions).state
    labels = truncate_plan(scc_labels.select("vertex", F.col("value").alias("scc_id")))
    from flexgraph_spark.graph import contract_graph

    dag = truncate_plan(
        contract_graph(
            edges.select("src", "dst"),
            labels.select("vertex", F.col("scc_id").alias("label")),
        )
        .select("src", "dst")
        .repartition(p, "src")
    )
    nodes = (
        dag.select(F.col("src").alias("node"))
        .union(dag.select(F.col("dst").alias("node")))
        .distinct()
    )
    level = truncate_plan(nodes.select("node", F.lit(0).alias("level")))
    frontier = level
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for _ in range(max_levels):
            inc = (
                dag.join(
                    frontier.select(F.col("node").alias("src"), "level").hint(
                        "shuffle_hash"
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.max(F.col("level") + 1).alias("inc"))
            )
            obs = Observation()
            new_level = truncate_plan(
                level.join(inc.hint("shuffle_hash"), "node", "left")
                .select(
                    "node",
                    F.greatest("level", F.coalesce("inc", "level")).alias("level"),
                    (F.coalesce("inc", F.lit(-1)) > F.col("level")).alias("chg"),
                )
                .observe(obs, F.sum(F.col("chg").cast("int")).alias("c"))
            )
            n_chg = int(obs.get["c"] or 0)
            level.unpersist()
            level = new_level.select("node", "level")
            frontier = new_level.filter("chg").select("node", "level")
            if n_chg == 0:
                break
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    out = (
        labels.join(
            level.withColumnRenamed("node", "scc_id"), "scc_id", "left"
        )
        .select("vertex", "scc_id", F.coalesce("level", F.lit(0)).alias("level"))
    )
    out = truncate_plan(out)
    level.unpersist()
    dag.unpersist()
    labels.unpersist()
    return out


def maximal_independent_set(
    edges: DataFrame, max_rounds: int = 50, num_partitions: int | None = None
) -> GimvResult:
    """Maximal independent set by Luby-style rounds with deterministic
    by-id priorities: each round, every live vertex whose id is smaller
    than ALL its live neighbors' ids joins the MIS, then the joiners AND
    their neighbors retire. Terminates when no vertex is live; the result
    is independent (no two adjacent members) and maximal (every
    non-member lost to a member neighbor). Self-loops are dropped (a
    vertex adjacent to itself could never join) and direction is ignored.
    Returns state (vertex, value) where value = the round the vertex
    joined — capping ``max_rounds`` yields exactly the first k layers on
    any engine (deterministic, so an equally-capped oracle unroll
    compares equal; the kcore/ktruss comparability contract).

    Scale notes: the live edge set SHRINKS geometrically (each round
    removes the joiners' whole neighborhoods); per round one map-side
    combined min-aggregate keyed by src + two anti-joins, with loop
    counts riding on the truncate jobs as Observations. By-id priorities
    are deterministic and need zero extra state; on adversarial chains
    they degrade toward O(n) rounds where Luby's random priorities give
    O(log n) — swap the priority to a per-round multiplicative hash of
    the id if that ever bites (same plan shape, still deterministic).
    """
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    live_e = truncate_plan(
        symmetrize(
            edges.select("src", "dst").where(F.col("src") != F.col("dst"))
        ).repartition(p, "src")
    )
    active = truncate_plan(
        live_e.select(F.col("src").alias("vertex")).distinct()
        .repartition(p, "vertex")
    )
    n_active = active.count()
    layers: list[DataFrame] = []
    metrics: list[IterationMetrics] = []
    converged = False
    rounds = 0
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for r in range(1, max_rounds + 1):
            if n_active == 0:
                converged = True
                break
            t0 = time.time()
            nbr_min = live_e.groupBy(F.col("src").alias("vertex")).agg(
                F.min("dst").alias("m")
            )
            obs_s = Observation()
            joined = truncate_plan(
                active.join(nbr_min.hint("shuffle_hash"), "vertex", "left")
                .where(F.col("m").isNull() | (F.col("vertex") < F.col("m")))
                .select("vertex", F.lit(r).alias("value"))
                .observe(obs_s, F.count(F.lit(1)).alias("c"))
            )
            n_joined = int(obs_s.get["c"] or 0)
            layers.append(joined)
            retire = joined.select("vertex").union(
                live_e.join(
                    joined.select(F.col("vertex").alias("src")).hint(
                        "shuffle_hash"
                    ),
                    "src",
                ).select(F.col("dst").alias("vertex"))
            ).distinct()
            obs_a = Observation()
            new_active = truncate_plan(
                active.join(retire, "vertex", "left_anti")
                .observe(obs_a, F.count(F.lit(1)).alias("c"))
            )
            new_live_e = truncate_plan(
                live_e.join(new_active.withColumnRenamed("vertex", "src"), "src")
                .join(new_active.withColumnRenamed("vertex", "dst"), "dst")
                .select("src", "dst")
                .repartition(p, "src")
            )
            active.unpersist()
            live_e.unpersist()
            active, live_e = new_active, new_live_e
            n_prev, n_active = n_active, int(obs_a.get["c"] or 0)
            rounds = r
            metrics.append(
                IterationMetrics(
                    iteration=r,
                    messages_shuffled=n_joined,
                    changed=n_prev - n_active,
                    edges_scanned=n_prev,
                    seconds=time.time() - t0,
                )
            )
        else:
            converged = n_active == 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    active.unpersist()
    live_e.unpersist()
    if layers:
        state = layers[0]
        for frame in layers[1:]:
            state = state.union(frame)
    else:
        state = spark.createDataFrame([], "vertex long, value int")
    return GimvResult(
        state=state, iterations=rounds, converged=converged, metrics=metrics
    )


def maximal_matching(
    edges: DataFrame, max_rounds: int = 50, num_partitions: int | None = None,
    priority: str = "hash",
) -> GimvResult:
    """Maximal matching by locally-minimal-edge rounds (the deterministic
    sibling of :func:`maximal_independent_set` — Israeli-Itai-style
    parallel matching with by-(a,b) edge priorities instead of random
    ones): each round, an undirected live edge (a, b) enters the matching
    iff it is the lexicographically smallest live edge at BOTH endpoints;
    matched vertices retire with their whole incident edge set. The
    result is a matching (no two output edges share a vertex) and maximal
    (every remaining edge lost an endpoint to the matching). Returns
    state (a, b, value = the round the edge matched); capping
    ``max_rounds`` yields exactly the first k layers on any engine (the
    MIS/kcore comparability contract). Self-loops dropped, direction
    ignored.

    ``priority`` picks the edge total order (the same strategy split as
    greedy_coloring's palette-vs-JP): "hash" (default) keys each round by
    ``(xxhash64(a, b, round), a, b)`` — pseudo-random per-round
    priorities, the Israeli-Itai O(log n)-rounds regime, deterministic at
    any parallelism; "lex" keys by ``(a, b)`` — fully SQL-unrollable (the
    oracle face) but serializing toward O(n) rounds on dense
    neighborhoods (measured: 3.5x slower on the sf0.1 bench graph).

    Scale notes: per round one per-endpoint min-aggregate (map-side
    combined; the incidence explode doubles rows but carries only two
    longs) + two anti-joins; the live edge set shrinks geometrically
    (with "hash", a constant expected fraction of live edges is locally
    minimal at both ends each round).
    """
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    live = truncate_plan(
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .repartition(p, "a")
    )
    n_live = live.count()
    layers: list[DataFrame] = []
    metrics: list[IterationMetrics] = []
    converged = False
    rounds = 0
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for r in range(1, max_rounds + 1):
            if n_live == 0:
                converged = True
                break
            t0 = time.time()
            if priority == "hash":
                pri = F.struct(
                    F.xxhash64("a", "b", F.lit(r)).alias("h"), "a", "b"
                )
            else:
                pri = F.struct(
                    F.col("a").alias("h"), F.col("a").alias("pa"), "b"
                )
            vmin = (
                live.select(
                    F.explode(F.array("a", "b")).alias("v"), pri.alias("pri")
                )
                .groupBy("v")
                .agg(F.min("pri").alias("mp"))
            )
            obs_m = Observation()
            matched = truncate_plan(
                live.join(
                    vmin.select(F.col("v").alias("a"), F.col("mp").alias("ma"))
                    .hint("shuffle_hash"),
                    "a",
                )
                .join(
                    vmin.select(F.col("v").alias("b"), F.col("mp").alias("mb"))
                    .hint("shuffle_hash"),
                    "b",
                )
                .where((pri == F.col("ma")) & (pri == F.col("mb")))
                .select("a", "b", F.lit(r).alias("value"))
                .observe(obs_m, F.count(F.lit(1)).alias("c"))
            )
            n_matched = int(obs_m.get["c"] or 0)
            layers.append(matched)
            mv = (
                matched.select(F.col("a").alias("v"))
                .union(matched.select(F.col("b").alias("v")))
                .distinct()
            )
            obs_l = Observation()
            new_live = truncate_plan(
                live.join(mv.withColumnRenamed("v", "a"), "a", "left_anti")
                .join(mv.withColumnRenamed("v", "b"), "b", "left_anti")
                .repartition(p, "a")
                .observe(obs_l, F.count(F.lit(1)).alias("c"))
            )
            live.unpersist()
            n_prev, n_live = n_live, int(obs_l.get["c"] or 0)
            live = new_live
            rounds = r
            metrics.append(
                IterationMetrics(
                    iteration=r,
                    messages_shuffled=n_matched,
                    changed=n_prev - n_live,
                    edges_scanned=n_prev,
                    seconds=time.time() - t0,
                )
            )
        else:
            converged = n_live == 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    live.unpersist()
    if layers:
        state = layers[0]
        for frame in layers[1:]:
            state = state.union(frame)
    else:
        state = spark.createDataFrame([], "a long, b long, value int")
    return GimvResult(
        state=state, iterations=rounds, converged=converged, metrics=metrics
    )


def betweenness_sampled(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Source-sampled, depth-bounded betweenness centrality (Brandes'
    dependency accumulation over the shortest-path DAG, truncated at
    ``max_depth`` hops — the standard approximation for graphs where exact
    betweenness' all-pairs cost is unpayable): forward layered BFS from
    every source AT ONCE carrying per-(source, vertex) shortest-path
    counts σ, then backward accumulation
    ``δ(v) = Σ_{w ∈ succ(v)} σ(v)/σ(w) · (1 + δ(w))`` layer by layer.
    Returns (vertex, betweenness) with
    ``betweenness(v) = Σ_{s ∈ sources, v ≠ s} δ_s(v)``, rounded to 6.

    Directed, unweighted. The depth bound makes the result a documented
    truncation (pairs farther than ``max_depth`` contribute nothing) —
    exactly unrollable by a fixed-depth oracle, the closeness4 contract.

    Scale shape: all sources ride one DataFrame keyed by (s, v) — one
    edge join per BFS layer serves every source (the BatchPPR batching
    trick), and layer membership IS the shortest-path-DAG filter (an edge
    from depth d to depth d+1 is a DAG edge by definition), so the
    backward pass is one join per depth against the cached layers with no
    per-pair predecessor lists. Work is O(Σ_s |reach_≤D(s)| · avg_deg);
    the (s, v) key spreads hub load across sources, AQE splits what's
    left. σ/δ stay exact longs/doubles — no sketching.
    """
    if not sources:
        raise ValueError("betweenness_sampled needs at least one source")
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = truncate_plan(
        edges.select("src", "dst").where(F.col("src") != F.col("dst"))
        .distinct().repartition(p, "src")
    )
    src_rows = [(int(s),) for s in sources]
    l0 = truncate_plan(
        spark.createDataFrame(src_rows, "s long")
        .select("s", F.col("s").alias("v"), F.lit(1.0).alias("sigma"))
    )
    layers = [l0]
    seen = l0.select("s", "v")
    frontier = l0
    for _ in range(1, max_depth + 1):
        obs = Observation()
        nxt = truncate_plan(
            frontier.select("s", F.col("v").alias("src"), "sigma")
            .join(e.hint("shuffle_hash"), "src")
            .groupBy("s", F.col("dst").alias("v"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(seen, ["s", "v"], "left_anti")
            .observe(obs, F.count(F.lit(1)).alias("c"))
        )
        if int(obs.get["c"] or 0) == 0:
            nxt.unpersist()
            break
        layers.append(nxt)
        seen = seen.union(nxt.select("s", "v"))
        frontier = nxt
    # backward: delta of the deepest layer is 0; accumulate upward
    delta = None  # (s, v, delta) for layers below the current one
    acc: list[DataFrame] = []
    for d in range(len(layers) - 2, -1, -1):
        cur, below = layers[d], layers[d + 1]
        wdelta = below.select("s", "v", "sigma")
        if delta is not None:
            wdelta = wdelta.join(delta, ["s", "v"], "left").select(
                "s", "v", "sigma",
                F.coalesce("delta", F.lit(0.0)).alias("delta"),
            )
        else:
            wdelta = wdelta.select("s", "v", "sigma", F.lit(0.0).alias("delta"))
        contrib = (
            cur.select("s", F.col("v").alias("src"), "sigma")
            .join(e.hint("shuffle_hash"), "src")
            .join(
                wdelta.select(
                    "s", F.col("v").alias("dst"),
                    F.col("sigma").alias("sigma_w"),
                    F.col("delta").alias("delta_w"),
                ),
                ["s", "dst"],
            )
            .groupBy("s", F.col("src").alias("v"))
            .agg(
                F.sum(
                    F.col("sigma") / F.col("sigma_w")
                    * (F.lit(1.0) + F.col("delta_w"))
                ).alias("delta")
            )
        )
        delta = truncate_plan(contrib)
        acc.append(delta)
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    if acc:
        alldelta = acc[0]
        for frame in acc[1:]:
            alldelta = alldelta.union(frame)
        per_v = (
            alldelta.where(F.col("s") != F.col("v"))
            .groupBy(F.col("v").alias("vertex"))
            .agg(F.sum("delta").alias("b"))
        )
    else:
        per_v = spark.createDataFrame([], "vertex long, b double")
    out = verts.join(per_v, "vertex", "left").select(
        "vertex", F.round(F.coalesce("b", F.lit(0.0)), 6).alias("betweenness")
    )
    out = truncate_plan(out)
    for frame in layers + acc:
        frame.unpersist()
    e.unpersist()
    return out


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity of a vertex partition on the undirected simple
    graph: one row ``(modularity double, n_communities long)``.

    Q = Σ_c [ intra_c / M − (deg_c / M)² ] over the SYMMETRIZED edge list
    (M = directed edge count = 2m, intra_c = within-community directed
    edges, deg_c = community degree sum) — the standard quality score for
    any community assignment (LP labels, CC components, a module rollup).
    ``labels`` is (vertex, label); vertices missing from it contribute
    nothing (inner join), so a partial labeling scores its covered
    subgraph.

    Exactness: per-community tallies are integer aggregates summed as
    decimal(38,0) (order-independent, overflow-proof at 10^12 edges); the
    only float ops are two final divisions, so the result is bit-stable
    across partitionings and an unrolled SQL oracle matches without
    rounding games (rounded to 6 anyway for the repo-wide hash contract).
    Plan: two hash joins + one groupBy + a one-row final aggregate.
    """
    se = symmetrize(
        edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    )
    lab = labels.select("vertex", "label")
    e2 = (
        se.join(lab.withColumnRenamed("vertex", "src")
                .withColumnRenamed("label", "sl"), "src")
        .join(lab.withColumnRenamed("vertex", "dst")
              .withColumnRenamed("label", "dl"), "dst")
    )
    per = e2.groupBy("sl").agg(
        F.count(F.lit(1)).alias("deg_c"),
        F.sum(F.when(F.col("dl") == F.col("sl"), 1).otherwise(0)).alias(
            "intra_c"
        ),
    )
    n_comm = lab.select("label").distinct().count()
    dec = "decimal(38,0)"
    tot = per.agg(
        F.sum(F.col("deg_c").cast(dec)).alias("m_dir"),
        F.sum(F.col("intra_c").cast(dec)).alias("intra"),
        F.sum((F.col("deg_c") * F.col("deg_c")).cast(dec)).alias("deg_sq"),
    )
    return tot.select(
        F.round(
            F.col("intra").cast("double") / F.col("m_dir").cast("double")
            - F.col("deg_sq").cast("double")
            / (F.col("m_dir").cast("double") * F.col("m_dir").cast("double")),
            6,
        ).alias("modularity"),
        F.lit(n_comm).cast("long").alias("n_communities"),
    )


def greedy_coloring(
    edges: DataFrame,
    max_rounds: int = 100,
    num_partitions: int | None = None,
    strategy: str = "palette",
) -> GimvResult:
    """Distributed (Δ+1) graph coloring, deterministic (a pure function
    of the edge set — every random choice is an ``xxhash64`` of vertex
    id and round). Self-loops dropped, direction ignored; isolated
    vertices never reach the edge list and are the caller's trivial
    color-0 case. Returns state (vertex, value=color int), iterations =
    rounds used.

    ``strategy='palette'`` (default — Johansson's randomized coloring):
    each round EVERY uncolored vertex picks a hash-indexed color from
    ``{0..deg(v)}`` minus its colored neighbors' colors (non-empty: at
    most deg(v) exclusions from a deg(v)+1 palette); adjacent same-pick
    pairs are resolved by hash priority (the loser re-rolls next round).
    Expected conflicting neighbors ≤ 1 for ANY degree (a pick collides
    with prob ≤ 1/min(palette sizes)), so a constant fraction of the
    frontier retires per round: O(log n) rounds independent of density.
    Proper: earlier colors are excluded via the forbidden set, same-round
    ties lose on priority; ≤ Δ+1 colors since picks never exceed deg(v).

    ``strategy='jp'`` (Jones–Plassmann): only local priority maxima
    among uncolored neighbors color (with the mex of colored-neighbor
    colors). Fewer, lower colors and cheaper rounds on SPARSE graphs, but
    round count follows the longest hash-decreasing path — O(Δ)-ish on
    dense graphs (measured: ~130 rounds on a 1000-vertex avg-degree-120
    gate graph vs ~15 for palette), so it is the wrong default at scale.

    Scale shape (both): the live edge set shrinks as winners retire;
    per round a bounded number of hash joins + one map-side-combined
    aggregate — no collect, no per-row Python. Array expressions are
    bounded by deg(v) (palette pick / mex), so a 10^6-degree hub
    materializes an O(deg) array in the pick stage only — the same
    few-hubs premise as the blocked engine's dense rows.
    """
    if strategy not in ("palette", "jp"):
        raise ValueError(f"unknown coloring strategy {strategy!r}")
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    def pri(v):
        return F.struct(F.xxhash64(v).alias("h"), v.alias("v"))

    se = truncate_plan(
        symmetrize(
            edges.select("src", "dst").where(F.col("src") != F.col("dst"))
        ).repartition(p, "src")
    )
    active = truncate_plan(
        se.select(F.col("src").alias("vertex")).distinct()
        .repartition(p, "vertex")
    )
    degs = truncate_plan(
        se.groupBy(F.col("src").alias("vertex"))
        .agg(F.count(F.lit(1)).cast("int").alias("deg"))
        .repartition(p, "vertex")
    )
    live_e = se
    n_active = active.count()
    colored = spark.createDataFrame([], "vertex long, value int")
    metrics: list[IterationMetrics] = []
    converged = False
    rounds = 0
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for r in range(1, max_rounds + 1):
            if n_active == 0:
                converged = True
                break
            t0 = time.time()
            # forbidden sets: colors already fixed in the neighborhood
            # (restricted to live sources — the join shrinks with the
            # frontier, not with total E)
            forb = (
                se.join(active.withColumnRenamed("vertex", "src"), "src")
                .join(
                    colored.withColumnRenamed("vertex", "dst")
                    .withColumnRenamed("value", "c"),
                    "dst",
                )
                .groupBy(F.col("src").alias("vertex"))
                .agg(F.collect_set("c").alias("carr"))
            )
            carr = F.coalesce(F.col("carr"), F.array().cast("array<int>"))
            obs_w = Observation()
            if strategy == "palette":
                allowed = F.filter(
                    F.sequence(F.lit(0), F.col("deg")),
                    lambda x: ~F.array_contains(carr, x),
                )
                idx = F.pmod(
                    F.xxhash64(F.col("vertex"), F.lit(r)), F.size(allowed)
                )
                cand = (
                    active.join(degs.hint("shuffle_hash"), "vertex")
                    .join(forb.hint("shuffle_hash"), "vertex", "left")
                    .select(
                        "vertex",
                        F.element_at(allowed, (idx + 1).cast("int"))
                        .cast("int")
                        .alias("value"),
                    )
                )
                losers = (
                    live_e.join(
                        cand.withColumnRenamed("vertex", "src")
                        .withColumnRenamed("value", "cs")
                        .hint("shuffle_hash"),
                        "src",
                    )
                    .join(
                        cand.withColumnRenamed("vertex", "dst")
                        .withColumnRenamed("value", "cd")
                        .hint("shuffle_hash"),
                        "dst",
                    )
                    .where(
                        (F.col("cs") == F.col("cd"))
                        & (pri(F.col("src")) < pri(F.col("dst")))
                    )
                    .select(F.col("src").alias("vertex"))
                    .distinct()
                )
                new_colored = truncate_plan(
                    cand.join(losers, "vertex", "left_anti")
                    .observe(obs_w, F.count(F.lit(1)).alias("c"))
                )
            else:
                nbr_max = live_e.groupBy(F.col("src").alias("vertex")).agg(
                    F.max(pri(F.col("dst"))).alias("m")
                )
                winners = (
                    active.join(nbr_max.hint("shuffle_hash"), "vertex", "left")
                    .where(
                        F.col("m").isNull() | (pri(F.col("vertex")) > F.col("m"))
                    )
                    .select("vertex")
                )
                mex = F.element_at(
                    F.filter(
                        F.sequence(F.lit(0), F.size(carr)),
                        lambda x: ~F.array_contains(carr, x),
                    ),
                    1,
                )
                new_colored = truncate_plan(
                    winners.join(forb, "vertex", "left")
                    .select("vertex", mex.cast("int").alias("value"))
                    .observe(obs_w, F.count(F.lit(1)).alias("c"))
                )
            n_won = int(obs_w.get["c"] or 0)
            prev_colored = colored
            colored = truncate_plan(colored.union(new_colored))
            prev_colored.unpersist()
            obs_a = Observation()
            new_active = truncate_plan(
                active.join(
                    new_colored.select("vertex"), "vertex", "left_anti"
                ).observe(obs_a, F.count(F.lit(1)).alias("c"))
            )
            new_live_e = truncate_plan(
                live_e.join(new_active.withColumnRenamed("vertex", "src"), "src")
                .join(new_active.withColumnRenamed("vertex", "dst"), "dst")
                .select("src", "dst")
                .repartition(p, "src")
            )
            active.unpersist()
            if live_e is not se:
                live_e.unpersist()
            new_colored.unpersist()
            active, live_e = new_active, new_live_e
            n_prev, n_active = n_active, int(obs_a.get["c"] or 0)
            rounds = r
            metrics.append(
                IterationMetrics(
                    iteration=r,
                    messages_shuffled=n_won,
                    changed=n_prev - n_active,
                    edges_scanned=n_prev,
                    seconds=time.time() - t0,
                )
            )
        else:
            converged = n_active == 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    active.unpersist()
    if live_e is not se:
        live_e.unpersist()
    se.unpersist()
    degs.unpersist()
    return GimvResult(
        state=colored, iterations=rounds, converged=converged, metrics=metrics
    )


_DEC = "decimal(38,0)"


def _moves_round(off: DataFrame, deg: DataFrame, lab: DataFrame, m_total: int) -> DataFrame:
    """One synchronous round of Louvain phase-1 local moves on the
    doubled symmetric edge list ``off`` (src, dst, w — no self rows).

    Every vertex simultaneously evaluates moving to each NEIGHBOR
    community c: the gain, scaled by M²/2 to stay integer-exact
    (decimal(38,0) — no float ordering, so a SQL oracle reproduces the
    argmax bit-for-bit), is

        score(v, a→c) = (lk_c − lk_a)·M − d_v·(cd_c − (cd_a − d_v))

    with lk_* = edge weight from v into the community, d_v the doubled
    degree (self-loops count twice — they move with v, so they cancel in
    the gain), cd_* community degree sums, M the total doubled weight.
    v moves to the highest-score community (ties → smallest label) when
    score > 0, else stays — EXCEPT singleton→singleton moves toward a
    larger label (Grappolo's swap guard: two symmetric singletons
    otherwise trade places forever under synchronous updates; directing
    the merge at the smaller label makes round 1 from singleton init
    deterministic AND productive). Plan per round: two hash joins + two
    aggregates + one window argmax — all shuffles on vertex/label keys.
    """
    comdeg = (
        lab.join(deg, "vertex")
        .groupBy("label")
        .agg(
            F.sum("d").cast(_DEC).alias("cd"),
            F.count(F.lit(1)).alias("csize"),
        )
    )
    links = (
        off.join(
            lab.withColumnRenamed("vertex", "dst").withColumnRenamed("label", "c"),
            "dst",
        )
        .groupBy(F.col("src").alias("vertex"), "c")
        .agg(F.sum("w").cast(_DEC).alias("lk"))
    )
    own = (
        lab.join(deg, "vertex")
        .join(comdeg, "label")
        .join(
            links.withColumnRenamed("c", "label").withColumnRenamed("lk", "lk_a"),
            ["vertex", "label"],
            "left",
        )
        .select(
            "vertex",
            "label",
            F.col("d").cast(_DEC).alias("dv"),
            F.col("cd").alias("cd_a"),
            F.col("csize").alias("size_a"),
            F.coalesce("lk_a", F.lit(0).cast(_DEC)).alias("lk_a"),
        )
    )
    md = F.lit(int(m_total)).cast(_DEC)
    score = (F.col("lk") - F.col("lk_a")) * md - F.col("dv") * (
        F.col("cd") - (F.col("cd_a") - F.col("dv"))
    )
    from pyspark.sql import Window

    best = (
        links.join(own, "vertex")
        .where(F.col("c") != F.col("label"))
        .join(
            comdeg.withColumnRenamed("label", "c")
            .withColumnRenamed("csize", "size_c"),
            "c",
        )
        .where(
            (F.col("size_a") > 1)
            | (F.col("size_c") > 1)
            | (F.col("c") < F.col("label"))
        )
        .select("vertex", "c", score.alias("s"))
        .where(F.col("s") > 0)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vertex").orderBy(F.desc("s"), F.asc("c"))
            ),
        )
        .where(F.col("rn") == 1)
        .select("vertex", F.col("c").alias("_new"))
    )
    return lab.join(best, "vertex", "left").select(
        "vertex", F.coalesce("_new", "label").alias("label")
    )


def modularity_local_moves(
    edges: DataFrame,
    rounds: int = 2,
    labels: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """``rounds`` synchronous Louvain local-move rounds on the simple
    undirected graph, from singleton communities (or ``labels``).
    Deterministic — the per-round recurrence is a pure function of the
    edge set with integer-exact gain comparisons, so a fixed-depth SQL
    unroll is a bit-exact oracle (the lp4 pattern). Returns
    (vertex, label) after exactly ``rounds`` rounds: the raw recurrence
    face — :func:`louvain` adds best-Q tracking and multi-level
    contraction on top. Synchronous moves may oscillate (two vertices
    swapping communities), which is why louvain() scores every round and
    keeps the argmax rather than trusting the last state.
    """
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    off = truncate_plan(
        symmetrize(
            edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
        )
        .withColumn("w", F.lit(1).cast("long"))
        .repartition(p, "src")
    )
    deg = truncate_plan(
        off.groupBy(F.col("src").alias("vertex"))
        .agg(F.sum("w").alias("d"))
        .repartition(p, "vertex")
    )
    m_total = deg.agg(F.sum("d")).first()[0] or 0
    lab = truncate_plan(
        labels.select("vertex", "label")
        if labels is not None
        else deg.select("vertex", F.col("vertex").alias("label"))
    )
    if m_total:
        for _ in range(rounds):
            new_lab = truncate_plan(_moves_round(off, deg, lab, m_total))
            lab.unpersist()
            lab = new_lab
    off.unpersist()
    deg.unpersist()
    return lab


@dataclass
class LouvainResult:
    """labels = the best-modularity assignment SEEN (argmax over every
    scored round, including the singleton baseline — Q never regresses
    by construction); history = (level, round, Q) per scored round."""

    labels: DataFrame
    modularity: float
    n_communities: int
    levels: int
    history: list[tuple[int, int, float]] = field(default_factory=list)


def louvain(
    edges: DataFrame,
    levels: int = 2,
    rounds: int = 3,
    num_partitions: int | None = None,
) -> LouvainResult:
    """Multi-level Louvain community detection, deterministic and
    synchronous: per level run ``rounds`` local-move rounds
    (:func:`_moves_round`), score EVERY round's partition on the
    ORIGINAL graph with :func:`modularity`, then contract the level's
    best partition into a weighted quotient graph (intra-community
    weight becomes a doubled self-loop feeding the coarse degrees —
    contraction preserves M) and repeat. Returns the argmax-Q labeling
    over all scored rounds plus the singleton baseline, so the result
    can only improve on both the trivial partition and any prefix of the
    schedule; synchronous-move oscillation (the classic parallel-Louvain
    failure) therefore costs rounds, never correctness.

    Scale shape: each round is joins/aggregates on (vertex|label) keys;
    each level shrinks the graph to one row per community pair; driver
    traffic is one 1-row modularity scalar per round (loop control, the
    engine-wide pattern). Levels stop early when a level moves nothing.
    """
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    simple = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    off = truncate_plan(
        symmetrize(simple).withColumn("w", F.lit(1).cast("long")).repartition(p, "src")
    )
    selfd = spark.createDataFrame([], "vertex long, sd long")
    cur_map = truncate_plan(
        off.select(F.col("src").alias("vertex")).distinct()
        .select("vertex", F.col("vertex").alias("cur"))
        .repartition(p, "vertex")
    )
    singleton = cur_map.select("vertex", F.col("vertex").alias("label"))
    best_labels = truncate_plan(singleton)
    m_total = off.agg(F.sum("w")).first()[0] or 0
    if not m_total:
        return LouvainResult(
            labels=best_labels, modularity=0.0,
            n_communities=best_labels.count(), levels=0,
            history=[(0, 0, 0.0)],
        )
    best_q = modularity(simple, singleton).first()["modularity"]
    history = [(0, 0, float(best_q))]
    levels_run = 0
    for level in range(1, levels + 1):
        deg = truncate_plan(
            off.groupBy(F.col("src").alias("vertex"))
            .agg(F.sum("w").alias("d"))
            .join(selfd, "vertex", "left")
            .select(
                "vertex",
                (F.col("d") + F.coalesce("sd", F.lit(0))).alias("d"),
            )
            .repartition(p, "vertex")
        )
        lab = truncate_plan(deg.select("vertex", F.col("vertex").alias("label")))
        level_best_q, level_best_lab = None, None
        for r in range(1, rounds + 1):
            new_lab = truncate_plan(_moves_round(off, deg, lab, m_total))
            if lab is not level_best_lab:
                lab.unpersist()
            lab = new_lab
            orig_lab = cur_map.join(
                lab.withColumnRenamed("vertex", "cur"), "cur"
            ).select("vertex", "label")
            q = modularity(simple, orig_lab).first()["modularity"]
            history.append((level, r, float(q)))
            if q > best_q:
                best_q = q
                prev = best_labels
                best_labels = truncate_plan(orig_lab)
                prev.unpersist()
            if level_best_q is None or q > level_best_q:
                level_best_q, level_best_lab = q, lab
        levels_run = level
        moved = level_best_lab.where(F.col("label") != F.col("vertex")).count()
        if moved == 0 or level == levels:
            deg.unpersist()
            lab.unpersist()
            if level_best_lab is not lab:
                level_best_lab.unpersist()
            break
        # contract the level's best partition: off-diagonal rows become
        # the coarse symmetric edges, diagonal + mapped old self-loops
        # become the coarse (doubled) self weight — M is invariant
        m = level_best_lab
        msrc = m.withColumnRenamed("vertex", "src").withColumnRenamed("label", "ls")
        mdst = m.withColumnRenamed("vertex", "dst").withColumnRenamed("label", "ld")
        off_all = truncate_plan(
            off.join(msrc, "src").join(mdst, "dst")
            .groupBy(F.col("ls").alias("src"), F.col("ld").alias("dst"))
            .agg(F.sum("w").alias("w"))
            .repartition(p, "src")
        )
        new_selfd = truncate_plan(
            off_all.where(F.col("src") == F.col("dst"))
            .select(F.col("src").alias("vertex"), F.col("w").alias("sd"))
            .union(
                selfd.join(m, "vertex").groupBy(F.col("label").alias("vertex"))
                .agg(F.sum("sd").alias("sd"))
            )
            .groupBy("vertex")
            .agg(F.sum("sd").alias("sd"))
        )
        new_off = truncate_plan(
            off_all.where(F.col("src") != F.col("dst")).repartition(p, "src")
        )
        new_map = truncate_plan(
            cur_map.join(m.withColumnRenamed("vertex", "cur"), "cur")
            .select("vertex", F.col("label").alias("cur"))
            .repartition(p, "vertex")
        )
        off.unpersist()
        off_all.unpersist()
        selfd.unpersist()
        cur_map.unpersist()
        deg.unpersist()
        lab.unpersist()
        if level_best_lab is not lab:
            level_best_lab.unpersist()
        off, selfd, cur_map = new_off, new_selfd, new_map
    off.unpersist()
    selfd.unpersist()
    cur_map.unpersist()
    n_comm = best_labels.select("label").distinct().count()
    return LouvainResult(
        labels=best_labels,
        modularity=float(best_q),
        n_communities=int(n_comm),
        levels=levels_run,
        history=history,
    )


def coreness(
    edges: DataFrame, max_rounds: int = 50, num_partitions: int | None = None
) -> GimvResult:
    """Per-vertex core number (degeneracy decomposition) by the
    distributed h-index iteration (Montresor, De Pellegrini & Miorandi,
    "Distributed k-core decomposition", 2011):

        est_0(v)   = deg(v)
        est_t+1(v) = min(est_t(v), H{est_t(u) : u ~ v})

    where H is the h-index (the largest h such that at least h neighbors
    have estimate ≥ h). Estimates are monotone non-increasing, bounded
    below by the true coreness, and the fixpoint IS the coreness — so
    a capped run is a valid upper bound and a fixed-round SQL unroll is
    a bit-exact oracle (all-integer arithmetic, order-independent
    h-index). Direction ignored, self-loops dropped; runs on the simple
    graph. Returns state (vertex, value = core number long).

    Scale shape: one state join against src-pinned edges + one
    window-sort of neighbor estimates per round (the sort key is the
    bounded per-vertex degree, not n); convergence votes ride the state
    materialization as an Observation — the GIM-V loop discipline.
    Unlike k-phase peeling (O(n) cascades on a path), rounds track how
    fast estimates settle — typically O(diameter)-ish in practice.
    """
    from pyspark.sql import Window

    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = truncate_plan(
        symmetrize(
            edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
        ).repartition(p, "src")
    )
    est = truncate_plan(
        und.groupBy(F.col("src").alias("vertex"))
        .agg(F.count(F.lit(1)).cast("long").alias("value"))
        .repartition(p, "vertex")
    )
    metrics: list[IterationMetrics] = []
    converged = False
    rounds = 0
    n_edges = und.count()
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for r in range(1, max_rounds + 1):
            t0 = time.time()
            nbr = und.join(
                est.withColumnRenamed("vertex", "dst")
                .withColumnRenamed("value", "ne")
                .hint("shuffle_hash"),
                "dst",
            ).select(F.col("src").alias("vertex"), "ne")
            ranked = nbr.withColumn(
                "rn",
                F.row_number()
                .over(Window.partitionBy("vertex").orderBy(F.desc("ne")))
                .cast("long"),
            )
            h = ranked.groupBy("vertex").agg(
                F.max(F.least(F.col("rn"), F.col("ne"))).alias("h")
            )
            obs = Observation()
            new_est = truncate_plan(
                est.join(h.hint("shuffle_hash"), "vertex")
                .select(
                    "vertex",
                    F.least(F.col("value"), F.col("h")).alias("value"),
                    (F.col("h") < F.col("value")).cast("int").alias("_chg"),
                )
                .observe(obs, F.sum("_chg").alias("c"))
                .drop("_chg")
            )
            est.unpersist()
            est = new_est
            changed = int(obs.get["c"] or 0)
            rounds = r
            metrics.append(
                IterationMetrics(
                    iteration=r,
                    messages_shuffled=n_edges,
                    changed=changed,
                    edges_scanned=n_edges,
                    seconds=time.time() - t0,
                )
            )
            if changed == 0:
                converged = True
                break
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    und.unpersist()
    return GimvResult(state=est, iterations=rounds, converged=converged, metrics=metrics)


TRIANGLE_SAMPLE_MOD = 1_000_000


def triangle_count_sampled(edges: DataFrame, sample_frac: float = 0.1) -> tuple[float, int]:
    """DOULION (Tsourakakis et al., KDD'09) approximate triangle count:
    keep each UNDIRECTED simple edge independently with probability p and
    scale the exact count of the sparsified graph by 1/p³ — an unbiased
    estimator whose variance vanishes on triangle-rich graphs while the
    wedge-join work drops by ~p² (at 100 TB: count on a 1% sample, ~10⁻⁴
    of the join cost). The sampling key is a deterministic integer mix of
    the canonical (min, max) endpoints — NOT engine randomness — so the
    estimate is a pure function of the edge set, reproducible bit-for-bit
    by a SQL oracle (the key uses only */%/+ arithmetic on purpose; a
    xxhash64 key would be stronger mixing but untestable in DuckDB).
    Returns (estimate, sampled_exact_count).
    """
    if not (0.0 < sample_frac <= 1.0):
        raise ValueError("sample_frac must be in (0, 1]")
    a = F.least(F.col("src"), F.col("dst"))
    b = F.greatest(F.col("src"), F.col("dst"))
    # Knuth multiplicative mixes on both endpoints; cast through decimal
    # to dodge ANSI long overflow at 10^10+ vertex ids
    key = F.pmod(
        a.cast("decimal(38,0)") * 2654435761 + b.cast("decimal(38,0)") * 40503,
        F.lit(TRIANGLE_SAMPLE_MOD),
    )
    cutoff = int(sample_frac * TRIANGLE_SAMPLE_MOD)
    kept = edges.where(F.col("src") != F.col("dst")).where(key < cutoff)
    t = triangle_count(kept)
    # (1/p)**3, not t/p**3: for p=0.2 the reciprocal 1/0.2 rounds to
    # exactly 5.0 so the scale is the exact 125.0 the SQL oracle uses,
    # while 0.2**3 is 0.008000000000000002
    return float(t) * (1.0 / sample_frac) ** 3, int(t)


def degree_powerlaw_alpha(
    edges: DataFrame, direction: str = "both", d_min: int = 1
) -> DataFrame:
    """Power-law exponent of the degree distribution by the
    Clauset-Shalizi-Newman continuous MLE over degrees ≥ ``d_min``:

        α = 1 + n / Σ ln(d_i / (d_min − ½)),   σ = (α − 1)/√n

    One degree aggregate + one scan — the pre-flight skew diagnostic for
    choosing the blocked engine's dense threshold (α near 2 ⇒ heavy
    hubs ⇒ the hybrid dense/sparse split pays for itself; α ≥ 3 ⇒ thin
    tail ⇒ flat plan wins; pairs with blocks.suggest_dense_threshold and
    partition_cut_stats). Exact aggregates, ln is IEEE-deterministic:
    DuckDB reproduces it (rounded to 6). Returns one row
    (n_tail, d_min, alpha, sigma).
    """
    from flexgraph_spark.graph import degrees

    deg = degrees(edges, direction)
    tail = deg.where(F.col("degree") >= d_min)
    shift = float(d_min) - 0.5
    return tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.lit(d_min).cast("int").alias("d_min"),
        F.round(
            1.0
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("degree").cast("double") / shift)),
            6,
        ).alias("alpha"),
        F.round(
            (
                F.count(F.lit(1))
                / F.sum(F.log(F.col("degree").cast("double") / shift))
            )
            / F.sqrt(F.count(F.lit(1)).cast("double")),
            6,
        ).alias("sigma"),
    )


# ---------------------------------------------------------------------------
# Minimum spanning forest: Borůvka rounds with star-contraction merging
# ---------------------------------------------------------------------------


def boruvka_msf(
    edges: DataFrame, max_rounds: int = 20, num_partitions: int | None = None
) -> GimvResult:
    """Minimum spanning forest by Borůvka rounds: every component picks its
    minimum-weight incident cross edge (total order ``(w, a, b)`` makes the
    pick — and hence the whole forest — deterministic even with tied
    weights), the picked edges hook components together, and hooked
    components contract to their minimum component id; repeat until no
    cross-component edge remains. O(log n) rounds: the component count at
    least halves each round because every surviving component hooks.

    Returns a GimvResult whose state is the forest edge set
    ``(a, b, w)`` with a < b — exactly ``n - c`` rows for a graph with
    ``n`` non-isolated vertices and ``c`` components, and (by the matroid
    exchange property) of the unique minimum total weight.

    Input is normalized to an undirected simple weighted graph: both
    orientations collapse to (least, greatest) keeping the MINIMUM weight
    among parallel edges (the only one an MSF could ever use).

    Scale notes: the per-round min-pick is one partially-aggregatable
    ``groupBy(component).min(struct)`` — map-side combine absorbs hub
    fan-in before the shuffle, the same shape as the HashMin CC superstep.
    Contraction reuses :func:`connected_components_star`'s large/small-star
    rounds on the HOOK graph only (<= one edge per component, geometrically
    shrinking), never on the full edge set. The label table is the only
    full-height state that persists across rounds; edges are re-labelled by
    two hash joins per round and the surviving cross-edge set shrinks
    monotonically. Reference parity: GIM-V min semi-ring lineage (SURVEY
    §2.2 HashMin CC), extended with the weight-carrying pick the reference
    leaves to its SSSP kernel.
    """
    if "weight" not in edges.columns:
        raise ValueError("boruvka_msf needs a 'weight' column on the edge DataFrame")
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("weight").cast("double").alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    if num_partitions:
        und = und.repartition(num_partitions, "a")
    und = truncate_plan(und)

    labels = truncate_plan(
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .distinct()
        .select("v", F.col("v").alias("c"))
    )
    forest: DataFrame | None = None
    metrics: list[IterationMetrics] = []
    converged = False
    rounds = 0
    for r in range(1, max_rounds + 1):
        t0 = time.time()
        la = labels.select(F.col("v").alias("_va"), F.col("c").alias("ca"))
        lb = labels.select(F.col("v").alias("_vb"), F.col("c").alias("cb"))
        cross = (
            und.join(la, und.a == F.col("_va"))
            .join(lb, und.b == F.col("_vb"))
            .where(F.col("ca") != F.col("cb"))
            .select("ca", "cb", "a", "b", "w")
        )
        cross = truncate_plan(cross)
        m_cross = cross.count()
        rounds = r
        if m_cross == 0:
            cross.unpersist(blocking=False)
            metrics.append(
                IterationMetrics(
                    iteration=r, messages_shuffled=0, changed=0,
                    edges_scanned=0, seconds=time.time() - t0,
                )
            )
            converged = True
            break
        incident = cross.select(
            F.col("ca").alias("comp"), F.col("cb").alias("other"), "w", "a", "b"
        ).unionAll(
            cross.select(
                F.col("cb").alias("comp"), F.col("ca").alias("other"), "w", "a", "b"
            )
        )
        picked = truncate_plan(
            incident.groupBy("comp")
            .agg(F.min(F.struct("w", "a", "b", "other")).alias("e"))
            .select("comp", "e.other", "e.w", "e.a", "e.b")
        )
        new_edges = picked.select("a", "b", "w").distinct()
        # Contraction: the pick graph is a pseudo-forest whose only cycles
        # are 2-cycles (a directed pick cycle has non-increasing edges
        # under the (w, a, b) TOTAL order, so all its edges are the same
        # edge). Resolve each 2-cycle to a root (the smaller comp id),
        # pointer-jump the #components-sized parent table to the roots in
        # O(log depth) self-joins, then relabel every tree to its MINIMUM
        # comp id — the same label contract as the recursive-reachability
        # oracle and connected_components_star, at a fraction of the cost
        # of running star contraction on the hook edges.
        pk = picked.select(F.col("comp").alias("hc"), F.col("other").alias("ho"))
        rev = pk.select(F.col("hc").alias("rc"), F.col("ho").alias("ro"))
        par = truncate_plan(
            pk.join(rev, (pk.hc == F.col("ro")) & (pk.ho == F.col("rc")), "left")
            .select(
                "hc",
                F.when(
                    F.col("rc").isNotNull() & (F.col("hc") < F.col("ho")), F.col("hc")
                ).otherwise(F.col("ho")).alias("hp"),
            )
        )
        def _psig(d):
            return d.agg(
                F.coalesce(
                    F.sum(F.xxhash64("hc", "hp").cast("decimal(38,0)")), F.lit(0)
                ).alias("h")
            ).first().h

        sig_old = _psig(par)
        for _ in range(64):  # ceil(log2(#comps)) suffices; sig-fixpoint exits
            p2 = par.select(F.col("hc").alias("_jc"), F.col("hp").alias("_jp"))
            nxt = truncate_plan(
                par.join(p2, par.hp == F.col("_jc"), "left")
                .select("hc", F.coalesce("_jp", "hp").alias("hp"))
            )
            sig_new = _psig(nxt)
            par.unpersist(blocking=False)
            par = nxt
            if sig_old == sig_new:
                break
            sig_old = sig_new
        relab = (
            par.groupBy("hp").agg(F.min("hc").alias("_mc"))
            .join(par, "hp")
            .select(F.col("hc").alias("_oc"), F.col("_mc").alias("_nc"))
        )
        labels = truncate_plan(
            labels.join(relab, labels.c == F.col("_oc"), "left")
            .select("v", F.coalesce("_nc", "c").alias("c"))
        )
        forest = new_edges if forest is None else forest.unionAll(new_edges)
        forest = truncate_plan(forest)
        n_picked = picked.count()
        cross.unpersist(blocking=False)
        picked.unpersist(blocking=False)
        metrics.append(
            IterationMetrics(
                iteration=r,
                messages_shuffled=n_picked,
                changed=n_picked,
                edges_scanned=m_cross,
                seconds=time.time() - t0,
            )
        )
    if forest is None:
        forest = und.select("a", "b", "w").limit(0)
    return GimvResult(state=forest, iterations=rounds, converged=converged, metrics=metrics)


# ---------------------------------------------------------------------------
# Densest subgraph: greedy 2(1+eps)-approximation by parallel peeling
# ---------------------------------------------------------------------------


@dataclass
class DensestResult:
    series: DataFrame          # (round, n_vertices, n_edges, density) per peel level
    members: DataFrame         # (vertex) rows of the best level's subgraph
    best_round: int
    best_density: float
    iterations: int
    converged: bool
    metrics: list[IterationMetrics] = field(default_factory=list)


def densest_subgraph(
    edges: DataFrame, threshold_mult: float = 3.0, max_rounds: int = 40
) -> DensestResult:
    """Densest-subgraph 2(1+ε)-approximation by parallel greedy peeling
    (Bahmani, Kumar & Vassilvitskii, "Densest Subgraph in Streaming and
    MapReduce", VLDB'12): repeatedly delete EVERY vertex whose degree in
    the surviving induced subgraph is <= 2(1+ε)·ρ, where ρ = |E|/|V| is
    the current density; the best level seen is within 2(1+ε) of the
    optimum and the loop ends after O(log n / log(1+ε)) rounds — each
    round removes a constant fraction of vertices, unlike sequential
    Charikar peeling's n rounds. ``threshold_mult`` IS 2(1+ε)
    (default 3.0 → ε = 0.5, ~13 rounds at n = 10³, ~40 at n = 10⁹).

    The comparison is evaluated as ``deg·n <= mult·m`` over exact
    integer-valued doubles, so the peel sequence is bit-reproducible by an
    ANSI-SQL oracle at any scale. Classic link-graph application: dense
    subgraphs of a hyperlink graph are link farms / tight communities.

    Scale notes: each round is one degree aggregation (map-side
    combinable) + one scalar agg + two semi-join filters on the shrinking
    edge set — the kcore peel shape (:func:`kcore`) with a global
    density threshold instead of a constant k. No collect beyond the
    3-scalar density row; survivors stay distributed throughout.
    """
    und = truncate_plan(
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    verts = truncate_plan(
        und.select(F.col("a").alias("v")).union(und.select(F.col("b").alias("v"))).distinct()
    )
    spark = edges.sparkSession
    series_rows: list[tuple[int, int, int, float]] = []
    best: tuple[int, float, DataFrame] | None = None  # (round, density, verts)
    metrics: list[IterationMetrics] = []
    converged = False
    rounds = 0
    for r in range(1, max_rounds + 1):
        t0 = time.time()
        stats = verts.agg(F.count("*").alias("n")).first()
        n = int(stats.n)
        if n == 0:
            converged = True
            break
        m = und.count()
        rho = m / n
        rounds = r
        series_rows.append((r, n, m, rho))
        if best is None or rho > best[1]:
            if best is not None:
                best[2].unpersist(blocking=False)
            best = (r, rho, verts)
        deg = (
            und.select(F.col("a").alias("v")).unionAll(und.select(F.col("b").alias("v")))
            .groupBy("v").agg(F.count("*").alias("deg"))
        )
        keep = truncate_plan(
            verts.join(deg, "v", "left")
            .where(
                F.coalesce("deg", F.lit(0)).cast("double") * F.lit(float(n))
                > F.lit(threshold_mult) * F.lit(float(m))
            )
            .select("v")
        )
        ka = keep.select(F.col("v").alias("_ka"))
        kb = keep.select(F.col("v").alias("_kb"))
        new_und = truncate_plan(
            und.join(ka, und.a == F.col("_ka")).join(kb, und.b == F.col("_kb"))
            .select("a", "b")
        )
        n_keep = keep.count()
        metrics.append(
            IterationMetrics(
                iteration=r,
                messages_shuffled=n_keep,
                changed=n - n_keep,
                edges_scanned=m,
                seconds=time.time() - t0,
            )
        )
        und.unpersist(blocking=False)
        if best is not None and verts is not best[2]:
            verts.unpersist(blocking=False)
        verts, und = keep, new_und
        if n_keep == 0:
            converged = True
            break
    if not series_rows:
        empty = spark.createDataFrame(
            [], "round int, n_vertices bigint, n_edges bigint, density double"
        )
        return DensestResult(
            series=empty,
            members=spark.createDataFrame([], "vertex bigint"),
            best_round=0, best_density=0.0, iterations=0,
            converged=True, metrics=metrics,
        )
    best_round, best_density, best_verts = best
    series = spark.createDataFrame(
        series_rows, "round int, n_vertices bigint, n_edges bigint, density double"
    )
    members = best_verts.select(F.col("v").alias("vertex"))
    return DensestResult(
        series=series,
        members=members,
        best_round=best_round,
        best_density=float(best_density),
        iterations=rounds,
        converged=converged,
        metrics=metrics,
    )


# ---------------------------------------------------------------------------
# node2vec second-order biased walks
# ---------------------------------------------------------------------------


def node2vec_walks(
    edges: DataFrame,
    walk_length: int = 4,
    num_walks: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    salt: str = "n2v",
) -> DataFrame:
    """Deterministic node2vec walks (Grover & Leskovec, KDD'16): step
    ``t >= 2`` picks the next neighbor x of ``cur`` with unnormalized
    weight 1/p if x == prev, 1 if the edge prev→x exists, else 1/q — the
    return / BFS / DFS bias knobs — via inverse-CDF sampling at
    u = sha256(salt:start:walk:t)·2⁻³² over the dst-ordered cumulative
    weights. No RNG state: reruns, stragglers and an ANSI-SQL oracle
    replay every pick bit-exactly (the cumulative sums are evaluated in
    the same dst order on both engines, so every IEEE comparison
    matches). Step 1 initializes prev = start, which makes every
    candidate "adjacent to prev" and so degenerates to the uniform pick —
    node2vec's uniform first step through the same code path.

    Returns (start, walk_id, step, vertex), step 0..walk_length; sink
    vertices absorb the walk.

    Scale shape: per step, one join frontier⋈adjacency keyed on the
    current vertex (hot vertices fan out only by resident walk mass), one
    broadcast-free left join flagging prev-adjacency keyed on (prev, dst),
    and one (start, walk_id)-partitioned window cumsum whose partition
    height is deg(cur) — never a collected neighbor array. Lineage is
    truncated every step: the output union re-executes each step's
    snapshot, so an un-truncated chain costs O(steps²)."""
    from pyspark.sql import Window

    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct()
    adj = e.select(
        F.col("src").alias("e_src"), F.col("dst").alias("e_dst"), F.lit(1).alias("e_hit")
    ).persist()
    pos = e.select(F.col("src").alias("p_src"), F.col("dst").alias("p_dst")).persist()
    verts = e.select(F.col("src").alias("v")).union(
        e.select(F.col("dst").alias("v"))
    ).distinct()
    frontier = verts.crossJoin(
        spark.range(num_walks).select(F.col("id").alias("walk_id"))
    ).select(
        F.col("v").alias("start"), "walk_id",
        F.col("v").alias("prev"), F.col("v").alias("cur"),
    )
    out = frontier.select(
        "start", "walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex")
    )
    for step in range(1, walk_length + 1):
        h = F.conv(
            F.substring(
                F.sha2(
                    F.concat_ws(
                        ":", F.lit(salt), F.col("start"), F.col("walk_id"),
                        F.lit(str(step)),
                    ),
                    256,
                ),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        u = h.cast("double") / F.lit(4294967296.0)
        cand = (
            frontier.join(pos, frontier.cur == F.col("p_src"))
            .join(
                adj,
                (F.col("prev") == F.col("e_src")) & (F.col("p_dst") == F.col("e_dst")),
                "left",
            )
            .withColumn(
                "_w",
                F.when(F.col("p_dst") == F.col("prev"), F.lit(1.0 / p))
                .when(F.col("e_hit").isNotNull(), F.lit(1.0))
                .otherwise(F.lit(1.0 / q)),
            )
        )
        wcum = (
            Window.partitionBy("start", "walk_id")
            .orderBy("p_dst")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wtot = Window.partitionBy("start", "walk_id")
        cand = cand.withColumn("_cum", F.sum("_w").over(wcum)).withColumn(
            "_tgt", u * F.sum("_w").over(wtot)
        )
        picked = cand.where(
            (F.col("_cum") > F.col("_tgt")) & (F.col("_cum") - F.col("_w") <= F.col("_tgt"))
        ).select("start", "walk_id", F.col("p_dst").alias("_nxt"))
        stepped = (
            frontier.join(picked, ["start", "walk_id"], "left")
            .select(
                "start", "walk_id",
                F.col("cur").alias("prev"),
                F.coalesce("_nxt", "cur").alias("cur"),
            )
        )
        # truncate EVERY step: the output union re-executes each step's
        # snapshot, so an un-truncated chain costs O(steps²) work (measured
        # 8.8/9.9/29.4 s for L=1/2/3 at sf0.1 before; linear after). The
        # frontier is only n_vertices × num_walks rows — cheap to pin.
        frontier = truncate_plan(stepped)
        out = out.union(
            frontier.select(
                "start", "walk_id", F.lit(step).alias("step"),
                F.col("cur").alias("vertex"),
            )
        )
    return out


def effective_diameter_exact(
    edges: DataFrame, max_h: int, ratio: float = 0.9,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact effective diameter: the linearly-interpolated smallest h with
    N(h) >= ratio·N(max_h), computed from the EXACT neighborhood function
    (:func:`neighborhood_function`) with the identical interpolation the
    HADI sketch path uses (:func:`hadi`) — its oracle-gated face. Returns
    a 1-row DataFrame (eff_diameter double, rounded 6). The interpolation
    runs on the collected (max_h + 1)-row series — driver-side on purpose;
    the distributed work is the pair-BFS underneath."""
    nf = neighborhood_function(edges, max_h, num_partitions=num_partitions)
    series = sorted((r.h, r.n_pairs) for r in nf.collect())
    nmax = series[-1][1]
    eff = float(series[-1][0])
    for (h0, a), (h1, b) in zip(series, series[1:]):
        if b >= ratio * nmax:
            eff = h0 + (ratio * nmax - a) / (b - a) if b > a else float(h1)
            break
    if series[0][1] >= ratio * nmax:
        eff = 0.0
    spark = edges.sparkSession
    return spark.createDataFrame([(eff,)], "eff_diameter double").select(
        F.round("eff_diameter", 6).alias("eff_diameter")
    )


# ---------------------------------------------------------------------------
# Directed motif census: dyads + the 16 Holland–Leinhardt triad types
# ---------------------------------------------------------------------------

#: Triad type names in igraph/statnet order (MAN labels: counts of
#: Mutual / Asymmetric / Null dyads, with D(own)/U(p)/C(yclic)/T(ransitive)
#: disambiguation for the mixed classes).
TRIAD_TYPES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]


def _pair_states(edges: DataFrame) -> DataFrame:
    """Canonical dyad table of a directed simple graph: one row per
    *connected* unordered pair with columns (a < b, state) where

        state = 1  → a→b only      2  → b→a only      3  → mutual

    Self-loops are dropped, parallel edges collapse. One distinct + one
    groupBy on the (a, b) pair key — a uniform two-column shuffle; hub
    skew never concentrates on a single key because the key is the pair,
    not the hub vertex."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    return (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.when(F.col("src") < F.col("dst"), F.lit(1)).otherwise(F.lit(2)).alias("bit"),
        )
        .groupBy("a", "b")
        .agg(
            (
                F.max(F.when(F.col("bit") == 1, 1).otherwise(0))
                + 2 * F.max(F.when(F.col("bit") == 2, 1).otherwise(0))
            ).alias("state")
        )
    )


def dyad_census(edges: DataFrame) -> DataFrame:
    """Holland–Leinhardt dyad census: one row
    (n_vertices, mutual, asym, null_dyads).

    ``null_dyads = C(n,2) − M − A`` is emitted as decimal(38,0): at the
    10^12-vertex target scale the null count (~5·10^23) overflows int64,
    so the closed-form class is decimal end-to-end (M and A are bounded
    by the edge count and stay long). The vertex universe is src ∪ dst of
    *all* edges — a self-loop-only vertex still counts (its dyads are all
    null), mirroring :func:`triad_census`."""
    n = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    pair_total = n * (n - 1) // 2  # exact python int — never overflows
    return _pair_states(edges).agg(
        F.lit(n).cast("long").alias("n_vertices"),
        F.coalesce(F.sum(F.when(F.col("state") == 3, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("mutual"),
        F.coalesce(F.sum(F.when(F.col("state") != 3, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("asym"),
        (
            F.lit(str(pair_total)).cast("decimal(38,0)")
            - F.coalesce(F.sum(F.lit(1)), F.lit(0))
        )
        .cast("decimal(38,0)")
        .alias("null_dyads"),
    )


def _rel_col(state_col: str, at_min: bool):
    """Dyad state relative to one endpoint: 'o' = out-edge only, 'i' =
    in-edge only, 'm' = mutual. ``at_min`` says whether the endpoint is
    the pair's lower id (state 1 encodes min→max)."""
    s = F.col(state_col)
    if at_min:
        return F.when(s == 3, F.lit("m")).when(s == 1, F.lit("o")).otherwise(F.lit("i"))
    return F.when(s == 3, F.lit("m")).when(s == 1, F.lit("i")).otherwise(F.lit("o"))


def _wedge_cls(d1, d2):
    """Triad type of a 2-connected-dyad triple from the two dyad states
    relative to the shared (center) vertex — igraph conventions:
    out+out = 021D (A←B→C), in+in = 021U, out+in = 021C (path),
    mutual+mutual = 201, mutual+in = 111D (A↔B←C), mutual+out = 111U."""
    key = F.concat(F.least(d1, d2), F.greatest(d1, d2))
    return (
        F.when(key == "ii", F.lit("021U"))
        .when(key == "im", F.lit("111D"))
        .when(key == "io", F.lit("021C"))
        .when(key == "mm", F.lit("201"))
        .when(key == "mo", F.lit("111U"))
        .otherwise(F.lit("021D"))
    )


def triad_census(edges: DataFrame) -> DataFrame:
    """Full 16-type directed triad census (Holland–Leinhardt MAN classes,
    igraph/statnet-compatible definitions) over the simple digraph:
    16 rows (triad_type string, n decimal(38,0)), one per
    :data:`TRIAD_TYPES` entry, zeros included.

    Scalable decomposition (never materializes V³ triples or even the
    wedge set):

    * the 7 triangle classes (030T/030C/120D/120U/120C/210/300) classify
      each distinct triangle from the degree-oriented enumeration
      (:func:`_oriented_triangles` — hub-skew-safe) joined to its three
      dyad states;
    * the 6 two-dyad classes (021D/021U/021C/111D/111U/201) are counted
      combinatorially per center vertex from its (out-only, in-only,
      mutual) incident-dyad counts — a hub with 10^8 neighbors
      contributes C(10^8, 2) as one decimal, not 10^15 wedge rows — then
      the three wedges inside every triangle are subtracted;
    * the 1-dyad classes (012/102) use inclusion–exclusion per connected
      pair: (n−2) − (deg(a)−1) − (deg(b)−1) + |N(a)∩N(b)|, with the
      common-neighbor count read off the triangle set;
    * 003 is the residual against C(n,3).

    All closed-form tallies run in decimal(38,0) — at 10^12 vertices
    C(n,3) ≈ 1.7·10^35 overflows int64 by 17 orders of magnitude.
    Self-loops are ignored for dyads but their vertices stay in the
    universe. Exactness is pytest-verified against an independent
    brute-force classifier on random digraphs (hubs, mutuals, loops)."""
    spark = edges.sparkSession
    P = _pair_states(edges).persist()
    n = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )

    # per-vertex incident-dyad profile (p = out-only, q = in-only, m = mutual)
    rels = P.select(F.col("a").alias("v"), _rel_col("state", True).alias("r")).unionAll(
        P.select(F.col("b").alias("v"), _rel_col("state", False).alias("r"))
    )
    pqm = rels.groupBy("v").agg(
        F.sum(F.when(F.col("r") == "o", 1).otherwise(0)).alias("p"),
        F.sum(F.when(F.col("r") == "i", 1).otherwise(0)).alias("q"),
        F.sum(F.when(F.col("r") == "m", 1).otherwise(0)).alias("m"),
    )

    # ≥2-dyad wedge totals, combinatorial per center (decimal: hub-safe)
    def _c2(c: str):
        return F.expr(
            f"CAST(CAST({c} AS DECIMAL(18,0)) * (CAST({c} AS DECIMAL(18,0)) - 1) / 2 "
            "AS DECIMAL(38,0))"
        )

    def _prod(x: str, y: str):
        return F.expr(
            f"CAST(CAST({x} AS DECIMAL(18,0)) * CAST({y} AS DECIMAL(18,0)) "
            "AS DECIMAL(38,0))"
        )

    wtot = pqm.agg(
        F.sum(_c2("p")).alias("w021D"),
        F.sum(_c2("q")).alias("w021U"),
        F.sum(_prod("p", "q")).alias("w021C"),
        F.sum(_c2("m")).alias("w201"),
        F.sum(_prod("m", "q")).alias("w111D"),
        F.sum(_prod("m", "p")).alias("w111U"),
    )

    # distinct triangles with their three dyad states (x < y < z)
    oriented, closed, _deg = _oriented_triangles(edges, und=P.select("a", "b"))
    tri3 = closed.select(F.array_sort(F.array("u", "w1", "w2")).alias("t")).select(
        F.col("t")[0].alias("x"), F.col("t")[1].alias("y"), F.col("t")[2].alias("z")
    )
    tri = (
        tri3.join(
            P.select(F.col("a").alias("x"), F.col("b").alias("y"), F.col("state").alias("sxy")),
            ["x", "y"],
        )
        .join(
            P.select(F.col("a").alias("x"), F.col("b").alias("z"), F.col("state").alias("sxz")),
            ["x", "z"],
        )
        .join(
            P.select(F.col("a").alias("y"), F.col("b").alias("z"), F.col("state").alias("syz")),
            ["y", "z"],
        )
        .persist()
    )

    s = F.col
    mcnt = (
        (s("sxy") == 3).cast("int") + (s("sxz") == 3).cast("int") + (s("syz") == 3).cast("int")
    )
    # m == 1: out-degree of the non-mutual vertex toward the mutual pair
    outs = (
        F.when(s("sxy") == 3, (s("sxz") == 2).cast("int") + (s("syz") == 2).cast("int"))
        .when(s("sxz") == 3, (s("sxy") == 2).cast("int") + (s("syz") == 1).cast("int"))
        .otherwise((s("sxy") == 1).cast("int") + (s("sxz") == 1).cast("int"))
    )
    cyc = ((s("sxy") == 1) & (s("syz") == 1) & (s("sxz") == 2)) | (
        (s("sxy") == 2) & (s("syz") == 2) & (s("sxz") == 1)
    )
    tri_cls = (
        F.when(mcnt == 3, F.lit("300"))
        .when(mcnt == 2, F.lit("210"))
        .when(
            mcnt == 1,
            F.when(outs == 2, F.lit("120D")).when(outs == 0, F.lit("120U")).otherwise(F.lit("120C")),
        )
        .otherwise(F.when(cyc, F.lit("030C")).otherwise(F.lit("030T")))
    )
    tri_counts = (
        tri.select(tri_cls.alias("triad_type"))
        .groupBy("triad_type")
        .agg(F.count("*").cast("decimal(38,0)").alias("n"))
    )

    # the 3 wedges inside every triangle, to subtract from the ≥2 totals
    tw = (
        tri.select(
            F.explode(
                F.array(
                    _wedge_cls(_rel_col("sxy", True), _rel_col("sxz", True)),    # center x
                    _wedge_cls(_rel_col("sxy", False), _rel_col("syz", True)),   # center y
                    _wedge_cls(_rel_col("sxz", False), _rel_col("syz", False)),  # center z
                )
            ).alias("triad_type")
        )
        .groupBy("triad_type")
        .agg(F.count("*").cast("decimal(38,0)").alias("tn"))
    )
    ex2 = (
        wtot.select(
            F.expr(
                "stack(6, '021D', w021D, '021U', w021U, '021C', w021C, "
                "'201', w201, '111D', w111D, '111U', w111U) AS (triad_type, wn)"
            )
        )
        .join(tw, "triad_type", "left")
        .select(
            "triad_type",
            (F.coalesce("wn", F.lit(0)) - F.coalesce("tn", F.lit(0)))
            .cast("decimal(38,0)")
            .alias("n"),
        )
    )

    # exactly-1-dyad classes via inclusion–exclusion per connected pair
    cn = (
        tri.select(
            F.explode(
                F.array(
                    F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                    F.struct(F.col("x").alias("a"), F.col("z").alias("b")),
                    F.struct(F.col("y").alias("a"), F.col("z").alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("cn"))
    )
    deg = pqm.select("v", (F.col("p") + F.col("q") + F.col("m")).alias("d"))
    e1 = (
        P.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
        .join(cn, ["a", "b"], "left")
        .select(
            "state",
            (
                F.lit(n - 2).cast("decimal(18,0)")
                - (F.col("da") - 1)
                - (F.col("db") - 1)
                + F.coalesce("cn", F.lit(0))
            ).alias("e1"),
        )
    )
    ex1 = e1.agg(
        F.coalesce(F.sum(F.when(F.col("state") == 3, F.col("e1"))), F.lit(0))
        .cast("decimal(38,0)")
        .alias("n102"),
        F.coalesce(F.sum(F.when(F.col("state") != 3, F.col("e1"))), F.lit(0))
        .cast("decimal(38,0)")
        .alias("n012"),
    )
    ex1_rows = ex1.select(
        F.expr("stack(2, '102', n102, '012', n012) AS (triad_type, n)")
    ).select("triad_type", F.col("n").cast("decimal(38,0)").alias("n"))

    rows15 = tri_counts.unionAll(ex2).unionAll(ex1_rows)
    comb3 = n * (n - 1) * (n - 2) // 6  # exact python int
    r003 = rows15.agg(
        (
            F.lit(str(comb3)).cast("decimal(38,0)")
            - F.coalesce(F.sum("n"), F.lit(0))
        )
        .cast("decimal(38,0)")
        .alias("n")
    ).select(F.lit("003").alias("triad_type"), "n")

    classes = spark.createDataFrame([(t,) for t in TRIAD_TYPES], "triad_type string")
    out = classes.join(rows15.unionAll(r003), "triad_type", "left").select(
        "triad_type", F.coalesce("n", F.lit(0)).cast("decimal(38,0)").alias("n")
    )
    from flexgraph_spark.textops import _materialize

    out = _materialize(out)
    tri.unpersist()
    oriented.unpersist()
    P.unpersist()
    return out


# ---------------------------------------------------------------------------
# SlashBurn hub-removal ordering (Kang & Faloutsos, ICDM 2011)
# ---------------------------------------------------------------------------

def slashburn(
    edges: DataFrame,
    k: int = 2,
    max_rounds: int = 30,
    num_partitions: int | None = None,
    cc_max_iter: int = 100,
) -> GimvResult:
    """SlashBurn vertex ordering for power-law graphs (Kang & Faloutsos,
    ICDM 2011): alternately slash the ``k`` highest-degree hubs to the
    FRONT of the permutation and burn the resulting non-giant components
    ("spokes") to the BACK, recursing on the giant connected component.
    The ordering concentrates nonzeros of the adjacency matrix into a few
    dense blocks — exactly what the blocked CSR engine's dense/sparse
    classifier (blocks.py) wants — and ``k * rounds / n`` (the wing-width
    ratio) measures how hub-compressible the graph is.

    Deterministic conventions (the DuckDB oracle replays them verbatim):

    * hubs: top ``min(k, |cur|)`` of the CURRENT induced subgraph by
      (degree DESC, vertex ASC); front positions in that order;
    * components of the remainder: HashMin labels (singletons keep their
      own id); the giant component is (size DESC, label ASC)-first;
    * spokes: every non-giant vertex this round; back positions ascending
      in (component size DESC, label ASC, vertex ASC) order — larger
      spoke components land nearer the unassigned middle;
    * if ``max_rounds`` runs out first, the residual giant component takes
      the remaining middle positions in vertex-ASC order (role 'gcc',
      round = rounds + 1), so a capped run is still a total permutation
      and oracle-comparable at any scale factor.

    Per round: one induced-degree aggregate, one CC run on the shrinking
    remainder (the repo's gated HashMin engine — frontier messaging makes
    the convergent tail cheap), and one global sort of this round's spokes
    (positions are a total order; the sort is over the spoke set only,
    which shrinks geometrically on hub-compressible graphs). Hubs are
    never collected to the driver — the k-row top-k stays a DataFrame.
    Self-loops are ignored for degrees/components but their vertices stay
    in the universe. Returns state = (vertex, position, round, role) with
    iterations = hub rounds and per-round metrics (changed = vertices
    assigned, messages_shuffled = spokes burned, edges_scanned = induced
    edge count entering the round).
    """
    from pyspark.sql import Window

    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = (
        symmetrize(edges.filter(F.col("src") != F.col("dst")).select("src", "dst"))
        .repartition(p, "src")
        .persist()
    )
    cur = truncate_plan(
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .repartition(p, "vertex")
    )
    n = cur.count()
    f, b = 0, n
    n_cur = n
    parts: list[DataFrame] = []
    metrics: list[IterationMetrics] = []
    rounds = 0
    converged = False

    def _assign(df, order_cols, base, round_no, role):
        w = Window.orderBy(*order_cols)
        return df.select(
            "vertex",
            (F.lit(base) + F.row_number().over(w) - 1).cast("long").alias("position"),
            F.lit(round_no).cast("long").alias("round"),
            F.lit(role).alias("role"),
        )

    while rounds < max_rounds and n_cur > 0:
        rounds += 1
        t0 = time.time()
        ind = (
            und.join(cur.withColumnRenamed("vertex", "src").hint("shuffle_hash"), "src")
            .join(cur.withColumnRenamed("vertex", "dst").hint("shuffle_hash"), "dst")
            .persist()
        )
        ind_edges = ind.count()
        deg = cur.join(
            ind.groupBy(F.col("src").alias("vertex")).agg(F.count("*").alias("d")),
            "vertex",
            "left",
        ).select("vertex", F.coalesce("d", F.lit(0)).alias("d"))
        h = min(k, n_cur)
        hubs = deg.orderBy(F.col("d").desc(), "vertex").limit(h).persist()
        parts.append(
            _assign(hubs, [F.col("d").desc(), F.col("vertex")], f, rounds, "hub")
        )
        f += h
        n_rem = n_cur - h
        if n_rem == 0:
            metrics.append(
                IterationMetrics(
                    iteration=rounds, messages_shuffled=0, changed=h,
                    edges_scanned=ind_edges, seconds=time.time() - t0,
                )
            )
            ind.unpersist()
            n_cur = 0
            converged = True
            break
        rem = truncate_plan(
            cur.join(hubs.select("vertex"), "vertex", "left_anti").repartition(
                p, "vertex"
            )
        )
        hub_v = hubs.select("vertex")
        ind2 = ind.join(
            hub_v.withColumnRenamed("vertex", "src"), "src", "left_anti"
        ).join(hub_v.withColumnRenamed("vertex", "dst"), "dst", "left_anti")
        cc = connected_components(ind2, max_iter=cc_max_iter)
        labels = truncate_plan(
            rem.join(cc.state, "vertex", "left").select(
                "vertex",
                F.coalesce(F.col("value").cast("long"), F.col("vertex")).alias("label"),
            )
        )
        sizes = labels.groupBy("label").agg(F.count("*").alias("size"))
        top = sizes.orderBy(F.col("size").desc(), "label").limit(1).collect()[0]
        gcc_label, g = int(top["label"]), int(top["size"])
        s = n_rem - g
        if s:
            spokes = labels.filter(F.col("label") != gcc_label).join(sizes, "label")
            parts.append(
                _assign(
                    spokes,
                    [F.col("size").desc(), F.col("label"), F.col("vertex")],
                    b - s,
                    rounds,
                    "spoke",
                )
            )
            b -= s
        metrics.append(
            IterationMetrics(
                iteration=rounds, messages_shuffled=s, changed=h + s,
                edges_scanned=ind_edges, seconds=time.time() - t0,
            )
        )
        old_cur = cur
        cur = truncate_plan(
            labels.filter(F.col("label") == gcc_label)
            .select("vertex")
            .repartition(p, "vertex")
        )
        n_cur = g
        old_cur.unpersist()
        hubs.unpersist()
        ind.unpersist()

    if n_cur > 0:
        parts.append(_assign(cur, [F.col("vertex")], f, rounds + 1, "gcc"))
    und.unpersist()
    state = parts[0]
    for part in parts[1:]:
        state = state.unionAll(part)
    return GimvResult(
        state=state, iterations=rounds, converged=converged, metrics=metrics
    )


def oddball_scores(edges: DataFrame) -> DataFrame:
    """OddBall ego-net anomaly scores (Akoglu, Chau, Kang & Faloutsos,
    PAKDD 2010 — the PEGASUS-lab anomaly detector): for each vertex the
    egonet has ``n_i = d(v) + 1`` nodes and ``e_i = d(v) + T(v)`` edges
    (every edge between two neighbors closes a triangle through v, so the
    egonet edge count needs no second join — it reads off the
    degree-oriented triangle plan via :func:`local_clustering`). Fit the
    Ego-net Density Power Law ``e ≈ C·n^θ`` by least squares in log-log
    space over all vertices, then score each vertex with the paper's
    out-of-line measure

        score = max(e, C·n^θ)/min(e, C·n^θ) · ln(|e − C·n^θ| + 1)

    High scores flag near-cliques (θ→2 outliers upward) and near-stars
    (downward) — link-farm / spam-hub shapes on a hyperlink graph.

    One triangle plan + one 6-aggregate fit row broadcast back over the
    vertex table: no per-vertex Python, no extra shuffle beyond the
    triangle plan itself. Degenerate regular graphs (zero variance in
    log n) fall back to θ = 0, C = geometric-mean(e). Returns
    (vertex, n_i long, e_i long, score double)."""
    base = local_clustering(edges).select(
        "vertex",
        (F.col("degree") + 1).cast("long").alias("n_i"),
        (F.col("degree") + F.col("triangles")).cast("long").alias("e_i"),
    )
    pts = base.select(
        "vertex", "n_i", "e_i",
        F.log(F.col("n_i").cast("double")).alias("x"),
        F.log(F.col("e_i").cast("double")).alias("y"),
    )
    fit = pts.agg(
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
    ).select(
        F.when(
            F.col("mxx") - F.col("mx") * F.col("mx") > 0.0,
            (F.col("mxy") - F.col("mx") * F.col("my"))
            / (F.col("mxx") - F.col("mx") * F.col("mx")),
        )
        .otherwise(F.lit(0.0))
        .alias("theta"),
        F.col("mx").alias("mx"),
        F.col("my").alias("my"),
    ).select(
        "theta", (F.col("my") - F.col("theta") * F.col("mx")).alias("lnC")
    )
    f = F.exp(F.col("lnC") + F.col("theta") * F.col("x"))
    e = F.col("e_i").cast("double")
    return pts.crossJoin(F.broadcast(fit)).select(
        "vertex",
        "n_i",
        "e_i",
        (
            F.greatest(e, f) / F.least(e, f)
            * F.log(F.abs(e - f) + F.lit(1.0))
        ).alias("score"),
    )


def effective_radius_exact(
    edges: DataFrame,
    max_h: int,
    ratio_num: int = 9,
    ratio_den: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT per-vertex effective radius (PEGASUS HADI radius semantics,
    Kang et al.): the smallest h with |N_h(v)| >= ratio * |N_max_h(v)|,
    where N_h(v) is the set of vertices within OUT-distance h (self
    included at h = 0). The ratio test runs in INTEGERS —
    ``ratio_den * cnt_h >= ratio_num * cnt_H`` — so there is no float
    drift anywhere and the DuckDB oracle replays it exactly.

    Validation-scale face (like :func:`neighborhood_function`, whose
    pair-set recurrence it shares): materializes reachable PAIRS, which a
    100 TB graph cannot afford — the scale path is :func:`hadi` with
    ``with_radius=True`` (O(V) HLL state, same recurrence on sketches).
    This face exists to oracle-gate that path. Returns
    (vertex, n_reach long, eff_radius long)."""
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select(F.col("src").alias("via"), F.col("dst").alias("u"))
        .distinct()
        .repartition(p, "via")
        .persist()
    )
    e.count()
    pairs = truncate_plan(
        e.select(F.col("via").alias("v"), F.col("via").alias("u"))
        .union(e.select(F.col("u").alias("v"), F.col("u").alias("u")))
        .distinct()
        .repartition(p, "u")
    )
    counts = [pairs.groupBy("v").agg(F.count("*").alias("c")).withColumn(
        "h", F.lit(0)
    )]
    # each counts[h] plan references the h-level pair set lazily, so the
    # intermediate levels stay persisted until the final result is
    # materialized (unlike neighborhood_function, which counts eagerly)
    levels = [pairs]
    for h in range(1, max_h + 1):
        hop = (
            pairs.withColumnRenamed("u", "via")
            .join(e.hint("shuffle_hash"), "via")
            .select("v", "u")
        )
        pairs = truncate_plan(pairs.union(hop).distinct().repartition(p, "u"))
        levels.append(pairs)
        counts.append(
            pairs.groupBy("v").agg(F.count("*").alias("c")).withColumn("h", F.lit(h))
        )
    allc = counts[0]
    for c in counts[1:]:
        allc = allc.unionAll(c)
    final = pairs.groupBy("v").agg(F.count("*").alias("cH"))
    out = (
        allc.join(final, "v")
        .filter(F.lit(ratio_den) * F.col("c") >= F.lit(ratio_num) * F.col("cH"))
        .groupBy("v")
        .agg(F.min("h").alias("eff_radius"), F.max("cH").alias("n_reach"))
        .select(
            F.col("v").alias("vertex"),
            F.col("n_reach").cast("long").alias("n_reach"),
            F.col("eff_radius").cast("long").alias("eff_radius"),
        )
    )
    from flexgraph_spark.textops import _materialize

    out = _materialize(out)
    for lv in levels:
        lv.unpersist()
    e.unpersist()
    return out


def bipartite_check(
    edges: DataFrame,
    max_iter: int = 50,
    num_partitions: int | None = None,
    **kw,
) -> DataFrame:
    """Per-component bipartiteness (odd-cycle detection): run
    :class:`flexgraph_spark.gimv.RootedBFS` on the symmetrized graph —
    one CC-cost GIM-V fixpoint yields (component root, BFS distance) per
    vertex — then a component is bipartite iff NO undirected edge joins
    two vertices of equal distance parity (BFS layering theorem). The
    check is one join of the distinct undirected edge set against the
    state plus one per-root aggregate; everything is integer, so the SQL
    oracle replays the encoded recurrence bit-for-bit.

    The direction expansion is forced (bipartiteness is a property of the
    underlying undirected graph); weights are dropped. Returns one row per
    component: (root, n_vertices, n_edges, odd_edges, is_bipartite int).
    """
    und = symmetrize(edges.select("src", "dst"))
    res = gimv.run(
        und,
        gimv.RootedBFS(),
        max_iter=max_iter,
        num_partitions=num_partitions,
        **kw,
    )
    st = res.state.select(
        "vertex",
        F.col("value").getField("root").alias("root"),
        (F.col("value").getField("dist") % 2).alias("par"),
    )
    ue = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    j = (
        ue.join(
            st.select(
                F.col("vertex").alias("a"),
                F.col("root").alias("root"),
                F.col("par").alias("pa"),
            ),
            "a",
        )
        .join(
            st.select(F.col("vertex").alias("b"), F.col("par").alias("pb")), "b"
        )
        .groupBy("root")
        .agg(
            F.count("*").alias("n_edges"),
            F.sum((F.col("pa") == F.col("pb")).cast("long")).alias("odd_edges"),
        )
    )
    nv = st.groupBy("root").agg(F.count("*").alias("n_vertices"))
    return nv.join(j, "root", "left").select(
        F.col("root").cast("long").alias("root"),
        F.col("n_vertices").cast("long").alias("n_vertices"),
        F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
        F.coalesce("odd_edges", F.lit(0)).cast("long").alias("odd_edges"),
        (F.coalesce("odd_edges", F.lit(0)) == 0).cast("int").alias("is_bipartite"),
    )


def simrank(
    edges: DataFrame,
    queries: list[int],
    walk_length: int = 5,
    num_runs: int = 8,
    c: float = 0.6,
    salt: str = "simrank",
    topk: int | None = None,
) -> DataFrame:
    """Monte-Carlo SimRank (Jeh & Widom, KDD 2002) for a query set, via
    Fogaras-Racz coupled reverse-walk fingerprints (WWW 2005, "Scaling
    link-based similarity search"): s(a, b) = E[c^tau] where tau is the
    FIRST MEETING step of the reverse random walks started at a and b.
    One walk per (vertex, run) serves every pair containing that vertex —
    the fingerprint trick that makes SimRank linear in V instead of the
    O(V^2) pair-state of the naive iteration.

    Determinism: step t of any walk sitting at vertex u in run r moves to
    the in-neighbor at index ``sha256(salt:r:u:t) mod in_degree(u)`` in
    src-sorted in-adjacency order. Keying the hash by the CURRENT vertex
    (not the start — contrast :func:`random_walks`) makes two walks that
    occupy the same vertex at the same step take identical hops forever:
    exactly the Fogaras-Racz pairwise coupling, which preserves each
    pair's first-meeting-time law while collapsing the post-meeting
    trajectories (and making "met once" == "together at every later
    step", so min(step) is the true tau). No RNG state, so stragglers /
    retries / reruns emit identical walks and an ANSI-SQL oracle replays
    the estimate bit-for-bit.

    Semantics: a walk at a vertex with NO in-edges terminates (the
    recurrence has I(a) empty => s(a, .) = 0, so freezing there would
    inflate scores); pairs that never meet within ``walk_length``
    contribute 0 for that run — the standard truncation, biased low by at
    most c^(walk_length+1). c^tau is folded in via PRE-COMPUTED literal
    weights (array lookup by tau), not pow(), so Spark and the oracle use
    bit-identical doubles. Returns (a, b, simrank) for a in ``queries``,
    b != a, simrank = round(mean over runs of c^tau, 6) > 0; ``topk``
    keeps the top-k per query by (simrank desc, b).

    Scale shape: the walk table is V x runs x length rows built with two
    hash joins per step (frontier keyed by the current vertex, like
    :func:`random_walks` — no collected adjacency anywhere); the meeting
    join is keyed by (run, step, vertex), so hot vertices skew only in
    proportion to the walk mass actually sitting on them, and the
    query-side filter bounds the output at |Q| x V. At 100 TB the whole
    plan is three shuffles wide and never materializes a pair state.
    """
    if not queries:
        raise ValueError("simrank needs at least one query vertex")
    if not 0.0 < c < 1.0:
        raise ValueError("simrank decay c must sit in (0, 1)")
    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct()
    # reverse-walk adjacency: in-neighbors of u, src-sorted positions
    from pyspark.sql import Window

    rev = e.select(F.col("dst").alias("u"), F.col("src").alias("nbr"))
    pos = rev.withColumn(
        "idx", F.row_number().over(Window.partitionBy("u").orderBy("nbr")) - 1
    ).select(F.col("u").alias("p_u"), "idx", F.col("nbr").alias("p_nbr"))
    deg = rev.groupBy("u").agg(F.count("*").alias("ideg")).select(
        F.col("u").alias("d_u"), "ideg"
    )
    pos = pos.persist()
    deg = deg.persist()

    verts = e.select(F.col("src").alias("v")).union(
        e.select(F.col("dst").alias("v"))
    ).distinct()
    frontier = verts.crossJoin(
        spark.range(num_runs).select(F.col("id").alias("run"))
    ).select(F.col("v").alias("start"), "run", F.col("v").alias("cur"))

    trace = None
    for step in range(1, walk_length + 1):
        h = F.conv(
            F.substring(
                F.sha2(
                    F.concat_ws(
                        ":", F.lit(salt), F.col("run"), F.col("cur"),
                        F.lit(str(step)),
                    ),
                    256,
                ),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        # inner joins: walks at in-degree-0 vertices TERMINATE here
        frontier = (
            frontier.join(deg, frontier.cur == deg.d_u)
            .withColumn("_pick", h % F.col("ideg"))
            .join(
                pos,
                (F.col("cur") == F.col("p_u")) & (F.col("_pick") == F.col("idx")),
            )
            .select("start", "run", F.col("p_nbr").alias("cur"))
        )
        if step % 8 == 0:
            frontier = truncate_plan(frontier)
        stepped = frontier.select(
            "start", "run", F.lit(step).alias("step"), F.col("cur").alias("pos")
        )
        trace = stepped if trace is None else trace.union(stepped)

    # the meeting join reads the trace TWICE (query side + all side):
    # persist, or the full 2L-join walk chain recomputes per side
    trace = trace.persist()
    qt = (
        trace.filter(F.col("start").isin([int(q) for q in queries]))
        .select(
            F.col("start").alias("a"), "run", "step", "pos"
        )
    )
    bt = trace.select(F.col("start").alias("b"), "run", "step", "pos")
    # weights[tau] = c^tau as a literal double — identical on the oracle side
    weights = F.array(*[F.lit(float(c) ** t) for t in range(1, walk_length + 1)])
    met = (
        qt.join(bt, ["run", "step", "pos"])
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b", "run")
        .agg(F.min("step").alias("tau"))
    )
    out = (
        met.select("a", "b", F.element_at(weights, F.col("tau")).alias("w"))
        .groupBy("a", "b")
        .agg(F.round(F.sum("w") / float(num_runs), 6).alias("simrank"))
    )
    if topk is not None:
        w = Window.partitionBy("a").orderBy(
            F.col("simrank").desc(), F.col("b")
        )
        out = (
            out.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= int(topk))
            .drop("_rk")
        )
    from flexgraph_spark.textops import _materialize

    out = _materialize(out)  # small by construction: <= |Q| x V pairs
    trace.unpersist()
    pos.unpersist()
    deg.unpersist()
    return out


def sample_neighborhoods(
    edges: DataFrame,
    fanouts: tuple[int, ...] = (3, 2),
    salt: str = "sage",
    num_buckets: int = 32,
    roots: DataFrame | None = None,
) -> DataFrame:
    """GraphSAGE-style deterministic k-hop neighbor sampling (Hamilton et
    al., NeurIPS 2017) — the minibatch-construction step of every
    GNN-over-link-graph training pipeline: for each root, keep at most
    ``fanouts[0]`` of its out-neighbors, then at most ``fanouts[1]``
    neighbors of each of those, and so on. Returns
    (root, hop, parent, vertex) rows, hop 1-indexed.

    Sampling is SHARED per hop (each vertex's neighbor list is sampled
    once per hop depth and reused by every root that reaches it — the
    cost-sharing variant; the per-hop salt still decorrelates depths):
    neighbor ranking is by ``sha256(salt:hop:src:dst)`` with dst as the
    tiebreak, so the sample is uniform-without-replacement, reproducible
    at any parallelism, and replayable in ANSI SQL (no RNG state).

    Skew shape: a naive per-src row_number window serializes a hub's
    whole neighbor list through one task. Instead the top-f is
    HIERARCHICAL: rank within (src, hash-bucket) and keep f per bucket,
    then rank the surviving <= f x num_buckets rows per src — exact (the
    global top-f by any total order is contained in the union of
    per-bucket top-f) while the heavy first pass partitions a 10^8-degree
    hub across ``num_buckets`` tasks. The hop joins are keyed by the
    frontier's current vertex, the :func:`random_walks` shape.
    """
    if not fanouts:
        raise ValueError("sample_neighborhoods needs at least one fanout")
    from pyspark.sql import Window

    e = edges.select("src", "dst").distinct()

    def sampled_adjacency(hop: int, f: int) -> DataFrame:
        h = F.conv(
            F.substring(
                F.sha2(
                    F.concat_ws(
                        ":", F.lit(salt), F.lit(str(hop)), F.col("src"),
                        F.col("dst"),
                    ),
                    256,
                ),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        ranked = e.withColumn("_h", h)
        if num_buckets > 1:
            wb = Window.partitionBy(
                "src", F.pmod(F.col("_h"), F.lit(num_buckets))
            ).orderBy("_h", "dst")
            ranked = ranked.withColumn("_rb", F.row_number().over(wb)).filter(
                F.col("_rb") <= f
            )
        ws = Window.partitionBy("src").orderBy("_h", "dst")
        return (
            ranked.withColumn("_r", F.row_number().over(ws))
            .filter(F.col("_r") <= f)
            .select(F.col("src").alias("s_src"), F.col("dst").alias("s_dst"))
        )

    if roots is None:
        roots = e.select(F.col("src").alias("v")).union(
            e.select(F.col("dst").alias("v"))
        ).distinct()
    else:
        roots = roots.select(F.col(roots.columns[0]).alias("v")).distinct()

    frontier = roots.select(F.col("v").alias("root"), F.col("v").alias("cur"))
    out = None
    for hop, f in enumerate(fanouts, start=1):
        adj = sampled_adjacency(hop, int(f))
        stepped = frontier.join(
            adj, frontier.cur == adj.s_src
        ).select(
            "root",
            F.lit(hop).alias("hop"),
            F.col("cur").alias("parent"),
            F.col("s_dst").alias("vertex"),
        )
        out = stepped if out is None else out.union(stepped)
        frontier = stepped.select("root", F.col("vertex").alias("cur")).distinct()
    return out


def walk_cooccurrence(
    edges: DataFrame,
    walk_length: int = 4,
    num_walks: int = 1,
    window: int = 2,
    salt: str = "walk",
) -> DataFrame:
    """DeepWalk skip-gram corpus statistics: run the deterministic
    uniform walks of :func:`random_walks` and aggregate (center, context)
    co-occurrences within ``window`` steps — the training table a
    word2vec-style embedding job consumes, plus the shifted-PMI statistic
    NetMF (Qiu et al., WSDM 2018) proves DeepWalk implicitly factorizes:

        pmi = ln( n(c, x) · N / (n(c) · n(x)) )

    with N = total pair count and n(c), n(x) the marginal center/context
    occurrence counts. Returns (center, context, n, pmi), pmi rounded to
    6 decimals; pairs are ORDERED (center -> context both directions
    appear, the skip-gram convention).

    Scale shape: the walk table is V x num_walks x (walk_length+1) rows;
    the window pairing is a self-join on (start, walk_id) — walk keys are
    unique and uniformly sized (each walk has exactly walk_length+1
    rows), so the join fans out by at most 2·window per row with ZERO key
    skew regardless of graph skew (hubs inflate walk VISITS, which land
    in the count aggregation, a uniform shuffle on (center, context)).
    Everything after the walks is exact integer counting; the oracle
    replays walks and PMI bit-for-bit."""
    # the window pairing reads the walk table TWICE (center + context
    # sides): persist, or the full walk-join chain recomputes per side
    walks = random_walks(
        edges, walk_length=walk_length, num_walks=num_walks, salt=salt
    ).persist()
    a = walks.select(
        "start", "walk_id", F.col("step").alias("i"), F.col("vertex").alias("center")
    )
    b = walks.select(
        "start", "walk_id", F.col("step").alias("j"), F.col("vertex").alias("context")
    )
    pairs = (
        a.join(b, ["start", "walk_id"])
        .filter(
            (F.col("i") != F.col("j"))
            & (F.abs(F.col("i") - F.col("j")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count("*").alias("n"))
    ).persist()
    totals = pairs.agg(F.sum("n").alias("tot"))
    cm = pairs.groupBy("center").agg(F.sum("n").alias("nc"))
    xm = pairs.groupBy("context").agg(F.sum("n").alias("nx"))
    out = (
        pairs.join(cm, "center")
        .join(xm, "context")
        .crossJoin(F.broadcast(totals))
        .select(
            "center",
            "context",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.log(
                    F.col("n").cast("double") * F.col("tot")
                    / (F.col("nc").cast("double") * F.col("nx"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    from flexgraph_spark.textops import _materialize

    out = _materialize(out)
    pairs.unpersist()
    walks.unpersist()
    return out


def diameter_ifub(
    edges: DataFrame,
    root: int | None = None,
    batch_k: int = 16,
    max_bfs: int = 256,
    max_iter: int = 100,
    **kw,
) -> DataFrame:
    """EXACT diameter of the root's undirected component via iFUB
    (Crescenzi, Grossi, Habib, Lanzi, Marino: "On computing the diameter
    of real-world undirected graphs", TCS 2013): BFS from ``root`` gives
    levels; any pair with both endpoints at level <= i is at distance
    <= 2i (through the root), so processing fringe vertices DEEPEST-FIRST
    and maintaining lb = max eccentricity seen certifies ``diameter = lb``
    the moment lb >= 2i — on small-world graphs a handful of BFS runs
    instead of |V|. Eccentricities are computed ``batch_k`` sources per
    edge scan via the batched landmark state (:func:`landmark_distances`),
    so each round costs one multi-source BFS job.

    ``root`` defaults to the highest-degree vertex (tie: lowest id) —
    the standard iFUB start, it lands in the giant component and gives
    shallow, fast-certifying BFS trees; SQL-replayable (one degree
    argmax). Fringe ids are collected per level —
    driver-bounded by the level width (deep levels of small-world graphs
    are narrow; ``max_bfs`` caps the total and raises rather than
    silently degrading). Returns ONE row
    (root, diameter, n_bfs, certified) — certified is always 1 on return;
    the cap raises instead of returning an uncertified number.
    """
    from flexgraph_spark.graph import symmetrize

    und = symmetrize(edges.select("src", "dst")).persist()
    if root is None:
        root = int(
            und.groupBy("src").agg(F.count("*").alias("dg"))
            .orderBy(F.col("dg").desc(), F.col("src"))
            .first()["src"]
        )
    res = landmark_distances(und, [root], max_iter=max_iter, **kw)
    lv = (
        res.state.select("vertex", F.element_at("value", 1).alias("dd"))
        .filter(F.col("dd") < gimv.SSSP_INF)  # ANSI: filter inf BEFORE cast
        .select("vertex", F.col("dd").cast("long").alias("d"))
        .persist()
    )
    height = int(lv.agg(F.max("d")).first()[0])
    lb, n_bfs = height, 1
    spark = edges.sparkSession
    i = height
    while i >= 1 and lb < 2 * i:
        fringe = sorted(
            r["vertex"] for r in lv.filter(F.col("d") == i).collect()
        )
        for j in range(0, len(fringe), batch_k):
            chunk = [int(v) for v in fringe[j:j + batch_k]]
            if n_bfs + len(chunk) > max_bfs:
                raise RuntimeError(
                    f"diameter_ifub: exceeded max_bfs={max_bfs} at level {i} "
                    f"(lb={lb}); raise max_bfs or pick a more central root"
                )
            r2 = landmark_distances(und, chunk, max_iter=max_iter, **kw)
            ecc = int(
                landmark_long(r2, chunk).agg(F.max("dist")).first()[0]
            )
            lb = max(lb, ecc)
            n_bfs += len(chunk)
            if lb >= 2 * i:
                # every unprocessed pair has both endpoints at level <= i,
                # hence distance <= 2i <= lb through the root
                break
        i -= 1
    und.unpersist()
    lv.unpersist()
    return spark.createDataFrame(
        [(int(root), int(lb), int(n_bfs), 1)],
        "root long, diameter long, n_bfs long, certified int",
    )


INFLUENCE_MOD = 1_000_000


def influence_spread(
    edges: DataFrame,
    seeds: DataFrame,
    p: float = 0.3,
    cascade_seed: int = 1,
    max_hops: int = 8,
    **kw,
) -> DataFrame:
    """Independent-cascade influence spread (Kempe et al., KDD'03) via the
    live-edge equivalence: one IC simulation == reachability from the
    seed set in the subgraph where each directed edge is kept with
    probability ``p``. The coin is a deterministic multiplicative hash of
    (src, dst, cascade_seed) — the DOULION idiom (triangle_count_sampled),
    */%/+ arithmetic only, so a SQL oracle replays the draw bit-for-bit;
    vary ``cascade_seed`` for Monte-Carlo averaging (each seed is one
    independent sample, runnable as a batch).

    Execution: live edges + weight-0 virtual edges from a super-source
    (-1) to every seed, then the existing delta-messaged min-plus SSSP
    engine — unit weights make dist == activation round, and frontier
    messaging means each tail round ships only newly-activated vertices.
    ``seeds`` is a DataFrame with a ``vertex`` column. Returns
    (vertex, hops int) for activated vertices; seeds are hops 0.

    Scale: the live filter is map-side (no shuffle); everything after is
    the SSSP plan — the 100 TB story is the engine's, unchanged.
    """
    key = F.pmod(
        F.col("src").cast("decimal(38,0)") * 2654435761
        + F.col("dst").cast("decimal(38,0)") * 40503
        + F.lit(int(cascade_seed)) * 97003,
        F.lit(INFLUENCE_MOD),
    )
    cutoff = int(p * INFLUENCE_MOD)
    live = (
        edges.where(F.col("src") != F.col("dst"))
        .where(key < cutoff)
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    virt = seeds.select(
        F.lit(-1).cast("long").alias("src"),
        F.col("vertex").cast("long").alias("dst"),
        F.lit(0.0).alias("weight"),
    )
    res = sssp(live.unionByName(virt), -1, max_iter=max_hops + 1, **kw)
    return (
        res.state.filter(F.col("vertex") != -1)
        .filter(F.col("value") < gimv.SSSP_INF)
        .select("vertex", F.col("value").cast("int").alias("hops"))
    )


BRIDGE_HASH_MOD = 1 << 48
BRIDGE_MAX_DEPTH = 1 << 16  # auto-doubling ceiling for the BFS forest


def _bfs_forest(und: DataFrame, max_depth: int, **kw):
    """Deterministic rooted BFS spanning forest of the undirected simple
    graph ``und`` (canonical (a, b) pairs, a < b): one root per component
    (the HashMin CC label = min vertex) fed through the delta-messaged
    struct-min SSSP-tree engine via a weight-0 virtual super-source —
    one deterministic forest, ties to the lowest parent id. EXACTLY one
    root per component is load-bearing for every consumer (see bridges).

    Returns ``(parents, truncated)``: parents = persisted
    (vertex, parent, depth) rows for NON-root vertices (roots point at
    the virtual source and are excluded; depth(root) = 0), truncated =
    True when the depth cap left some vertex unreached (dist still INF)
    — consumers must deepen and retry rather than proceed on a broken
    forest."""
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    cc = connected_components(und.selectExpr("a as src", "b as dst"), **kw)
    roots = cc.state.filter(F.col("vertex") == F.col("value")).select("vertex")
    virt = roots.select(
        F.lit(-1).cast("long").alias("src"),
        F.col("vertex").cast("long").alias("dst"),
        F.lit(0.0).alias("weight"),
    )
    forest = sssp_tree(
        sym.withColumn("weight", F.lit(1.0)).unionByName(virt),
        -1,
        max_iter=max_depth + 1,
        **kw,
    )
    state = forest.state.filter(F.col("vertex") != -1)
    truncated = not (
        state.filter(F.col("value.dist") >= gimv.SSSP_INF).limit(1).isEmpty()
    )
    parents = (
        state.select(
            "vertex",
            F.col("value.parent").alias("parent"),
            F.col("value.dist").cast("long").alias("depth"),
        )
        .filter(F.col("parent") >= 0)
        .persist()
    )
    return parents, truncated


def _ancestor_closure(parents: DataFrame, max_depth: int):
    """ALL (v, ancestor) pairs of a rooted forest by pointer doubling on
    the parent pointers: log2(depth) self-joins, O(V·depth) pairs —
    bounded on the low-diameter graphs this engine targets. Exits early
    when the doubling frontier composes to nothing (max_depth is a CAP,
    not a round count). Returns (anc, cached) where cached lists the
    persisted frontier DataFrames the CALLER must unpersist."""
    anc = parents.select(F.col("vertex").alias("v"), F.col("parent").alias("anc"))
    jump = anc
    rounds = max(1, math.ceil(math.log2(max(2, max_depth))))
    cached = []
    for _ in range(rounds):
        nxt = (
            jump.alias("x")
            .join(anc.alias("y"), F.col("x.anc") == F.col("y.v"))
            .select(F.col("x.v").alias("v"), F.col("y.anc").alias("anc"))
            .persist()
        )
        if nxt.isEmpty():
            nxt.unpersist()
            break
        anc = gimv.truncate_plan(anc.unionByName(nxt).distinct())
        cached.append(nxt)
        jump = nxt
    return anc, cached


def bridges(
    edges: DataFrame,
    max_depth: int = 32,
    **kw,
) -> DataFrame:
    """Bridge detection (cut edges) on the undirected simple graph — the
    link-graph robustness primitive ("which single link, removed,
    disconnects part of the web?").

    Algorithm (the XOR-coverage forest method, a deterministic
    re-expression of Pritchard/Tarjan cycle-space sampling):
      1. BFS spanning forest: per-component roots (the HashMin component
         label = min vertex) fed through the delta-messaged struct-min
         SSSP-tree engine via a weight-0 virtual super-source — one
         deterministic forest, ties to the lowest parent id.
      2. every NON-tree edge gets a 48-bit multiplicative hash; each
         vertex's value = bit_xor of incident non-tree hashes.
      3. subtree XOR: ancestor closure by pointer doubling on parent
         pointers (log2(depth) self-joins, O(V·depth) pairs — bounded on
         the low-diameter graphs this engine targets), then one
         bit_xor groupBy per subtree root.
      4. a tree edge (parent, c) is a bridge iff subtree(c)'s XOR is 0:
         non-tree edges with both endpoints inside cancel pairwise, any
         crossing edge leaves its hash — so 0 means no cycle covers the
         edge. Non-tree edges are never bridges.
    False-bridge risk is a 2^-48 hash-subset cancellation (deterministic,
    input-only — reproducible by the SQL oracle bit-for-bit; widen the
    modulus or re-run with a different mix constant to certify).

    Every step is DataFrame joins/aggregations on uniform keys; the only
    driver values are the doubling-round counter. Returns canonical
    bridge edges (a, b) with a < b.
    """
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .persist()
    )
    # 1. deterministic rooted BFS forest — one root per component
    # (_bfs_forest; EXACTLY one root per component is load-bearing: with
    # two trees in one component, the edge joining them is classified
    # non-tree yet can itself be a bridge — the "non-tree edges are
    # never bridges" step only holds when every non-tree edge closes a
    # cycle). Depth-cap guard: a truncated forest would classify
    # unreached vertices' edges as non-tree and XOR-poison every
    # signature — silently wrong, not slow; auto-deepen instead.
    parents, truncated = _bfs_forest(und, max_depth, **kw)
    if truncated:
        und.unpersist()
        parents.unpersist()
        if max_depth >= BRIDGE_MAX_DEPTH:
            raise RuntimeError(
                "bridges(): BFS forest truncated at max_depth="
                f"{max_depth}; graph depth exceeds the hard cap "
                f"{BRIDGE_MAX_DEPTH} — results would be wrong, aborting"
            )
        return bridges(edges, max_depth=max_depth * 2, **kw)
    tree = parents.select(
        F.least("vertex", "parent").alias("a"),
        F.greatest("vertex", "parent").alias("b"),
        F.col("vertex").alias("child"),
    )
    non_tree = und.join(tree.select("a", "b"), ["a", "b"], "left_anti")
    # 2. 48-bit deterministic edge hash -> per-vertex XOR value
    h = F.pmod(
        F.col("a").cast("decimal(38,0)") * 2654435761
        + F.col("b").cast("decimal(38,0)") * 40503
        + 1099511628211,
        F.lit(BRIDGE_HASH_MOD),
    ).cast("long")
    nt = non_tree.withColumn("h", h)
    vals = (
        nt.select(F.col("a").alias("vertex"), "h")
        .unionByName(nt.select(F.col("b").alias("vertex"), "h"))
        .groupBy("vertex")
        .agg(F.expr("bit_xor(h)").alias("val"))
    )
    # 3. ancestor closure by pointer doubling (shared helper; data-driven
    # exit — max_depth is a CAP, not a round count)
    anc, frontiers = _ancestor_closure(parents, max_depth)
    sub_xor = (
        anc.join(vals, anc["v"] == vals["vertex"])
        .groupBy("anc")
        .agg(F.expr("bit_xor(val)").alias("sub"))
        .withColumnRenamed("anc", "vertex")
    )
    # 4. sig(child) = val(child) XOR descendants' XOR; bridge iff 0
    sig = (
        parents.join(vals.withColumnRenamed("vertex", "vx"),
                     parents["vertex"] == F.col("vx"), "left")
        .join(sub_xor.withColumnRenamed("vertex", "sx"),
              parents["vertex"] == F.col("sx"), "left")
        .select(
            "vertex",
            "parent",
            (
                F.coalesce(F.col("val"), F.lit(0)).bitwiseXOR(
                    F.coalesce(F.col("sub"), F.lit(0))
                )
            ).alias("sig"),
        )
    )
    out = (
        sig.filter(F.col("sig") == 0)
        .select(
            F.least("vertex", "parent").alias("a"),
            F.greatest("vertex", "parent").alias("b"),
        )
        .orderBy("a", "b")
    )
    # materialize, then release every cached intermediate (frontier
    # chain + und + parents) — long sessions run bridges repeatedly
    out = gimv.truncate_plan(out)
    for f in frontiers:
        f.unpersist()
    und.unpersist()
    parents.unpersist()
    return out


def two_edge_components(edges: DataFrame, max_depth: int = 32, **kw) -> DataFrame:
    """2-edge-connected components: delete the bridges, take connected
    components — every remaining component survives any single link
    failure (the mirror-placement / replication-domain question). Labels
    are HashMin (min vertex id in the component); bridge-isolated
    vertices become singletons. Returns (vertex, ecc_label)."""
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    br = bridges(edges, max_depth=max_depth, **kw)
    kept = und.join(br, ["a", "b"], "left_anti")
    verts = (
        und.select(F.col("a").alias("vertex"))
        .union(und.select("b"))
        .distinct()
    )
    cc = connected_components(kept.selectExpr("a as src", "b as dst"), **kw)
    return (
        verts.join(cc.state, "vertex", "left")
        .select(
            "vertex",
            F.coalesce(F.col("value"), F.col("vertex")).cast("long").alias("ecc_label"),
        )
    )


def articulation_points(
    edges: DataFrame,
    max_depth: int = 32,
    **kw,
) -> DataFrame:
    """Articulation points (cut VERTICES) of the undirected simple graph
    — the vertex sibling of :func:`bridges` ("which single page, removed,
    disconnects part of the web?"), via Tarjan–Vishkin biconnectivity
    (STOC'84 / SICOMP'85), the classic parallel algorithm that works
    with an ARBITRARY rooted spanning tree (no DFS — the property that
    makes it expressible as DataFrame joins):

      1. deterministic BFS forest + ancestor closure (shared with
         bridges: :func:`_bfs_forest`, :func:`_ancestor_closure`);
      2. auxiliary graph on TREE edges, each identified by its child
         endpoint:
           rule 1 — a non-tree edge {x, u} with x, u ancestor-UNrelated
           joins parent-edges (p(x),x)–(p(u),u);
           rule 2 — tree edge (v, w) joins its parent edge (p(v),v) iff
           some non-tree edge from subtree(w) lands OUTSIDE subtree(v)
           (the low/high preorder test re-expressed with the ancestor
           closure — membership joins instead of interval arithmetic);
      3. connected components of the auxiliary graph (the repo's own
         HashMin engine) = biconnected components of the tree edges;
         singleton tree edges (bridges) label themselves;
      4. a vertex is an articulation point iff its incident tree edges
         (child edges + its own parent edge) span >= 2 distinct labels —
         uniformly correct for roots (child edges only) and leaves
         (parent edge only, never articulation).

    Scale shape: everything is joins/aggregations on vertex/edge keys;
    the closure and the rule-2 candidate join are O(V·depth) /
    O(NT·depth) pairs — bounded on the low-diameter graphs this engine
    targets (same budget as bridges). Depth-cap truncation auto-deepens
    exactly like bridges. Gates: plain-python Tarjan low-link oracle in
    pytest (random graphs) + a planted ring-chain arithmetic oracle in
    the driver contract. Returns (vertex) rows, ascending."""
    und, parents, non_tree, lab, frontiers = _biconnectivity(
        edges, max_depth, **kw
    )
    inc = parents.select(
        F.col("parent").alias("vertex"), F.col("vertex").alias("eid")
    ).unionByName(
        parents.select("vertex", F.col("vertex").alias("eid"))
    )
    out = (
        inc.join(lab, "eid")
        .groupBy("vertex")
        .agg(F.count_distinct("lab").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("vertex")
        .orderBy("vertex")
    )
    out = gimv.truncate_plan(out)
    for f in frontiers:
        f.unpersist()
    und.unpersist()
    parents.unpersist()
    return out


def biconnected_components(
    edges: DataFrame,
    max_depth: int = 32,
    **kw,
) -> DataFrame:
    """Biconnected components: every undirected edge labeled with its
    block id (Tarjan–Vishkin, same machinery as
    :func:`articulation_points`). Tree edges take their auxiliary-graph
    CC label; a NON-tree edge joins the block of the parent edge of its
    DEEPER endpoint (for ancestor-related endpoints the deeper one's
    tree path closes the cycle; for unrelated endpoints rule 1 already
    merged both parent edges, so either endpoint gives the same label —
    the (depth desc, then a) pick is just a deterministic tie-break).
    Bridges are exactly the singleton blocks — gated by construction
    against :func:`bridges` (bcc_bridge_consistency) plus a python
    Tarjan block oracle in pytest. Returns (a, b, bcc_id) with a < b,
    one row per undirected edge."""
    und, parents, non_tree, lab, frontiers = _biconnectivity(
        edges, max_depth, **kw
    )
    tree_lab = (
        parents.select(
            F.least("vertex", "parent").alias("a"),
            F.greatest("vertex", "parent").alias("b"),
            F.col("vertex").alias("eid"),
        )
        .join(lab, "eid")
        .select("a", "b", F.col("lab").alias("bcc_id"))
    )
    da = parents.select(F.col("vertex").alias("a"), F.col("depth").alias("_da"))
    db = parents.select(F.col("vertex").alias("b"), F.col("depth").alias("_db"))
    nt_lab = (
        non_tree.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            F.when(F.col("_da") >= F.col("_db"), F.col("a"))
            .otherwise(F.col("b"))
            .alias("eid"),
        )
        .join(lab, "eid")
        .select("a", "b", F.col("lab").alias("bcc_id"))
    )
    out = gimv.truncate_plan(tree_lab.unionByName(nt_lab))
    for f in frontiers:
        f.unpersist()
    und.unpersist()
    parents.unpersist()
    return out


def _biconnectivity(edges: DataFrame, max_depth: int, **kw):
    """Shared Tarjan–Vishkin core: canonical undirected edges, BFS forest
    (auto-deepened on truncation), ancestor closure, auxiliary graph
    (rules 1+2), HashMin CC over it, and the tree-edge label table
    (eid = child endpoint, singleton edges label themselves). Returns
    (und, parents, non_tree, lab, frontiers); the CALLER unpersists und,
    parents, and every frontier."""
    while True:
        und = (
            edges.where(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .distinct()
            .persist()
        )
        parents, truncated = _bfs_forest(und, max_depth, **kw)
        if not truncated:
            break
        und.unpersist()
        parents.unpersist()
        if max_depth >= BRIDGE_MAX_DEPTH:
            raise RuntimeError(
                "biconnectivity: BFS forest truncated at max_depth="
                f"{max_depth}; graph depth exceeds the hard cap "
                f"{BRIDGE_MAX_DEPTH} — results would be wrong, aborting"
            )
        max_depth *= 2
    tree = parents.select(
        F.least("vertex", "parent").alias("a"),
        F.greatest("vertex", "parent").alias("b"),
    )
    non_tree = und.join(tree, ["a", "b"], "left_anti")
    anc, frontiers = _ancestor_closure(parents, max_depth)
    anc = gimv.truncate_plan(anc)
    nt = non_tree.select(F.col("a").alias("x"), F.col("b").alias("u")).unionByName(
        non_tree.select(F.col("b").alias("x"), F.col("a").alias("u"))
    )
    # rule 1: ancestor-UNrelated non-tree pairs join the parent edges of
    # both endpoints (aux node id = child endpoint). Unrelated endpoints
    # are never roots (a root is an ancestor of its whole component).
    rel_xu = anc.select(F.col("v").alias("x"), F.col("anc").alias("u"))
    rule1 = (
        non_tree.select(F.col("a").alias("x"), F.col("b").alias("u"))
        .join(rel_xu, ["x", "u"], "left_anti")
        .join(
            rel_xu.select(F.col("u").alias("x"), F.col("x").alias("u")),
            ["x", "u"],
            "left_anti",
        )
        .select(F.col("x").alias("src"), F.col("u").alias("dst"))
    )
    # rule 2: tree edge (v, w) ~ (p(v), v) iff a non-tree edge from
    # subtree(w) escapes subtree(v). Candidates: for each non-tree
    # endpoint x, every w with x in subtree(w) (w = x or w an ancestor
    # of x); escape test = u not in subtree(v), v = p(w); v must itself
    # be a non-root (its parent edge has to exist).
    sub_w = anc.select(F.col("v").alias("x"), F.col("anc").alias("w")).unionByName(
        parents.select(F.col("vertex").alias("x"), F.col("vertex").alias("w"))
    )
    cand = (
        nt.join(sub_w, "x")
        .join(parents.select(F.col("vertex").alias("w"),
                             F.col("parent").alias("pv")), "w")
        .select("w", "u", "pv")
    )
    in_sub_v = anc.select(F.col("v").alias("u"), F.col("anc").alias("pv"))
    escape = (
        cand.filter(F.col("u") != F.col("pv"))
        .join(in_sub_v, ["u", "pv"], "left_anti")
        .select("w", "pv")
        .distinct()
        # (p(v), v) must exist: v non-root
        .join(parents.select(F.col("vertex").alias("pv")), "pv")
    )
    rule2 = escape.select(F.col("w").alias("src"), F.col("pv").alias("dst"))
    aux = rule1.unionByName(rule2).distinct()
    bcc = connected_components(aux, **kw)
    lab = (
        parents.select(F.col("vertex").alias("eid"))
        .join(bcc.state.withColumnRenamed("vertex", "eid"), "eid", "left")
        .select(
            "eid",
            F.coalesce(F.col("value"), F.col("eid")).cast("long").alias("lab"),
        )
    )
    return und, parents, non_tree, lab, frontiers


def vertex_cover(edges: DataFrame, max_rounds: int = 50, **kw) -> DataFrame:
    """2-approximate minimum vertex cover: both endpoints of every edge
    in a maximal matching (Gavril's classic bound — the matching's
    |M| <= OPT lower bound certifies |cover| = 2|M| <= 2·OPT). Inherits
    :func:`maximal_matching`'s deterministic rounds; validity (every
    edge touches the cover) is guaranteed by maximality. Returns
    (vertex) rows.
    """
    m = maximal_matching(edges, max_rounds=max_rounds, **kw)
    return (
        m.state.select(F.col("a").alias("vertex"))
        .union(m.state.select("b"))
        .distinct()
    )


def feature_propagation(
    edges: DataFrame,
    features: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """SIGN/SGC-style k-hop feature smoothing — the GNN preprocessing
    trick (Wu et al. SGC, Frasca et al. SIGN): propagate node features
    through the graph BEFORE training so the downstream model is a plain
    MLP. Each round replaces a vertex's feature with the mean of its
    in-neighbors' features (isolated vertices keep their value).

    Executed in LONG format (vertex, j, x): one round = one src-keyed
    join + one (dst, j) groupBy-avg — both shuffles on uniform keys,
    pure codegen, no arrays through aggregation. Dimension count
    multiplies rows, not width: at 100 TB prefer ``dims`` row-slicing or
    the blocked batch kernels for very wide features; for the 64-256-dim
    embedding case the long plan is the simple exact path. Returns
    (vertex, j, x) after k rounds.
    """
    f = features.select(
        F.col(id_col).cast("long").alias("vertex"),
        F.posexplode(
            F.slice(embedding_col, 1, dims) if dims else F.col(embedding_col)
        ).alias("j", "x"),
    ).select("vertex", "j", F.col("x").cast("double").alias("x"))
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    cur = f
    for _ in range(k):
        msg = (
            e.join(cur.withColumnRenamed("vertex", "src"), "src")
            .groupBy(F.col("dst").alias("vertex"), "j")
            .agg(F.avg("x").alias("mx"))
        )
        cur = truncate_plan(
            cur.join(msg, ["vertex", "j"], "left")
            .select("vertex", "j",
                    F.coalesce("mx", "x").alias("x"))
        )
    return cur


def closeness_sampled(
    edges: DataFrame,
    landmarks: list[int],
    max_iter: int = 100,
    **kw,
) -> DataFrame:
    """Eppstein-Wang sampled closeness centrality: with k sampled
    landmarks, estimate each vertex's inverse-closeness as the mean of
    its distances FROM the landmarks — the O(k·E)-work estimator whose
    error is O(sqrt(log n / k) · diameter) w.h.p. (Eppstein & Wang,
    SODA'01), vs O(V·E) for exact closeness. Rides the batched
    multi-source min-plus engine (one edge scan per superstep serves all
    k landmarks); vertices unreached by a landmark simply drop that
    sample (reachable-universe semantics, same choice as
    closeness_exact). Returns (vertex, n_samples, avg_dist,
    closeness_est = (n_samples>0) ? 1/avg_dist : null).
    """
    res = landmark_distances(edges, landmarks, max_iter=max_iter, **kw)
    long = landmark_long(res, landmarks)
    return (
        long.filter(F.col("dist") < gimv.SSSP_INF)
        .groupBy("vertex")
        .agg(
            F.count("*").cast("long").alias("n_samples"),
            F.avg("dist").alias("avg_dist"),
        )
        .select(
            "vertex", "n_samples",
            F.round("avg_dist", 6).alias("avg_dist"),
            F.round(
                F.when(F.col("avg_dist") > 0, 1.0 / F.col("avg_dist")), 6
            ).alias("closeness_est"),
        )
    )
