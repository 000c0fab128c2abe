"""User-facing algorithms over an edge DataFrame (src long, dst long[, weight]).

Iterative ones run on the GIM-V runner (flat plan by default, blocked
skew-aware plan via engine='blocked'); triangle counting is a one-shot
degree-oriented join plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flexgraph_spark import gimv
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
    **kw,
) -> gimv.GimvResult:
    prog = gimv.PageRank(alpha=alpha, threshold=threshold, source_vertex=source_vertex)
    return _dispatch(edges, prog, engine, max_iter, checkpointer, kw)


def connected_components(
    edges: DataFrame, max_iter: int = 100, checkpointer=None, engine: str = "flat", **kw
) -> gimv.GimvResult:
    """True WCC: symmetrizes explicitly (the reference's cc.sh does not —
    SURVEY.md §3.2 discrepancy). Weights are irrelevant to CC and would
    turn the (src, dst)-distinct into per-weight parallel edges, so they
    are dropped before symmetrizing."""
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


def degrees(edges: DataFrame, direction: str = "out", weighted: bool = False) -> DataFrame:
    from flexgraph_spark.graph import degrees as _d

    return _d(edges, direction, weighted=weighted)


def triangle_count(edges: DataFrame) -> int:
    """Exact triangle count, degree-oriented (scalable): orient each
    undirected edge from the lower-(degree, id) endpoint to the higher one,
    enumerate wedges at the low vertex, close them against the oriented
    edge set. Every triangle is counted exactly once and wedge work
    concentrates on LOW-degree vertices, which is what survives hub skew at
    web scale (the join-on-hub explosion never materializes).
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("vertex"))
        .union(und.select(F.col("b").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("degree"))
    )
    ranked = (
        und.join(deg.withColumnRenamed("vertex", "a").withColumnRenamed("degree", "da"), "a")
        .join(deg.withColumnRenamed("vertex", "b").withColumnRenamed("degree", "db"), "b")
    )
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
    n = closed.count()
    oriented.unpersist()
    return n
