"""M1 — the generic GIM-V superstep runner (flat DataFrame plan).

GIM-V (reference: /root/reference/src/main/java/flexgraph/computation/
ComputationMapper.java:598-640) iterates ``v' = apply(v, combineAll(M ⊗_combine2 v))``
until no vertex changes. The reference hand-schedules this over custom block
files, DFS intermediates, and ZooKeeper barriers; here each superstep is ONE
declarative Spark plan:

    messages   = edges ⋈ state on src            (shuffle join on src)
    aggregated = messages.groupBy(dst).agg(⊕)    (map-side partial agg + shuffle)
    state'     = state ⟕ aggregated → apply()    (join + column expressions)

The driver loop is the barrier (each superstep = one Spark job), the
checkpoint truncates lineage (the iterative-plan blowup the reference never
faces), and the convergence vote (ComputationMapper.java:290-304) is one
aggregate on the freshly materialized state.

Vertex programs supply the semi-ring as *column expressions* (JVM-side,
whole-stage-codegen) — the Python process never sees a row.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

# Reference constants (Constants.java:50-59)
EPS = 1e-7
PAGERANK_ALPHA = 0.85
CONVERGE_THRESHOLD = 1e-8
SSSP_INF = 8.988465674311579e307  # Double.MAX_VALUE / 2, SSSPComputation.java:106


def truncate_plan(df: DataFrame) -> DataFrame:
    """Materialize a DataFrame so the next superstep's plan is rooted at it.

    ``localCheckpoint`` alone is NOT enough for iterative loops: Spark's
    LogicalRDD preserves the *estimated* statistics of the plan it
    checkpointed, and a superstep references the state twice (message join +
    apply join), so sizeInBytes SQUARES every iteration — after ~20
    iterations the optimizer grinds on million-digit BigIntegers and then
    throws "BigInteger would overflow supported range". Layering persist()
    + count() on top replaces the estimate with the real cached size (an
    InMemoryRelation reports actual bytes once materialized), which resets
    the compounding while localCheckpoint still truncates lineage.
    Caller owns unpersisting the previous state."""
    cached = df.persist()
    out = cached.localCheckpoint(eager=True)
    cached.unpersist(blocking=False)
    return out


@dataclass
class IterationMetrics:
    iteration: int
    messages_shuffled: int
    changed: int
    edges_scanned: int
    seconds: float
    skew_ratio: float = 1.0


@dataclass
class GimvResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[IterationMetrics] = field(default_factory=list)


class VertexProgram:
    """One GIM-V instantiation. Subclasses define the semi-ring.

    value column is named ``value``; state schema is (vertex long, value T).

    The ``np_*`` methods are the same semi-ring as NumPy kernels — the
    blocked execution path (flexgraph_spark.blocks) runs them inside
    Arrow-batched pandas UDFs over CSR block arrays. ``supports_blocked``
    is False for non-scalar semi-rings (label propagation's per-label
    count/argmax), which run on the flat plan only.
    """

    name = "abstract"
    needs_out_degree = False
    weighted = False
    supports_blocked = True
    blocked_kind = "scalar"  # "scalar" | "label_count" — blocked kernel family
    reduce_np = "sum"  # "sum" | "min" — blocked combineAll
    identity = 0.0     # identity element of reduce_np
    # When True, the blocked reduce_apply passes the block's global id
    # array to np_apply (global_ids=...), letting per-vertex statics that
    # are FUNCTIONS of the id (predicate seed sets) be computed in-kernel
    # with zero extra state plumbing.
    needs_global_ids = False
    # Frontier/delta messaging: when True, only vertices whose value CHANGED
    # last superstep send messages this superstep. Exact for idempotent-min
    # semi-rings with apply = least(old, msg) (CC, SSSP): a dst has already
    # incorporated every value an unchanged src would re-send, and values
    # only decrease. The reference ships only active/nonzero entries between
    # supersteps the same way (BitSet-filtered vector iterator,
    # cache/DoubleVectorCache.java:68-101; nonzero-only intermediate writes,
    # computation/ComputationMapper.java:154-171). NOT valid for sum
    # semi-rings (PageRank needs every contribution every superstep).
    delta_messaging = False

    def np_init(self, global_ids, n):
        """Initial dense value array for a block's global ids (np.int64[])."""
        raise NotImplementedError

    def np_signal(self, values, out_degree):
        """Per-source emitted signal (combine2's source-dependent factor).
        ``out_degree`` is the global out-degree array aligned with values."""
        return values

    def np_message(self, signal_at_src, weights):
        """Per-edge message from the source signal (+ weight if weighted)."""
        return signal_at_src

    def np_apply(self, old, msg, has_msg, n):
        """Vectorized apply; ``has_msg`` masks vertices that got messages."""
        raise NotImplementedError

    def np_changed(self, old, new):
        raise NotImplementedError

    def init_state(self, vertices: DataFrame, n: int) -> DataFrame:
        raise NotImplementedError

    def message(self) -> F.Column:
        """combine2: expression over columns (value, weight, out_degree) of
        the edges⋈state row -> message value sent to dst."""
        raise NotImplementedError

    def message_filter(self) -> F.Column | None:
        """Optional predicate on the source state to prune inactive sources
        (e.g. SSSP's unreached vertices) before the join output explodes."""
        return None

    def aggregate(self, messages: DataFrame) -> DataFrame:
        """combineAll: (dst, msg) -> (vertex, msg). Default: scalar agg."""
        return messages.groupBy(F.col("dst").alias("vertex")).agg(
            self.reduce_expr().alias("msg")
        )

    def global_agg(self) -> F.Column | None:
        """Optional per-superstep GLOBAL scalar: an aggregate expression
        over the state (e.g. the dangling rank mass). When non-None,
        gimv.run crossJoins the 1-row aggregate into the apply stage as
        column ``_gagg`` — a broadcast nested-loop join of one row, so
        the scalar is computed and folded in DECLARATIVELY inside the
        same superstep job (never a driver collect per iteration).
        ``apply`` may then reference ``F.col("_gagg")``."""
        return None

    def reduce_expr(self) -> F.Column:
        raise NotImplementedError

    def apply(self, old: F.Column, msg: F.Column, n: int) -> F.Column:
        """new value from old value + aggregated message (msg NULL when the
        vertex received no messages)."""
        raise NotImplementedError

    def changed(self, old: F.Column, new: F.Column) -> F.Column:
        """notifyChanged: per-vertex convergence predicate."""
        raise NotImplementedError

    def finalize(self, state: DataFrame) -> DataFrame:
        return state


class PageRank(VertexProgram):
    """Reference semantics (PageRankComputation.java:202-256): contribution
    value/out_degree, sum-reduce, new = α·msg + (1-α)/n, NO dangling-mass
    redistribution, converged when every |Δ| ≤ threshold, post-hoc
    normalization by the global rank sum."""

    name = "pagerank"
    needs_out_degree = True

    def __init__(self, alpha: float = PAGERANK_ALPHA, threshold: float = CONVERGE_THRESHOLD,
                 source_vertex: int | None = None):
        self.alpha = alpha
        self.threshold = threshold
        self.source_vertex = source_vertex  # personalized init (RWR)

    def init_state(self, vertices: DataFrame, n: int) -> DataFrame:
        if self.source_vertex is None:
            return vertices.select("vertex", F.lit(1.0 / n).alias("value"))
        return vertices.select(
            "vertex",
            F.when(F.col("vertex") == self.source_vertex, 1.0).otherwise(0.0).alias("value"),
        )

    def message(self) -> F.Column:
        return F.col("value") / F.col("out_degree")

    def reduce_expr(self) -> F.Column:
        return F.sum("msg")

    def apply(self, old, msg, n):
        return self.alpha * F.coalesce(msg, F.lit(0.0)) + (1.0 - self.alpha) / n

    def changed(self, old, new):
        return F.abs(new - old) > self.threshold

    def finalize(self, state: DataFrame) -> DataFrame:
        total = state.agg(F.sum("value")).first()[0]
        return state.select("vertex", (F.col("value") / total).alias("value"))

    # --- blocked-path NumPy kernels (same semantics, Arrow-vectorized) ---
    reduce_np = "sum"
    identity = 0.0

    def np_init(self, global_ids, n):
        import numpy as np

        if self.source_vertex is None:
            return np.full(len(global_ids), 1.0 / n, dtype=np.float64)
        return (global_ids == self.source_vertex).astype(np.float64)

    def np_signal(self, values, out_degree):
        import numpy as np

        return np.divide(values, out_degree, out=np.zeros_like(values),
                         where=out_degree > 0)

    def np_apply(self, old, msg, has_msg, n):
        return self.alpha * msg + (1.0 - self.alpha) / n

    def np_changed(self, old, new):
        import numpy as np

        return np.abs(new - old) > self.threshold


class WeightedPageRank(PageRank):
    """PageRank over a weighted digraph: a source distributes its rank in
    proportion to edge weight — message = value·w(u,v)/Σ_v w(u,·) — with
    the same teleport/convergence/normalization semantics as
    :class:`PageRank` (reference PageRankComputation.java:202-256; the
    reference itself is unweighted, this is the weighted-matrix GIM-V
    instantiation its WeightedGraphPrepartitioning feeds into SSSP only).

    This class is the FLAT-plan face (``supports_blocked=False``): the
    blocked CSR kernels carry unweighted global-degree arrays, so the
    blocked engine instead runs :class:`NormalizedWeightedPageRank` over
    pre-normalized weights (algorithms.pagerank routes automatically) —
    same semantics, no weighted-degree sidecar needed.
    ``weighted_degree`` makes gimv.run compute out_degree as sum(weight),
    so dangling handling and zero-weight guards match the unweighted plan
    shape exactly.
    """

    name = "weighted_pagerank"
    weighted = True
    weighted_degree = True
    supports_blocked = False

    def message(self) -> F.Column:
        return F.col("value") * F.col("weight") / F.col("out_degree")


class NormalizedWeightedPageRank(PageRank):
    """Weighted PageRank over PRE-NORMALIZED weights — the blocked-engine
    face of :class:`WeightedPageRank`. algorithms.pagerank divides each
    weight by its source's weight sum once at setup (one join, before
    prepartitioning), after which the recurrence is
    ``message = value · w'`` with NO degree factor — so the blocked CSR
    kernels need no weighted-degree sidecar: signal = value and the
    per-edge multiply uses the weight arrays the weighted block format
    already carries for SSSP (blocks.prepartition ``weighted=True``).
    Same semantics as WeightedPageRank (v·w/Σw vs v·(w/Σw) differ only in
    rounding order); weights must be positive — a zero weight-sum source
    produces null fractions, matching the flat plan's division-by-zero
    nulls. Works on BOTH engines.
    """

    name = "weighted_pagerank_norm"
    weighted = True
    supports_blocked = True
    needs_out_degree = False

    def message(self) -> F.Column:
        return F.col("value") * F.col("weight")

    def np_signal(self, values, out_degree):
        return values

    def np_message(self, signal_at_src, weights):
        return signal_at_src * weights


class BatchPPR(VertexProgram):
    """Multi-source personalized PageRank: the state value is an
    array<double> of length k (one PPR column per source), so ONE edge
    scan + ONE state shuffle per superstep serves all k sources — at
    cluster scale this replaces k independent RWR jobs each rescanning
    the full edge table (the batch-column trick GIM-V block methods use
    for multi-vector workloads). Semantics per column are identical to
    :class:`PageRank` with ``source_vertex`` set (reference
    PageRankComputation.java:202-256 recurrence, incl. the uniform
    (1-α)/n teleport quirk and per-column rank-sum normalization), which
    is what the oracle unrolls per (vertex, source) pair.

    Blocked engine: the ``batch`` kernel family (blocks.run_blocked)
    carries a FLATTENED (n_local × k) row-major matrix per block — the
    np_* kernels below see (rows, k) 2-D views, so one CSR gather-scatter
    per superstep still serves all k PPR columns (the reference's
    block-method multi-vector trick, now on the skew-aware plan).
    """

    name = "batch_ppr"
    needs_out_degree = True
    supports_blocked = True
    blocked_kind = "batch"
    reduce_np = "sum"
    identity = 0.0

    def __init__(self, sources: list[int], alpha: float = PAGERANK_ALPHA,
                 threshold: float = CONVERGE_THRESHOLD):
        if not sources:
            raise ValueError("BatchPPR needs at least one source vertex")
        self.sources = [int(s) for s in sources]
        self.k = len(self.sources)
        self.alpha = alpha
        self.threshold = threshold

    def init_state(self, vertices: DataFrame, n: int) -> DataFrame:
        arr = F.array(*[
            F.when(F.col("vertex") == s, 1.0).otherwise(0.0) for s in self.sources
        ])
        return vertices.select("vertex", arr.alias("value"))

    def message(self) -> F.Column:
        return F.transform(F.col("value"), lambda x: x / F.col("out_degree"))

    def aggregate(self, messages: DataFrame) -> DataFrame:
        # k scalar sums (not a UDAF): each is a JVM partial aggregate, so
        # the map-side combine still collapses per-dst fan-in before the
        # shuffle, exactly like the scalar PageRank path.
        return messages.groupBy(F.col("dst").alias("vertex")).agg(
            F.array(*[
                F.sum(F.element_at("msg", i + 1)) for i in range(self.k)
            ]).alias("msg")
        )

    def apply(self, old, msg, n):
        m = F.coalesce(msg, F.array_repeat(F.lit(0.0), self.k))
        return F.transform(m, lambda x: self.alpha * x + (1.0 - self.alpha) / n)

    def changed(self, old, new):
        return F.exists(
            F.zip_with(old, new, lambda o, v: F.abs(v - o) > self.threshold),
            lambda b: b,
        )

    def finalize(self, state: DataFrame) -> DataFrame:
        totals = state.agg(*[
            F.sum(F.element_at("value", i + 1)).alias(f"t{i}") for i in range(self.k)
        ]).first()
        arr = F.array(*[
            F.element_at("value", i + 1) / F.lit(float(totals[i]))
            for i in range(self.k)
        ])
        return state.select("vertex", arr.alias("value"))

    # --- blocked 'batch' kernels: values arrive as (rows, k) 2-D views ---
    def np_init(self, global_ids, n):
        import numpy as np

        mat = np.zeros((len(global_ids), self.k), dtype=np.float64)
        for j, s in enumerate(self.sources):
            mat[global_ids == s, j] = 1.0
        return mat

    def np_signal(self, values, out_degree):
        import numpy as np

        deg = np.asarray(out_degree, dtype=np.float64)[:, None]
        return np.divide(values, deg, out=np.zeros_like(values), where=deg > 0)

    def np_apply(self, old, msg, has_msg, n):
        return self.alpha * msg + (1.0 - self.alpha) / n

    def np_changed(self, old, new):
        import numpy as np

        return (np.abs(new - old) > self.threshold).any(axis=1)


class Katz(VertexProgram):
    """Katz centrality: ``x_{t+1}(v) = α · Σ_{u→v} (1 + x_t(u))``, x₀ = 0 —
    after t iterations x_t(v) = Σ_{k=1..t} α^k · (#paths of length k ending
    at v), the truncated Katz series. α must sit below 1/λ_max(A) for the
    infinite series to converge; callers either run to the |Δ| ≤ threshold
    fixpoint or a fixed recurrence depth (the oracle contract, like
    pagerank10). Plain scalar sum semi-ring with NO degree factor
    (message = 1 + value), so both engines run it unchanged — another
    GIM-V instantiation in the reference's sense (SURVEY §2.1: combine2 =
    α-scaled path count, combineAll = sum), not in the reference's own
    algorithm set."""

    name = "katz"
    needs_out_degree = False

    def __init__(self, alpha: float = 0.05, threshold: float = CONVERGE_THRESHOLD):
        self.alpha = alpha
        self.threshold = threshold

    def init_state(self, vertices, n):
        return vertices.select("vertex", F.lit(0.0).alias("value"))

    def message(self):
        return F.lit(1.0) + F.col("value")

    def reduce_expr(self):
        return F.sum("msg")

    def apply(self, old, msg, n):
        return self.alpha * F.coalesce(msg, F.lit(0.0))

    def changed(self, old, new):
        return F.abs(new - old) > self.threshold

    # --- blocked-path NumPy kernels ---
    reduce_np = "sum"
    identity = 0.0

    def np_init(self, global_ids, n):
        import numpy as np

        return np.zeros(len(global_ids), dtype=np.float64)

    def np_signal(self, values, out_degree):
        return 1.0 + values

    def np_apply(self, old, msg, has_msg, n):
        return self.alpha * msg

    def np_changed(self, old, new):
        import numpy as np

        return np.abs(new - old) > self.threshold


class FaBP(VertexProgram):
    """FaBP — linearized belief propagation (Koutra et al., PKDD 2011,
    "Unifying Guilt-by-Association Approaches: Theorems and Fast
    Algorithms"). Semi-supervised node scoring from a handful of labeled
    seeds: solve the linear system

        (I + a·D − c'·A) · b = φ

    by Jacobi iteration ``b ← φ + c'·(A·b) − a·(D·b)`` with
    ``a = 4h²/(1−4h²)`` and ``c' = 2h/(1−4h²)`` (h = about-half
    homophily strength; the iteration contracts when c'·λ_max(A) < 1,
    the paper's convergence condition — callers pick h accordingly).
    A must be symmetric (algorithms.fabp symmetrizes); φ holds the seed
    beliefs (±ε for labeled vertices, 0 elsewhere).

    The PEGASUS/FlexGraph lineage runs BP as a GIM-V product the same way
    (HA-LFP; SURVEY §2.1's combine2/combineAll generalization — the
    reference's own algorithm set stops at PR/RWR/CC/SSSP, this is the
    family's canonical next instantiation). GIM-V mapping: combine2 =
    neighbor belief, combineAll = sum, apply = the Jacobi update — which
    needs the vertex's OWN prior φ(v) and degree d(v), so the state value
    is a struct(b, phi, deg) rather than a scalar: the static fields ride
    the state instead of being re-joined every superstep (flat plan only;
    the blocked CSR kernels are scalar/batch — ``supports_blocked=False``).
    """

    name = "fabp"
    needs_out_degree = False
    supports_blocked = False  # struct-valued state: flat plan only

    def __init__(self, priors: DataFrame, degrees: DataFrame,
                 h: float = 0.002, threshold: float = CONVERGE_THRESHOLD):
        hh = 4.0 * h * h
        self.a = hh / (1.0 - hh)
        self.c2 = 2.0 * h / (1.0 - hh)
        self.priors = priors      # (vertex, prior)
        self.degrees = degrees    # (vertex, deg) — undirected degree of A
        self.threshold = threshold

    def init_state(self, vertices: DataFrame, n: int) -> DataFrame:
        # b₀ = φ (one Jacobi step from the zero vector); φ and d(v) ride
        # the struct so the superstep plan never re-joins static tables.
        return (
            vertices.join(self.priors, "vertex", "left")
            .join(self.degrees, "vertex", "left")
            .select(
                "vertex",
                F.struct(
                    F.coalesce("prior", F.lit(0.0)).alias("b"),
                    F.coalesce("prior", F.lit(0.0)).alias("phi"),
                    F.coalesce("deg", F.lit(0.0)).alias("deg"),
                ).alias("value"),
            )
        )

    def message(self) -> F.Column:
        return F.col("value").getField("b")

    def reduce_expr(self) -> F.Column:
        return F.sum("msg")

    def apply(self, old, msg, n):
        new_b = (
            old.getField("phi")
            + self.c2 * F.coalesce(msg, F.lit(0.0))
            - self.a * old.getField("deg") * old.getField("b")
        )
        return F.struct(
            new_b.alias("b"),
            old.getField("phi").alias("phi"),
            old.getField("deg").alias("deg"),
        )

    def changed(self, old, new):
        return F.abs(new.getField("b") - old.getField("b")) > self.threshold

    def finalize(self, state: DataFrame) -> DataFrame:
        return state.select("vertex", F.col("value").getField("b").alias("value"))


class MatVec(VertexProgram):
    """Bare unnormalized matrix–vector product ``y ← A·y`` on the sum
    semi-ring — the building block of the DEFERRED-NORMALIZATION blocked
    power iteration (algorithms.power_iteration engine='blocked'): the
    per-step L2 normalization is only a scalar, so x_k ∝ A^k·x₀ holds
    whatever the intermediate scaling and the normalize moves OUTSIDE
    the loop — zero driver synchronization per superstep. Start vector
    is all-ones (scale-irrelevant); vertices with no in-messages go to
    exact 0 (matching the flat face's coalesce(raw, 0))."""

    name = "matvec"
    supports_blocked = True
    blocked_kind = "scalar"
    reduce_np = "sum"
    identity = 0.0

    def init_state(self, vertices, n):
        return vertices.select("vertex", F.lit(1.0).alias("value"))

    def np_init(self, global_ids, n):
        import numpy as np

        return np.ones(len(global_ids))

    def np_apply(self, old, msg, has_msg, n):
        return msg

    def np_changed(self, old, new):
        import numpy as np

        return np.ones(len(new), dtype=bool)  # fixed depth: never settles

    def message(self):
        return F.col("value")

    def reduce_expr(self):
        return F.sum("msg")

    def apply(self, old, msg, n):
        return F.coalesce(msg, F.lit(0.0))

    def changed(self, old, new):
        return F.lit(True)


class AlternatingPropagation(VertexProgram):
    """Blocked-engine face of the two-phase hub/authority recurrences
    (HITS, SALSA) — the last flat-only shape. Those programs alternate
    the matrix per half-step (auth ← Aᵀ·hub THEN hub ← A·auth, the
    second using the FRESH auth), which a single fixed block set cannot
    express directly. The trick is VERTEX DOUBLING + PARITY MASKING:

    * the graph doubles to [0, 2n): hub copies keep their ids, authority
      copies live at v+n; every original edge (u, v) becomes BOTH
      ``u → v+n`` (hub signal into authorities) and ``v+n → u``
      (authority signal into hubs), so one block set carries both
      directions and ``gdeg`` in the doubled graph is exactly the
      out-degree for hubs and the IN-degree for authorities — SALSA's
      two normalizing denominators come for free from the existing
      degree plumbing;
    * the batch k=2 state carries [value, step]; every superstep ALL
      messages flow, but np_apply (with ``needs_global_ids`` telling the
      halves apart) accepts the message sum only on the half whose turn
      it is — even steps update authorities from hubs, odd steps update
      hubs from the fresh authorities — and bumps the step counter. The
      stale half's simultaneous (Jacobi) sums are computed and
      discarded, which costs one wasted gather per half-step but buys
      the EXACT Gauss–Seidel alternation the flat faces define.

    ``scaled=True`` divides each signal by the sender's gdeg (SALSA's
    column-stochastic half-steps — no other normalization exists, so
    blocked values equal flat values outright). ``scaled=False`` is raw
    HITS; its per-half-step L2 normalization is only a scalar, so it
    defers to one end normalization in the wrapper (the MatVec deferred-
    normalization argument, valid at gate depths — rescale for deep
    runs). Run 2·max_iter supersteps for max_iter two-phase iterations.
    Inputs should be pre-deduped; ids contiguous [0, n)."""

    name = "alternating"
    supports_blocked = True
    blocked_kind = "batch"
    reduce_np = "sum"
    identity = 0.0
    needs_global_ids = True
    k = 2  # [value, step]

    def __init__(self, n_orig: int, scaled: bool):
        self.n_orig = int(n_orig)
        self.scaled = scaled

    def np_init(self, global_ids, n):
        import numpy as np

        val = np.where(global_ids < self.n_orig, 1.0, 0.0)  # hub init = 1
        return np.stack([val, np.zeros(len(val))], axis=1)

    def np_signal(self, values, out_degree):
        import numpy as np

        v = values[:, 0]
        if self.scaled:
            v = np.divide(v, out_degree, out=np.zeros_like(v),
                          where=out_degree > 0)
        return np.stack([v, np.zeros(len(v))], axis=1)

    def np_apply(self, old, msg, has_msg, n, global_ids=None):
        import numpy as np

        step = old[0, 1] if len(old) else 0.0
        is_auth = global_ids >= self.n_orig
        take = is_auth if int(step) % 2 == 0 else ~is_auth
        val = np.where(take, msg[:, 0], old[:, 0])
        return np.stack([val, np.full(len(val), step + 1.0)], axis=1)

    def np_changed(self, old, new):
        import numpy as np

        return np.ones(len(new), dtype=bool)  # fixed depth

    def finalize(self, state: DataFrame) -> DataFrame:
        return state.select(
            "vertex", F.element_at("value", 1).alias("value")
        )


class FaBPPredicate(VertexProgram):
    """FaBP with a PREDICATE-defined prior — the blocked-engine face of
    :class:`FaBP` (the TrustRankPredicate idea applied to the struct-state
    program). When the seed beliefs are a function of the vertex id (a
    labeled id range, a hash bucket, a modulus), the two per-vertex
    statics the Jacobi update needs dissolve into the kernels and the
    state collapses to the ``batch`` family's k=2 float64 vector:

    * φ(v): recomputed in-kernel from the block's global ids
      (``needs_global_ids`` — the batch reduce_apply passes
      ``arange(block, n, p)``, zero extra state plumbed);
    * d(v): DELIVERED BY THE MESSAGES — each source emits the 2-vector
      [b_src, 1] over the symmetrized adjacency, so the sum-reduce
      accumulator arrives as [Σ_{u∈N(v)} b_u, d(v)]: component 1 of the
      very product that carries the beliefs counts the degree, since A
      is symmetric (the message-side degree trick — no degree array is
      stored, joined, or shipped).

    Same recurrence, constants, and convergence contract as
    :class:`FaBP`; ``prior_np(ids) -> float64[]`` must match the flat
    face's priors for cross-engine equivalence (property-fuzzed in
    tests/test_property.py). Blocked plan only — the flat face keeps
    the struct-state :class:`FaBP` (arbitrary prior DataFrames)."""

    name = "fabp"
    needs_out_degree = False
    supports_blocked = True
    blocked_kind = "batch"
    reduce_np = "sum"
    identity = 0.0
    needs_global_ids = True
    k = 2  # [b, degree-carrier]

    def __init__(self, prior_np, h: float = 0.002, threshold: float = 0.0):
        import numpy as np  # noqa: F401 (kernels)

        hh = 4.0 * h * h
        self.a = hh / (1.0 - hh)
        self.c2 = 2.0 * h / (1.0 - hh)
        self.prior_np = prior_np
        self.threshold = threshold

    def np_init(self, global_ids, n):
        import numpy as np

        phi = np.asarray(self.prior_np(global_ids), dtype=np.float64)
        # b₀ = φ (one Jacobi step from the zero vector — matches FaBP);
        # component 1 is populated by the first superstep's degree sum.
        return np.stack([phi, np.zeros(len(phi))], axis=1)

    def np_signal(self, values, out_degree):
        import numpy as np

        return np.stack(
            [values[:, 0], np.ones(len(values))], axis=1
        )

    def np_apply(self, old, msg, has_msg, n, global_ids=None):
        import numpy as np

        phi = np.asarray(self.prior_np(global_ids), dtype=np.float64)
        deg = msg[:, 1]
        new_b = phi + self.c2 * msg[:, 0] - self.a * deg * old[:, 0]
        return np.stack([new_b, deg], axis=1)

    def np_changed(self, old, new):
        import numpy as np

        return np.abs(new[:, 0] - old[:, 0]) > self.threshold

    def finalize(self, state: DataFrame) -> DataFrame:
        return state.select(
            "vertex", F.element_at("value", 1).alias("value")
        )


class TrustRank(VertexProgram):
    """TrustRank (Gyöngyi, Garcia-Molina, Pedersen, VLDB 2004): PageRank
    with teleport restricted to a trusted seed set —
    ``t ← α·Aᵀ_norm·t + (1−α)·d`` with d uniform over the seeds and
    t₀ = d. The classic trust/spam-propagation analysis for web-scale
    link graphs; differs from this repo's RWR quirk-preserving
    PageRank(source_vertex=·) in that the teleport mass is split across
    a SET of seeds (and from the reference PageRank in that teleport is
    NOT uniform over all vertices).

    Like :class:`FaBP`, the per-vertex static (the teleport weight d(v))
    rides the state as a struct field instead of being re-joined every
    superstep — state value = struct(t, d); flat plan only.
    """

    name = "trustrank"
    needs_out_degree = True
    supports_blocked = False  # struct-valued state: flat plan only

    def __init__(self, seeds: DataFrame, alpha: float = PAGERANK_ALPHA,
                 threshold: float = CONVERGE_THRESHOLD):
        self.seeds = seeds  # (vertex) — uniform d = 1/|seeds| over these
        self.alpha = alpha
        self.threshold = threshold

    def init_state(self, vertices: DataFrame, n: int) -> DataFrame:
        n_seeds = self.seeds.count()
        d = F.when(F.col("_is_seed").isNotNull(), 1.0 / n_seeds).otherwise(0.0)
        return (
            vertices.join(
                self.seeds.select("vertex", F.lit(1).alias("_is_seed")),
                "vertex", "left",
            )
            .select(
                "vertex",
                F.struct(d.alias("t"), d.alias("d")).alias("value"),
            )
        )

    def message(self) -> F.Column:
        return F.col("value").getField("t") / F.col("out_degree")

    def reduce_expr(self) -> F.Column:
        return F.sum("msg")

    def apply(self, old, msg, n):
        new_t = (
            self.alpha * F.coalesce(msg, F.lit(0.0))
            + (1.0 - self.alpha) * old.getField("d")
        )
        return F.struct(new_t.alias("t"), old.getField("d").alias("d"))

    def changed(self, old, new):
        return F.abs(new.getField("t") - old.getField("t")) > self.threshold

    def finalize(self, state: DataFrame) -> DataFrame:
        return state.select("vertex", F.col("value").getField("t").alias("value"))


class TrustRankPredicate(VertexProgram):
    """TrustRank with a PREDICATE-defined trusted set — the blocked-engine
    face of :class:`TrustRank`. When the seed set is a function of the
    vertex id (a partner-domain id range, a hash bucket, a modulus — the
    common case at 10^10-vertex scale, where materializing a seed
    DataFrame per superstep is the expensive path), the teleport weight
    d(v) = [pred(v)]/|S| is computable INSIDE both engines' kernels:

    * flat plan: ``apply`` references the ``vertex`` column directly
      (scalar state — no struct statics needed);
    * blocked plan: scalar CSR kernels, with ``needs_global_ids`` asking
      reduce_apply for the block's global id array (derivable as
      ``arange(block, n, p)`` — zero extra state plumbed).

    ``pred_col(vertex_col) -> BooleanColumn`` and
    ``pred_np(ids) -> bool ndarray`` must encode the SAME predicate;
    ``n_seeds`` is the global seed count (the wrapper computes it once).
    Semantics and the oracle face are identical to :class:`TrustRank`.
    """

    name = "trustrank"
    needs_out_degree = True
    supports_blocked = True
    blocked_kind = "scalar"
    reduce_np = "sum"
    identity = 0.0
    needs_global_ids = True  # np_apply receives the block's global ids

    def __init__(self, pred_col, pred_np, n_seeds: int,
                 alpha: float = PAGERANK_ALPHA,
                 threshold: float = CONVERGE_THRESHOLD):
        if n_seeds <= 0:
            raise ValueError("TrustRankPredicate needs a non-empty seed set")
        self.pred_col = pred_col
        self.pred_np = pred_np
        self.n_seeds = int(n_seeds)
        self.alpha = alpha
        self.threshold = threshold

    def _d_col(self) -> F.Column:
        return F.when(
            self.pred_col(F.col("vertex")), 1.0 / self.n_seeds
        ).otherwise(0.0)

    def init_state(self, vertices: DataFrame, n: int) -> DataFrame:
        return vertices.select("vertex", self._d_col().alias("value"))

    def message(self) -> F.Column:
        return F.col("value") / F.col("out_degree")

    def reduce_expr(self) -> F.Column:
        return F.sum("msg")

    def apply(self, old, msg, n):
        return (
            self.alpha * F.coalesce(msg, F.lit(0.0))
            + (1.0 - self.alpha) * self._d_col()
        )

    def changed(self, old, new):
        return F.abs(new - old) > self.threshold

    # --- blocked-path NumPy kernels ---
    def _d_np(self, ids):
        import numpy as np

        return np.where(
            np.asarray(self.pred_np(ids), dtype=bool), 1.0 / self.n_seeds, 0.0
        )

    def np_init(self, global_ids, n):
        return self._d_np(global_ids)

    def np_signal(self, values, out_degree):
        import numpy as np

        return np.divide(values, out_degree, out=np.zeros_like(values),
                         where=out_degree > 0)

    def np_apply(self, old, msg, has_msg, n, global_ids=None):
        return self.alpha * msg + (1.0 - self.alpha) * self._d_np(global_ids)

    def np_changed(self, old, new):
        import numpy as np

        return np.abs(new - old) > self.threshold


class StandardPageRank(VertexProgram):
    """TEXTBOOK PageRank with dangling-mass redistribution —
    ``r ← α·(Aᵀ_norm·r + g/n) + (1−α)/n`` where ``g = Σ_{od(v)=0} r(v)``
    is the rank parked on sinks this superstep, re-spread uniformly
    (Brin & Page 1998 / the Google matrix). The REFERENCE deliberately
    drops g (PageRankComputation.java:202-256 — reproduced faithfully by
    :class:`PageRank`, which re-normalizes post-hoc instead); this class
    is the standard-semantics variant users coming from NetworkX/GraphX
    expect. Rank mass is conserved every superstep (Σr = 1), so no final
    normalization.

    The dangling flag rides the state as a struct field (the
    FaBP/TrustRank statics pattern: value = struct(r, d)); the global
    scalar g uses the :meth:`VertexProgram.global_agg` hook — a 1-row
    broadcast crossJoin inside the superstep job, never a per-iteration
    driver collect. Flat plan only."""

    name = "standard_pagerank"
    needs_out_degree = True
    supports_blocked = False  # struct-valued state: flat plan only

    def __init__(self, dangling: DataFrame, alpha: float = PAGERANK_ALPHA,
                 threshold: float = CONVERGE_THRESHOLD):
        self.dangling = dangling  # (vertex) rows with zero out-degree
        self.alpha = alpha
        self.threshold = threshold

    def init_state(self, vertices: DataFrame, n: int) -> DataFrame:
        return (
            vertices.join(
                self.dangling.select("vertex", F.lit(1.0).alias("_d")),
                "vertex", "left",
            )
            .select(
                "vertex",
                F.struct(
                    F.lit(1.0 / n).alias("r"),
                    F.coalesce(F.col("_d"), F.lit(0.0)).alias("d"),
                ).alias("value"),
            )
        )

    def message(self) -> F.Column:
        return F.col("value").getField("r") / F.col("out_degree")

    def reduce_expr(self) -> F.Column:
        return F.sum("msg")

    def global_agg(self) -> F.Column:
        old = F.col("value")
        return F.sum(old.getField("r") * old.getField("d"))

    def apply(self, old, msg, n):
        new_r = (
            self.alpha
            * (F.coalesce(msg, F.lit(0.0)) + F.col("_gagg") / n)
            + (1.0 - self.alpha) / n
        )
        return F.struct(new_r.alias("r"), old.getField("d").alias("d"))

    def changed(self, old, new):
        return F.abs(new.getField("r") - old.getField("r")) > self.threshold

    def finalize(self, state: DataFrame) -> DataFrame:
        return state.select("vertex", F.col("value").getField("r").alias("value"))


class HittingProbability(VertexProgram):
    """k-step hitting probability of a target set S under the simple
    random walk: ``h(v) = P[walk started at v reaches S within k steps]``.

        h₀(v)   = 1 if v ∈ S else 0
        hₖ(v)   = 1                      if v ∈ S   (absorbing)
                  (Σ_{v→u} hₖ₋₁(u)) / od(v)  otherwise

    The classic absorbing-walk risk/influence score for web-scale link
    graphs (e.g. "how likely does a surfer starting here hit the spam
    set"); dual of :class:`TrustRank`, which pushes mass OUT of the seeds
    while this pulls reachability INTO them. The recurrence reads each
    vertex's OUT-neighbors, so the caller must feed gimv.run the
    TRANSPOSED edge table (algorithms.hitting_probability does) — then the
    superstep shape and cost are exactly PageRank's. h is monotone
    non-decreasing in k and converges to the absorption probability.

    Per-vertex statics (seed flag, ORIGINAL out-degree — not derivable
    from the transposed edges gimv sees) ride the state as struct fields,
    the FaBP/TrustRank pattern: state value = struct(h, seed, od);
    flat plan only.
    """

    name = "hitting_prob"
    needs_out_degree = False
    supports_blocked = False  # struct-valued state: flat plan only

    def __init__(self, seeds: DataFrame, out_degree: DataFrame,
                 threshold: float = CONVERGE_THRESHOLD):
        self.seeds = seeds            # (vertex) — the absorbing target set
        self.out_degree = out_degree  # (vertex, od) over the ORIGINAL edges
        self.threshold = threshold

    def init_state(self, vertices: DataFrame, n: int) -> DataFrame:
        seed = F.when(F.col("_is_seed").isNotNull(), 1.0).otherwise(0.0)
        return (
            vertices.join(
                self.seeds.select("vertex", F.lit(1).alias("_is_seed")),
                "vertex", "left",
            )
            .join(self.out_degree, "vertex", "left")
            .select(
                "vertex",
                F.struct(
                    seed.alias("h"),
                    seed.alias("seed"),
                    F.coalesce(F.col("od"), F.lit(0.0)).alias("od"),
                ).alias("value"),
            )
        )

    def message(self) -> F.Column:
        return F.col("value").getField("h")

    def message_filter(self) -> F.Column:
        # h=0 sources contribute nothing to a sum — pruning them is exact
        # (SSSP's unreached-source pattern) and keeps the message join
        # proportional to the reached frontier while it grows outward.
        return F.col("value").getField("h") > 0.0

    def reduce_expr(self) -> F.Column:
        return F.sum("msg")

    def apply(self, old, msg, n):
        od = old.getField("od")
        new_h = (
            F.when(old.getField("seed") == 1.0, 1.0)
            .when(od > 0, F.coalesce(msg, F.lit(0.0)) / od)
            .otherwise(0.0)
        )
        return F.struct(
            new_h.alias("h"), old.getField("seed").alias("seed"), od.alias("od")
        )

    def changed(self, old, new):
        return F.abs(new.getField("h") - old.getField("h")) > self.threshold

    def finalize(self, state: DataFrame) -> DataFrame:
        return state.select("vertex", F.col("value").getField("h").alias("value"))


class ConnectedComponents(VertexProgram):
    """HashMin / PEGASUS CC (CCComputation.java:140-197): propagate min
    label; exact fixpoint. Caller must symmetrize edges for WCC."""

    name = "cc"
    delta_messaging = True  # min semi-ring: frontier-only messaging is exact

    def init_state(self, vertices, n):
        return vertices.select("vertex", F.col("vertex").alias("value"))

    def message(self):
        return F.col("value")

    def reduce_expr(self):
        return F.min("msg")

    def apply(self, old, msg, n):
        return F.least(old, F.coalesce(msg, old))

    def changed(self, old, new):
        return new < old

    # blocked kernels: labels ride as float64 (exact below 2^53)
    reduce_np = "min"
    identity = float("inf")

    def np_init(self, global_ids, n):
        return global_ids.astype("float64")

    def np_apply(self, old, msg, has_msg, n):
        import numpy as np

        return np.where(has_msg, np.minimum(old, msg), old)

    def np_changed(self, old, new):
        return new < old


class SSSP(VertexProgram):
    """Weighted single-source shortest paths (SSSPComputation.java:104-212):
    init 0 at source / MAX/2 elsewhere, relax min(d[src] + w)."""

    name = "sssp"
    weighted = True
    delta_messaging = True  # min semi-ring: frontier-only messaging is exact

    def __init__(self, source_vertex: int):
        self.source_vertex = source_vertex

    def init_state(self, vertices, n):
        return vertices.select(
            "vertex",
            F.when(F.col("vertex") == self.source_vertex, 0.0)
            .otherwise(SSSP_INF)
            .alias("value"),
        )

    def message_filter(self):
        return F.col("value") < SSSP_INF  # only reached vertices relax

    def message(self):
        return F.col("value") + F.col("weight")

    def reduce_expr(self):
        return F.min("msg")

    def apply(self, old, msg, n):
        return F.least(old, F.coalesce(msg, old))

    def changed(self, old, new):
        return new < old

    reduce_np = "min"
    identity = float("inf")

    def np_init(self, global_ids, n):
        import numpy as np

        return np.where(global_ids == self.source_vertex, 0.0, SSSP_INF)

    def np_signal(self, values, out_degree):
        import numpy as np

        # unreached sources must not relax: emit inf so min() ignores them
        return np.where(values < SSSP_INF, values, np.inf)

    def np_message(self, signal_at_src, weights):
        return signal_at_src + (weights if weights is not None else 1.0)

    def np_apply(self, old, msg, has_msg, n):
        import numpy as np

        return np.where(has_msg, np.minimum(old, msg), old)

    def np_changed(self, old, new):
        return new < old


class WLRefinement(VertexProgram):
    """Weisfeiler–Lehman color refinement (1-WL): per round,

      color'(v) = H( color(v), Σ_{u→v} H(color(u)) )

    — the commutative hash-sum variant of the classic sorted-multiset
    relabeling (Shervashidze et al., JMLR 2011 WL kernels), so one round
    is exactly a GIM-V superstep: combine2 = H(color), combineAll = sum,
    apply = rehash with the old color. The sum rides decimal(38,0)
    (ANSI-safe; Σ of 2^60-bounded hashes needs > 63 bits at fan-in ≥ 8)
    and H is the sha256-derived :func:`sketches.sha_long`, so DuckDB
    replays every round bit-for-bit. After h rounds two vertices share a
    color iff their depth-h unfoldings are 1-WL-equivalent (modulo hash
    collisions: ≤ n²/2^61 pair probability) — the vertex-symmetry /
    graph-dedup primitive. Callers symmetrize for the standard undirected
    semantics; run a FIXED round count (colors re-hash every round, so
    per-vertex value convergence never happens; partition stabilization
    is #distinct(new) == #distinct(old), checked by the caller)."""

    name = "wl_refinement"
    supports_blocked = False  # decimal-sum combineAll: flat plan only

    def init_state(self, vertices, n):
        return vertices.select("vertex", F.lit(0).cast("long").alias("value"))

    def message(self):
        from flexgraph_spark.sketches import sha_long

        return sha_long(F.col("value"), "wl-n")

    def aggregate(self, messages):
        return messages.groupBy(F.col("dst").alias("vertex")).agg(
            F.sum(F.col("msg").cast("decimal(38,0)")).alias("msg")
        )

    def apply(self, old, msg, n):
        from flexgraph_spark.sketches import sha_long

        pre = F.concat_ws(
            ":",
            old.cast("string"),
            F.coalesce(msg.cast("string"), F.lit("-")),
        )
        return sha_long(pre, "wl-c")

    def changed(self, old, new):
        return new != old


class EarliestArrival(VertexProgram):
    """Time-respecting earliest-arrival reachability on a TEMPORAL graph:
    edges carry a timestamp t (riding the ``weight`` column), and an edge
    (u, v, t) is traversable only if t >= arrival(u) — departures cannot
    precede arrival. The state is the earliest feasible arrival time, a
    min semi-ring with a per-edge eligibility condition folded into
    combine2:

      combine2    = t + dur        if t >= arrival(u), else no message
      combineAll  = min
      apply       = least(old, msg)

    (Wu et al., "Path Problems in Temporal Graphs", VLDB 2014 — the
    one-pass streaming algorithm is inherently sequential; this is the
    label-correcting fixpoint form, which is exactly GIM-V-shaped.)
    Parallel temporal edges are REAL here — (u, v) at t=3 and t=7 are
    different opportunities — so callers must NOT dedupe (src, dst).

    Delta messaging stays exact: arrival(u) is monotone non-increasing,
    so the eligible edge set {t >= arrival(u)} only grows, and each
    eligible edge's message is the constant t + dur — an unchanged source
    has already sent everything it ever will.

    Blocked engine: the eligibility condition lives in np_message (the
    kernels receive the per-edge timestamp array), so the skew-aware CSR
    plan runs it unchanged; the block builder keeps parallel temporal
    edges as separate nnz.
    """

    name = "earliest_arrival"
    weighted = True  # the edge timestamp rides the weight column
    supports_blocked = True
    reduce_np = "min"
    identity = float("inf")
    delta_messaging = True  # min semi-ring: frontier-only messaging is exact

    def __init__(self, source_vertex: int, start_time: float = 0.0,
                 dur: float = 0.0):
        self.source_vertex = int(source_vertex)
        self.start_time = float(start_time)
        self.dur = float(dur)

    def init_state(self, vertices, n):
        return vertices.select(
            "vertex",
            F.when(F.col("vertex") == self.source_vertex, self.start_time)
            .otherwise(SSSP_INF)
            .alias("value"),
        )

    def message_filter(self):
        return F.col("value") < SSSP_INF  # only reached vertices depart

    def message(self):
        # ineligible edge -> NULL; min() skips nulls, and an all-null dst
        # aggregates to NULL msg, which apply() coalesces away
        return F.when(
            F.col("weight") >= F.col("value"), F.col("weight") + self.dur
        )

    def reduce_expr(self):
        return F.min("msg")

    def apply(self, old, msg, n):
        return F.least(old, F.coalesce(msg, old))

    def changed(self, old, new):
        return new < old

    def np_init(self, global_ids, n):
        import numpy as np

        return np.where(
            global_ids == self.source_vertex, self.start_time, SSSP_INF
        )

    def np_signal(self, values, out_degree):
        import numpy as np

        # unreached sources must not depart: emit inf so min() ignores them
        return np.where(values < SSSP_INF, values, np.inf)

    def np_message(self, signal_at_src, weights):
        import numpy as np

        if weights is None:
            raise ValueError("temporal kernels need edge timestamps")
        return np.where(
            weights >= signal_at_src, weights + self.dur, np.inf
        )

    def np_apply(self, old, msg, has_msg, n):
        import numpy as np

        return np.where(has_msg, np.minimum(old, msg), old)

    def np_changed(self, old, new):
        return new < old


class BatchEarliestArrival(VertexProgram):
    """Earliest arrival from ONE source at k different START TIMES — the
    state is an array of k arrival columns, one per candidate departure,
    so a single edge scan + state shuffle per superstep serves all k.
    This is the engine of the exact FASTEST-PATH computation (Wu et al.,
    VLDB 2014): the optimal departure from the source is always one of
    its out-edge timestamps, so fastest(v) = min_j (arrival_j(v) -
    start_j) over those k starts. Per column the recurrence is exactly
    :class:`EarliestArrival`; ineligible or unreached entries ride as
    NULL inside the message array and min()/least() skip them. Blocked:
    the 'batch' kernel family under the min reduce, with the eligibility
    condition broadcast per-edge across all k columns in np_message."""

    name = "batch_earliest_arrival"
    weighted = True  # the edge timestamp rides the weight column
    supports_blocked = True
    blocked_kind = "batch"
    reduce_np = "min"
    identity = float("inf")
    delta_messaging = True  # min semi-ring: frontier-only messaging is exact

    def __init__(self, source_vertex: int, start_times: list[float],
                 dur: float = 0.0):
        if not start_times:
            raise ValueError("BatchEarliestArrival needs at least one start time")
        self.source_vertex = int(source_vertex)
        self.starts = [float(t) for t in start_times]
        self.k = len(self.starts)
        self.dur = float(dur)

    def init_state(self, vertices, n):
        arr = F.array(*[
            F.when(F.col("vertex") == self.source_vertex, t)
            .otherwise(SSSP_INF)
            for t in self.starts
        ])
        return vertices.select("vertex", arr.alias("value"))

    def message_filter(self):
        return F.exists(F.col("value"), lambda x: x < SSSP_INF)

    def message(self):
        return F.transform(
            F.col("value"),
            lambda x: F.when(
                (x < SSSP_INF) & (F.col("weight") >= x),
                F.col("weight") + self.dur,
            ),
        )

    def aggregate(self, messages):
        return messages.groupBy(F.col("dst").alias("vertex")).agg(
            F.array(*[
                F.min(F.element_at("msg", i + 1)) for i in range(self.k)
            ]).alias("msg")
        )

    def apply(self, old, msg, n):
        return F.zip_with(
            old, F.coalesce(msg, old), lambda o, v: F.least(o, v)
        )

    def changed(self, old, new):
        return F.exists(
            F.zip_with(old, new, lambda o, v: v < o), lambda b: b
        )

    # --- blocked 'batch' kernels (min): values arrive as (rows, k) views ---
    def np_init(self, global_ids, n):
        import numpy as np

        mat = np.full((len(global_ids), self.k), SSSP_INF, dtype=np.float64)
        mat[global_ids == self.source_vertex] = np.asarray(
            self.starts, dtype=np.float64
        )
        return mat

    def np_signal(self, values, out_degree):
        import numpy as np

        return np.where(values < SSSP_INF, values, np.inf)

    def np_message(self, signal_at_src, weights):
        import numpy as np

        if weights is None:
            raise ValueError("temporal kernels need edge timestamps")
        w = weights[:, None]
        return np.where(w >= signal_at_src, w + self.dur, np.inf)

    def np_apply(self, old, msg, has_msg, n):
        import numpy as np

        # msg is identity (inf) where nothing arrived — neutral under min
        return np.minimum(old, msg)

    def np_changed(self, old, new):
        return (new < old).any(axis=1)


class SSSPTree(VertexProgram):
    """SSSP with the shortest-path TREE — distances alone (class:`SSSP`)
    can't answer "route me there" or "why is this vertex reachable";
    production wants the parent pointer. State value =
    ``struct(dist, parent)`` and the whole semi-ring rides Spark's
    lexicographic struct ordering:

      combine2    = struct(dist(u) + w(u,v), u)
      combineAll  = min(struct)   — min dist, ties → LOWEST parent id
      apply       = least(old, msg)

    so the tree is deterministic under ties with zero extra machinery.
    Monotone decreasing structs ⇒ the convergence vote and frontier/delta
    messaging stay exact (a re-parented-but-equidistant vertex re-sends
    once, harmless — its outgoing messages don't depend on its parent).
    parent = -1 marks the source and unreached vertices. Positive weights
    assumed (the SSSP contract, SSSPComputation.java:104-212); flat plan
    only (struct-valued state)."""

    name = "sssp_tree"
    weighted = True
    supports_blocked = False  # struct-valued state: flat plan only
    delta_messaging = True

    def __init__(self, source_vertex: int):
        self.source_vertex = source_vertex

    def init_state(self, vertices, n):
        return vertices.select(
            "vertex",
            F.struct(
                F.when(F.col("vertex") == self.source_vertex, 0.0)
                .otherwise(SSSP_INF).alias("dist"),
                F.lit(-1).cast("long").alias("parent"),
            ).alias("value"),
        )

    def message_filter(self):
        return F.col("value").getField("dist") < SSSP_INF

    def message(self):
        return F.struct(
            (F.col("value").getField("dist") + F.col("weight")).alias("dist"),
            F.col("src").alias("parent"),
        )

    def reduce_expr(self):
        return F.min("msg")

    def apply(self, old, msg, n):
        return F.least(old, F.coalesce(msg, old))

    def changed(self, old, new):
        return new < old


class RootedBFS(VertexProgram):
    """CC *with BFS distance*: state value = ``struct(root, dist)`` under
    the lexicographic min semi-ring —

      combine2    = struct(root(u), dist(u) + 1)
      combineAll  = min(struct)   — smallest root, ties → smallest dist
      apply       = least(old, msg)

    which converges to (component min id, shortest unweighted distance
    from that root) on symmetrized edges: HashMin CC
    (`pegasus ConnectedComponent` lineage, like :class:`ConnectedComponents`)
    fused with a unit-weight Bellman–Ford in ONE program, at the same
    per-superstep cost as CC alone. All-integer state, so SQL replays it
    exactly (encode root·2^20 + dist: a message is just enc + 1). Feeds
    :func:`flexgraph_spark.algorithms.bipartite_check` (dist parity) and
    any per-component BFS layering. Monotone decreasing structs ⇒
    convergence vote and frontier/delta messaging exact. Flat plan only
    (struct-valued state)."""

    name = "rooted_bfs"
    weighted = False
    supports_blocked = False
    delta_messaging = True

    def init_state(self, vertices, n):
        return vertices.select(
            "vertex",
            F.struct(
                F.col("vertex").alias("root"),
                F.lit(0).cast("long").alias("dist"),
            ).alias("value"),
        )

    def message(self):
        return F.struct(
            F.col("value").getField("root").alias("root"),
            (F.col("value").getField("dist") + F.lit(1).cast("long")).alias(
                "dist"
            ),
        )

    def reduce_expr(self):
        return F.min("msg")

    def apply(self, old, msg, n):
        return F.least(old, F.coalesce(msg, old))

    def changed(self, old, new):
        return new < old


class BatchSSSP(VertexProgram):
    """Multi-source shortest paths (landmark distances): the state value
    is an array<double> of k distances — one min-plus column per landmark
    — so ONE edge scan + ONE state shuffle per superstep serves all k
    sources, the :class:`BatchPPR` batch-column trick transplanted onto
    the min semi-ring. This is the landmark building block for web-scale
    distance estimation (Das Sarma et al. distance sketches; Bourgain-
    style embeddings): at 100 TB, k landmark SSSP trees cost one edge
    scan per superstep instead of k independent jobs each rescanning the
    corpus.

    Per column the recurrence is exactly :class:`SSSP`
    (SSSPComputation.java:104-212): init 0 at the landmark / MAX/2
    elsewhere, relax ``min(d[src] + w)``. No per-column message filter is
    possible on an array state, and none is needed: a source unreached in
    column j emits ``SSSP_INF + w`` there, which loses every min against
    both the receiver's SSSP_INF and any real distance, so the unreached
    column is a no-op by arithmetic (the vertex-level filter — reached in
    at least one column — plus frontier/delta messaging prune the rest).
    ``aggregate`` is k scalar mins, not a UDAF, so the map-side combine
    still collapses per-dst fan-in before the shuffle. Frontier/delta
    messaging stays exact per column (idempotent-monotone min; a vertex
    whose columns all stood still has already been heard).

    Blocked engine: the ``batch`` kernel family under the min reduce —
    one (n_local × k) CSR gather-scatter per superstep serves all k
    landmark columns on the skew-aware plan, same as BatchPPR for sum."""

    name = "batch_sssp"
    weighted = True
    supports_blocked = True
    blocked_kind = "batch"
    reduce_np = "min"
    identity = float("inf")
    delta_messaging = True  # min semi-ring: frontier-only messaging is exact

    def __init__(self, sources: list[int]):
        if not sources:
            raise ValueError("BatchSSSP needs at least one source vertex")
        self.sources = [int(s) for s in sources]
        self.k = len(self.sources)

    def init_state(self, vertices, n):
        arr = F.array(*[
            F.when(F.col("vertex") == s, 0.0).otherwise(SSSP_INF)
            for s in self.sources
        ])
        return vertices.select("vertex", arr.alias("value"))

    def message_filter(self):
        return F.exists(F.col("value"), lambda x: x < SSSP_INF)

    def message(self):
        return F.transform(F.col("value"), lambda x: x + F.col("weight"))

    def aggregate(self, messages):
        return messages.groupBy(F.col("dst").alias("vertex")).agg(
            F.array(*[
                F.min(F.element_at("msg", i + 1)) for i in range(self.k)
            ]).alias("msg")
        )

    def apply(self, old, msg, n):
        return F.zip_with(
            old, F.coalesce(msg, old), lambda o, v: F.least(o, v)
        )

    def changed(self, old, new):
        return F.exists(
            F.zip_with(old, new, lambda o, v: v < o), lambda b: b
        )

    # --- blocked 'batch' kernels (min): values arrive as (rows, k) views ---
    def np_init(self, global_ids, n):
        import numpy as np

        mat = np.full((len(global_ids), self.k), SSSP_INF, dtype=np.float64)
        for j, s in enumerate(self.sources):
            mat[global_ids == s, j] = 0.0
        return mat

    def np_signal(self, values, out_degree):
        import numpy as np

        # unreached columns must not relax: emit inf so min() ignores them
        return np.where(values < SSSP_INF, values, np.inf)

    def np_message(self, signal_at_src, weights):
        return signal_at_src + (
            weights[:, None] if weights is not None else 1.0
        )

    def np_apply(self, old, msg, has_msg, n):
        import numpy as np

        # msg is identity (inf) where nothing arrived — neutral under min,
        # so no has_msg mask is needed per column
        return np.minimum(old, msg)

    def np_changed(self, old, new):
        return (new < old).any(axis=1)


class LongestPath(VertexProgram):
    """DAG longest-path depth — the max-plus semi-ring GIM-V
    instantiation: ``depth(v) = max(0, max_{u→v} depth(u) + 1)``, init 0.
    On an import/dependency DAG this is the build-stage number (files at
    depth d can compile once every depth < d is done) — the natural
    dependency metric for the source-repo link graph this engine targets.

    combine2 = depth+1, combineAll = max, apply = max(old, msg): the same
    idempotent-monotone shape as HashMin CC mirrored upward, so frontier/
    delta messaging is exact (a vertex whose depth didn't grow re-sends
    nothing new). Converges in longest-path-length supersteps on a DAG;
    on a graph WITH cycles the recurrence has no fixpoint (depth grows
    around the cycle forever) — callers must condense SCCs first or cap
    ``max_iter`` (algorithms.dag_depth documents the contract). Flat plan
    only (blocked kernel families are sum/min)."""

    name = "dag_depth"
    supports_blocked = False
    delta_messaging = True  # idempotent max: frontier-only is exact

    def init_state(self, vertices, n):
        return vertices.select("vertex", F.lit(0.0).alias("value"))

    def message(self):
        return F.col("value") + F.lit(1.0)

    def reduce_expr(self):
        return F.max("msg")

    def apply(self, old, msg, n):
        return F.greatest(old, F.coalesce(msg, old))

    def changed(self, old, new):
        return new > old


class LabelPropagation(VertexProgram):
    """Synchronous label propagation: adopt the majority neighbor label,
    deterministic tie-break = lowest label. The semi-ring is NOT a scalar
    fold (per-label counts then argmax — SURVEY.md §2.2), so ``aggregate``
    is a two-level aggregation: groupBy(dst,label).count, then
    max_by(label, (count, -label)). Runs on symmetrized edges; capped
    iterations guard bipartite oscillation.

    The blocked engine runs it on the ``label_count`` kernel family
    (blocks.run_blocked): gathers emit per-(dst, label) count partials,
    the fused reduce merges counts and applies the same argmax/tie rule.
    Labels ride as float64 (exact below 2^53)."""

    name = "label_propagation"
    blocked_kind = "label_count"  # non-scalar semi-ring: count partials

    def init_state(self, vertices, n):
        return vertices.select("vertex", F.col("vertex").alias("value"))

    def np_init(self, global_ids, n):
        return global_ids.astype("float64")

    def message(self):
        return F.col("value")

    def aggregate(self, messages: DataFrame) -> DataFrame:
        counts = messages.groupBy("dst", "msg").agg(F.count("*").alias("cnt"))
        return counts.groupBy(F.col("dst").alias("vertex")).agg(
            F.max_by("msg", F.struct(F.col("cnt"), (-F.col("msg")).alias("neg"))).alias("msg")
        )

    def apply(self, old, msg, n):
        return F.coalesce(msg, old)

    def changed(self, old, new):
        return new != old


class WeightedLabelPropagation(VertexProgram):
    """Label propagation with WEIGHTED votes — adopt the label whose
    incident edge-weight sum is largest (ties → lowest label), the LP
    variant for similarity/affinity graphs where edge strength matters
    (e.g. a near-dup similarity graph: a 0.9-similar neighbor should
    outvote three 0.3-similar ones). Same two-level aggregation shape as
    :class:`LabelPropagation` with sum(weight) replacing count(*); the
    per-edge message is a struct(label, weight) so one message column
    still carries the whole semi-ring. Callers should feed an undirected
    graph with ONE canonical weight per pair (algorithms.
    weighted_label_propagation sums directed duplicates first).
    Integer-valued weights keep tie detection exact on both the engine
    and the oracle.

    The blocked engine runs it on the ``label_count`` kernel family with
    WEIGHTED votes: gathers emit per-(dst, label) weight-SUM partials
    (blocks._scatter_label's ``w`` argument — edge weights ride the CSR
    blocks), and the fused merge/argmax reduce is unchanged (count
    partials and weight partials are both float64 and sum the same
    way). Same argmax/lowest-label-tie rule on both plans."""

    name = "weighted_label_propagation"
    weighted = True
    supports_blocked = True
    blocked_kind = "label_count"

    def init_state(self, vertices, n):
        return vertices.select("vertex", F.col("vertex").alias("value"))

    def np_init(self, global_ids, n):
        return global_ids.astype("float64")

    def message(self):
        return F.struct(
            F.col("value").alias("lab"), F.col("weight").alias("w")
        )

    def aggregate(self, messages: DataFrame) -> DataFrame:
        votes = messages.select(
            "dst",
            F.col("msg").getField("lab").alias("lab"),
            F.col("msg").getField("w").alias("w"),
        ).groupBy("dst", "lab").agg(F.sum("w").alias("cnt"))
        return votes.groupBy(F.col("dst").alias("vertex")).agg(
            F.max_by(
                "lab", F.struct(F.col("cnt"), (-F.col("lab")).alias("neg"))
            ).alias("msg")
        )

    def apply(self, old, msg, n):
        return F.coalesce(msg, old)

    def changed(self, old, new):
        return new != old


def run(
    edges: DataFrame,
    program: VertexProgram,
    max_iter: int = 100,
    num_partitions: int | None = None,
    checkpointer: "Checkpointer | None" = None,
    vertices: DataFrame | None = None,
    with_skew_metric: bool = False,
    initial_state: DataFrame | None = None,
) -> GimvResult:
    """Run a vertex program to convergence with the flat plan.

    ``edges``: (src, dst[, weight]). ``checkpointer``: optional
    flexgraph_spark.checkpoint.Checkpointer for durable resume; without it,
    lineage is truncated via localCheckpoint each superstep.

    ``initial_state``: optional (vertex, value) warm start — e.g.
    yesterday's converged state before today's crawl delta. Vertices
    missing from it fall back to the program's own init (new vertices get
    the cold-start value); vertices in it but absent from the graph are
    dropped. For contraction fixpoints (PageRank/RWR) the fixpoint is
    unique, so a warm start converges to the SAME answer in fewer
    supersteps — incremental recompute without incremental bookkeeping.
    Ignored when a checkpoint resume is available (resume is the stronger
    contract). Delta messaging restarts conservatively (everyone re-sends
    once).
    """
    from flexgraph_spark.checkpoint import Checkpointer  # noqa: F401 (typing)

    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("vertex"))
            .union(edges.select(F.col("dst").alias("vertex")))
            .distinct()
        )

    # Pre-join static per-source data once; repartition edges by src so every
    # superstep's join reuses one stable partitioning (no per-iteration edge
    # shuffle — only state moves).
    edge_cols = ["src", "dst"] + (["weight"] if program.weighted else [])
    e = edges.select(*edge_cols)
    if program.needs_out_degree:
        # weighted programs that normalize by weight mass (weighted
        # PageRank) need sum(weight), not the edge count
        deg_expr = (
            F.sum("weight")
            if program.weighted and getattr(program, "weighted_degree", False)
            else F.count("*")
        )
        deg = e.groupBy("src").agg(deg_expr.alias("out_degree"))
        e = e.join(deg, "src")
    e = e.repartition(p, "src").persist()
    edges_count = e.count()  # materialize once; also = edges scanned / superstep

    vertices = vertices.repartition(p, "vertex").persist()
    n = vertices.count()
    if n == 0:
        e.unpersist()
        vertices.unpersist()
        empty = spark.createDataFrame([], "vertex long, value double")
        return GimvResult(state=empty, iterations=0, converged=True, metrics=[])

    delta = program.delta_messaging
    start_iter = 0
    state = None
    if checkpointer is not None:
        resumed = checkpointer.resume(program.name)
        if resumed is not None:
            start_iter, state = resumed
            if delta and "_active" not in state.columns:
                # pre-delta checkpoint: everyone re-sends once (exact, just
                # one conservative superstep)
                state = state.withColumn("_active", F.lit(1))
    if state is None:
        state = program.init_state(vertices, n)
        if initial_state is not None:
            # warm start: prior values win where present, cold init fills
            # the gap; inner-join on vertices drops departed vertices
            state = (
                state.withColumnRenamed("value", "_cold")
                .join(
                    initial_state.select("vertex", F.col("value").alias("_warm")),
                    "vertex",
                    "left",
                )
                .select("vertex", F.coalesce("_warm", "_cold").alias("value"))
            )
        state = state.repartition(p, "vertex")
        if delta:
            state = state.withColumn("_active", F.lit(1))
        state = truncate_plan(state)

    metrics: list[IterationMetrics] = []
    converged = False
    it = start_iter
    # AQE off for the superstep loop only: the per-superstep plan shape is
    # fixed and known, so AQE's query-stage materialization barriers and
    # re-planning only add latency (~2x per-superstep at 8 cores, measured).
    # One-off work above (degree join, init) keeps whatever the session set.
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for it in range(start_iter + 1, max_iter + 1):
            t0 = time.time()
            src_state = state.withColumnRenamed("vertex", "src")
            if delta:
                # frontier pruning: only sources that changed last superstep
                # message — the convergent tail joins edges against a
                # shrinking frontier instead of the full state, and
                # messages_shuffled decays toward zero.
                src_state = src_state.filter(F.col("_active") == 1).drop("_active")
            mf = program.message_filter()
            if mf is not None:
                src_state = src_state.filter(mf)
            # shuffle_hash hint: build a per-partition hash map from the (small)
            # state side. Without it Catalyst broadcasts the EDGE table when its
            # stats fit the threshold — a per-iteration driver collect+broadcast
            # of the big side, exactly wrong at scale. With it, the cached edges
            # keep their src partitioning (zero edge movement per superstep) and
            # only the state shuffles; no sort (SHJ, not SMJ).
            joined = e.join(src_state.hint("shuffle_hash"), "src")
            msg_obs = Observation()
            messages = joined.select(F.col("dst"), program.message().alias("msg")).observe(
                msg_obs, F.count(F.lit(1)).alias("m")
            )
            aggregated = program.aggregate(messages)

            # aggregated arrives hash-partitioned by vertex (= dst of groupBy),
            # so the left join re-shuffles only the state; no extra repartition.
            # Convergence voting piggybacks on the SAME job that materializes the
            # checkpoint (Observation) — no separate aggregate job per superstep.
            conv_obs = Observation()
            base = state.withColumnRenamed("value", "_old").drop("_active")
            gexpr = program.global_agg()
            if gexpr is not None:
                # 1-row aggregate over the (cached) state, broadcast into
                # every row — the declarative way to a per-superstep global
                # scalar (no driver action, same job)
                base = base.crossJoin(
                    F.broadcast(state.agg(gexpr.alias("_gagg")))
                )
            new_state = (
                base
                .join(aggregated.withColumnRenamed("msg", "_msg"), "vertex", "left")
                .select(
                    "vertex",
                    program.apply(F.col("_old"), F.col("_msg"), n).alias("value"),
                    program.changed(
                        F.col("_old"), program.apply(F.col("_old"), F.col("_msg"), n)
                    ).cast("int").alias("_changed"),
                )
                .observe(conv_obs, F.sum("_changed").alias("changed"))
            )
            # changed vertices ARE next superstep's frontier
            new_state = (
                new_state.withColumnRenamed("_changed", "_active")
                if delta
                else new_state.drop("_changed")
            )

            # Materialize + truncate lineage; durable parquet when resumable.
            if checkpointer is not None:
                new_state = checkpointer.save(program.name, it, new_state)
            else:
                new_state = truncate_plan(new_state)

            changed = int(conv_obs.get["changed"] or 0)

            skew = 1.0
            if with_skew_metric:
                # max/mean messages per dst shuffle bucket — the skew the dense
                # path exists to fix (hub fan-in concentrating one reducer).
                sizes = (
                    messages.groupBy(F.pmod(F.col("dst"), F.lit(p)).alias("bucket"))
                    .count()
                    .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
                    .first()
                )
                if sizes and sizes["avg"]:
                    skew = float(sizes["mx"]) / float(sizes["avg"])

            m = IterationMetrics(
                iteration=it,
                messages_shuffled=int(msg_obs.get["m"]),
                changed=changed,
                edges_scanned=edges_count,
                seconds=time.time() - t0,
                skew_ratio=skew,
            )
            metrics.append(m)
            if checkpointer is not None:
                checkpointer.record_metrics(program.name, m)

            old_state = state
            state = new_state
            if hasattr(old_state, "unpersist"):
                old_state.unpersist()
            if changed == 0:
                converged = True
                break

    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    final = program.finalize(state.drop("_active"))
    e.unpersist()
    vertices.unpersist()
    return GimvResult(state=final, iterations=it, converged=converged, metrics=metrics)
