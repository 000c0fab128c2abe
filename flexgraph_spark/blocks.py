"""M2 — FlexGraph-style block prepartitioning + skew-aware blocked superstep.

Re-expresses the reference's core contribution (hybrid vertex-cut/edge-cut
via degree-based dense/sparse edge placement — SURVEY.md §1.4, reference
UnweightedGraphPrepartitioning.java:169-244, ComputationInputFormat.java:102-123)
in Spark terms:

* **Grid**: edge (src, dst) lands in block (block_row = dst % p,
  block_col = src % p); local ids are ``global // p`` (int32, same split as
  the reference's IDUtils.java:23-37).
* **CSR blocks**: one DataFrame row per (block_row, block_col, is_dense)
  holding Arrow array columns (src_local[], deg[], gdeg[], dst_local[],
  weight[]?) — the reference's custom binary block files collapse into
  Parquet structs. ``gdeg`` carries each source's GLOBAL out-degree with the
  block, so supersteps never re-join a degree table (the reference bakes
  degrees into its block files the same way,
  GraphPrepartitioningReducer.java:84-127).
* **Dense/sparse split**: a source with global out-degree ≥ threshold is a
  hub ("dense"); threshold < 0 ⇒ all sparse, == 0 ⇒ all dense (degenerate
  modes, Constants.java:25-27 / ComputationMapper.java:173-176).
* **Superstep**: sparse columns join the (small, p-row) blocked state on
  block_col and gather/scatter inside a pandas UDF; dense blocks receive
  only the HUB signals — which ride ON the state as a ``hub_sigs`` column
  (computed during the previous apply, so the dense republish costs zero
  extra stages) and broadcast-join into the dense blocks, O(#hubs) network
  per superstep — the reference's dv trick (ComputationMapper.java:217-240)
  with no driver round trip. Partials shuffle-reduce on block_row; reduce +
  apply + convergence vote + next hub-signal extraction are ONE fused
  cogroup kernel.
* **Hub metadata never touches the driver**: each merged dense column
  carries its sorted hub-local + global-degree arrays as columns
  (computed inside the executor-side merge), and the state side reads the
  same arrays via a broadcast join against the tiny per-column ``hub_meta``
  DataFrame — at 10^10 vertices with ~1% hubs nothing hub-proportional is
  collected as Python rows.
* **Frontier/delta messaging** (min semi-rings — CC, SSSP): the state
  carries a per-vertex ``active`` mask (= changed last superstep). Inactive
  sources' signals are masked to the reduce identity, so their
  contributions vanish from the compacted partials, and columns with no
  active source are skipped outright — the convergent tail's shuffle decays
  toward zero (the reference's nonzero-only intermediate vectors,
  cache/DoubleVectorCache.java:68-101, ComputationMapper.java:154-171).
* **Label propagation** runs on a non-scalar ``label_count`` kernel family:
  gathers emit per-(dst, label) count partials, the fused reduce merges
  counts and picks argmax (lowest-label ties) — the same two-level
  aggregation as the flat plan, blocked.

All Python execution is Arrow-batched NumPy over whole blocks — no per-row
Python anywhere.

Scale notes: p must grow with the cluster so each block's arrays stay
within executor memory (n/p state doubles + E/p² edges per block; assert
n/p < 2^31 like the reference). ``auto_p`` codifies the measured rule of
thumb (BENCH/BASELINE.md round 2): p ≈ max(cores, E / 3M) so each merged
column carries a few million edges. The blocked state is (p rows × n/p
array entries); joins on ``block`` are trivially co-partitioned. The
degenerate all-dense mode (threshold == 0) treats every vertex as a hub and
so broadcasts the full state — that is the reference's semantics for it,
not the scale path.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flexgraph_spark.gimv import GimvResult, IterationMetrics, VertexProgram

DENSE_THRESHOLD_DEFAULT = 100  # Constants.java:26
AUTO_EDGES_PER_BLOCK = 3_000_000  # measured rule of thumb, BENCH/BASELINE.md


def auto_p(n_edges: int, cores: int) -> int:
    """p ≈ max(8, E / 3M): a few million edges per merged column so the
    per-block Arrow/NumPy fixed cost amortizes, floored at 8 columns.

    Round 4 measurement killed the earlier ``cores`` floor: at both 591k
    edges (p=8: 0.62s/superstep vs p=32: 0.78s) and 50M edges (p=16:
    1.34s vs p=32: 2.04s) on 32 cores the optimum sits BELOW the core
    count — column-stage parallelism does not pay for a finer grid's
    fixed cost; the shuffle-reduce between stages already uses every
    core. The E/3M term is what scales: on a real cluster the edge
    volume, not the core count, sets the grid (100B edges → p ≈ 33k)."""
    if n_edges <= 0:
        return 8
    return max(8, -(-n_edges // AUTO_EDGES_PER_BLOCK))


def suggest_dense_threshold(
    edges: DataFrame, hub_fraction: float = 0.001, floor: int = 2
) -> int:
    """Pick the dense/sparse cutoff from the out-degree distribution — the
    reference does this offline from the degree histogram (SURVEY.md §3.3).

    Returns the degree at the (1 - hub_fraction) quantile: roughly the top
    ``hub_fraction`` of sources become hubs, which bounds the per-superstep
    dense republish at O(hub_fraction · n) values. approx-quantile, one
    pass, no collect of the histogram."""
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    q = deg.approxQuantile("d", [1.0 - hub_fraction], 0.001)
    if not q:
        return DENSE_THRESHOLD_DEFAULT
    return max(floor, int(q[0]))

_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("block_row", T.IntegerType(), False),
        T.StructField("block_col", T.IntegerType(), False),
        T.StructField("is_dense", T.BooleanType(), False),
        T.StructField("src_local", T.ArrayType(T.IntegerType()), False),
        T.StructField("deg", T.ArrayType(T.IntegerType()), False),
        T.StructField("gdeg", T.ArrayType(T.IntegerType()), False),
        T.StructField("dst_local", T.ArrayType(T.IntegerType()), False),
        T.StructField("weight", T.ArrayType(T.DoubleType()), True),
    ]
)

# partials: one row per (column, row-block); scalar kernels fill (dst_local,
# vals); label_count kernels add the per-(dst,label) ``lab`` array
_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("block", T.IntegerType(), False),
        T.StructField("dst_local", T.ArrayType(T.IntegerType()), False),
        T.StructField("vals", T.ArrayType(T.DoubleType()), False),
        T.StructField("lab", T.ArrayType(T.DoubleType()), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("block", T.IntegerType(), False),
        T.StructField("values", T.ArrayType(T.DoubleType()), False),
        T.StructField("hub_sigs", T.ArrayType(T.DoubleType()), False),
        T.StructField("active", T.ArrayType(T.BooleanType()), False),
    ]
)


def _build_csr(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (block_row, block_col, is_dense) group -> one CSR row."""
    has_w = "weight" in pdf.columns
    order = np.lexsort((pdf["dst_local"].to_numpy(), pdf["src_local"].to_numpy()))
    src = pdf["src_local"].to_numpy()[order]
    dst = pdf["dst_local"].to_numpy()[order]
    gd = pdf["_gdeg"].to_numpy()[order]
    w = pdf["weight"].to_numpy()[order] if has_w else None
    uniq, first, counts = np.unique(src, return_index=True, return_counts=True)
    return pd.DataFrame(
        {
            "block_row": [int(pdf["block_row"].iloc[0])],
            "block_col": [int(pdf["block_col"].iloc[0])],
            "is_dense": [bool(pdf["is_dense"].iloc[0])],
            "src_local": [uniq.astype(np.int32)],
            "deg": [counts.astype(np.int32)],
            "gdeg": [gd[first].astype(np.int32)],
            "dst_local": [dst.astype(np.int32)],
            "weight": [w.astype(np.float64) if w is not None else None],
        }
    )


def prepartition(
    edges: DataFrame,
    p: int,
    dense_threshold: int = DENSE_THRESHOLD_DEFAULT,
    weighted: bool = False,
) -> DataFrame:
    """edges (src, dst[, weight]) -> CSR block DataFrame (_BLOCK_SCHEMA).

    Dense classification is by *global* out-degree (≥ threshold ⇒ dense,
    UnweightedGraphPrepartitioning.java:226); threshold < 0 ⇒ all sparse,
    0 ⇒ all dense. The global out-degree travels with each block (``gdeg``)
    so the superstep never joins a degree table.
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("_gdeg"))
    e = edges.join(deg, "src")
    if dense_threshold < 0:
        is_dense = F.lit(False)
    elif dense_threshold == 0:
        is_dense = F.lit(True)
    else:
        is_dense = F.col("_gdeg") >= dense_threshold
    cols = [
        F.pmod(F.col("dst"), F.lit(p)).cast("int").alias("block_row"),
        F.pmod(F.col("src"), F.lit(p)).cast("int").alias("block_col"),
        is_dense.alias("is_dense"),
        (F.col("src") / p).cast("int").alias("src_local"),
        (F.col("dst") / p).cast("int").alias("dst_local"),
        F.col("_gdeg").cast("int").alias("_gdeg"),
    ]
    if weighted:
        cols.append(F.col("weight"))
    flat = e.select(*cols)
    return flat.groupBy("block_row", "block_col", "is_dense").applyInPandas(
        _build_csr, _BLOCK_SCHEMA
    )


def block_stats(blocks: DataFrame) -> dict:
    """The reference's _STATS sidecar (GraphPrepartitioningReducer.java:106-127)
    as a JSON-able manifest: per-block nnz/columns + totals."""
    rows = blocks.select(
        "block_row",
        "block_col",
        "is_dense",
        F.size("src_local").alias("num_cols"),
        F.size("dst_local").alias("nnz"),
    ).collect()
    per_block = [
        {
            "block_row": r["block_row"],
            "block_col": r["block_col"],
            "is_dense": r["is_dense"],
            "num_cols": r["num_cols"],
            "nnz": r["nnz"],
        }
        for r in rows
    ]
    nnz = [b["nnz"] for b in per_block] or [0]
    return {
        "num_blocks": len(per_block),
        "total_edges": int(sum(nnz)),
        "dense_edges": int(sum(b["nnz"] for b in per_block if b["is_dense"])),
        "sparse_edges": int(sum(b["nnz"] for b in per_block if not b["is_dense"])),
        "skew_ratio": float(max(nnz)) / (sum(nnz) / len(nnz)) if sum(nnz) else 1.0,
        "blocks": per_block,
    }


def partition_cut_stats(edges: DataFrame, p: int) -> DataFrame:
    """Edge-cut / balance diagnostics of the pmod p×p block grid (the
    grid :func:`prepartition` builds): one row

    ``(p, n_edges, intra_edges, cut_frac, max_cell, mean_cell, cell_skew)``

    - ``intra_edges``: edges on the grid diagonal (pmod(src,p) ==
      pmod(dst,p)) — the fraction of messages that stay within their own
      state partition; ``cut_frac = 1 - intra/total`` is what the
      superstep's state shuffle actually moves.
    - ``cell_skew``: max cell count over the uniform-fill mean
      (n_edges/p²) — the straggler predictor the reference sizes its
      dense-block machinery against (skew_ratio in the _STATS sidecar is
      the post-build equivalent; this one is a pre-build, pure-SQL scan).

    One groupBy over p² cells, integer-exact, no collect — run it before
    committing to a p at scale; doubles rounded to 6 for oracle parity.
    """
    cells = (
        edges.groupBy(
            F.pmod(F.col("src"), F.lit(p)).alias("bc"),
            F.pmod(F.col("dst"), F.lit(p)).alias("br"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return cells.agg(
        F.lit(p).cast("int").alias("p"),
        F.sum("c").cast("long").alias("n_edges"),
        F.sum(F.when(F.col("br") == F.col("bc"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("intra_edges"),
        F.round(
            1.0
            - F.sum(
                F.when(F.col("br") == F.col("bc"), F.col("c")).otherwise(0)
            ).cast("double")
            / F.sum("c").cast("double"),
            6,
        ).alias("cut_frac"),
        F.max("c").cast("long").alias("max_cell"),
        F.round(F.sum("c").cast("double") / (p * p), 6).alias("mean_cell"),
        F.round(
            F.max("c").cast("double") * (p * p) / F.sum("c").cast("double"), 6
        ).alias("cell_skew"),
    )


def _hadoop_path(spark, path_str: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _write_sidecar(spark, path_str: str, content: str) -> None:
    """Write a small text sidecar through the Hadoop FileSystem API so
    hdfs:// / s3a:// output paths work (a local pathlib.Path would collapse
    ``hdfs://x`` to ``hdfs:/x`` and write to a bogus local file)."""
    fs, hpath = _hadoop_path(spark, path_str)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def _read_sidecar(spark, path_str: str) -> str:
    """Read a small text sidecar from any Hadoop-supported filesystem."""
    fs, hpath = _hadoop_path(spark, path_str)
    stream = fs.open(hpath)
    try:
        reader = spark._jvm.java.io.BufferedReader(
            spark._jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        line = reader.readLine()
        while line is not None:
            lines.append(line)
            line = reader.readLine()
        return "\n".join(lines)
    finally:
        stream.close()


def write_blocks(blocks: DataFrame, path: str, p: int, dense_threshold: int) -> dict:
    """Persist prepartitioned CSR blocks as Parquet partitioned by
    ``block_col`` (partition pruning: a worker reading column j touches one
    directory) + a ``_STATS.json`` manifest mirroring the reference's _STATS
    sidecar. Returns the stats dict."""
    blocks.write.mode("overwrite").partitionBy("block_col").parquet(path)
    spark = blocks.sparkSession
    reread = spark.read.parquet(path)
    stats = block_stats(reread)
    stats["p"] = p
    stats["dense_threshold"] = dense_threshold
    _write_sidecar(spark, path.rstrip("/") + "/_STATS.json", json.dumps(stats, indent=1))
    return stats


def read_blocks(spark, path: str) -> tuple[DataFrame, dict]:
    """Load prepartitioned blocks + stats manifest written by write_blocks."""
    stats = json.loads(_read_sidecar(spark, path.rstrip("/") + "/_STATS.json"))
    return spark.read.parquet(path), stats


def blocks_to_edges(blocks: DataFrame, p: int) -> DataFrame:
    """Inverse of prepartition (round-trip testing): CSR blocks -> flat edges."""
    ex = blocks.select(
        "block_row",
        "block_col",
        F.explode(
            F.arrays_zip(
                F.flatten(
                    F.zip_with(
                        "src_local",
                        "deg",
                        lambda s, d: F.transform(
                            F.sequence(F.lit(1), d), lambda _: s
                        ),
                    )
                ).alias("s"),
                F.col("dst_local").alias("d"),
                F.coalesce(
                    F.col("weight"),
                    F.transform(F.col("dst_local"), lambda _: F.lit(None).cast("double")),
                ).alias("w"),
            )
        ).alias("z"),
    )
    return ex.select(
        (F.col("z.s").cast("long") * p + F.col("block_col")).alias("src"),
        (F.col("z.d").cast("long") * p + F.col("block_row")).alias("dst"),
        F.col("z.w").alias("weight"),
    )


def _as_array(x, dtype):
    """Arrow/pandas cell -> 1-D ndarray; None / missing -> empty."""
    if x is None:
        return np.zeros(0, dtype=dtype)
    a = np.asarray(x, dtype=dtype)
    return a


def _hub_sig(
    program: VertexProgram,
    values: np.ndarray,
    locs: np.ndarray,
    gdeg: np.ndarray,
    active_mask: np.ndarray | None = None,
    identity: float = 0.0,
) -> np.ndarray:
    """Hub-signal slice of one block's value array (empty if no hubs).
    With ``active_mask`` (delta messaging), inactive hubs' signals collapse
    to the reduce identity so their dense contributions vanish."""
    if len(locs) == 0:
        return np.zeros(0, dtype=np.float64)
    sig = np.asarray(program.np_signal(values[locs], gdeg), dtype=np.float64)
    if active_mask is not None:
        m = active_mask[locs]
        if sig.ndim == 2:
            m = m[:, None]
        sig = np.where(m, sig, identity)
    # batch family: signals are (hubs, k) — flattened for the Arrow column
    return sig.ravel()


# merged-column schema: one row per block_col; dense merges additionally
# carry the sorted hub-local + global-degree arrays (hub metadata lives with
# the data, never on the driver)
_COLS_SCHEMA = T.StructType(
    [
        T.StructField("block_col", T.IntegerType(), False),
        T.StructField("row_blocks", T.ArrayType(T.IntegerType()), False),
        T.StructField("src_counts", T.ArrayType(T.IntegerType()), False),
        T.StructField("nnz", T.ArrayType(T.IntegerType()), False),
        T.StructField("src_local", T.ArrayType(T.IntegerType()), False),
        T.StructField("deg", T.ArrayType(T.IntegerType()), False),
        T.StructField("gdeg", T.ArrayType(T.IntegerType()), False),
        T.StructField("dst_local", T.ArrayType(T.IntegerType()), False),
        T.StructField("weight", T.ArrayType(T.DoubleType()), True),
        T.StructField("hub_locals", T.ArrayType(T.LongType()), True),
        T.StructField("hub_gdeg", T.ArrayType(T.DoubleType()), True),
    ]
)

_HUB_META_SCHEMA = (
    "block int, hub_locals array<bigint>, hub_gdeg array<double>"
)


def _merge_column_fn(with_hubs: bool):
    """Column-major consolidation (the reference's worker-owns-column layout,
    ComputationInputFormat.java:111-115): merge each column's p row-blocks
    into ONE row. Without this, joining state to blocks ships one COPY of
    the column's state array per row-block through Arrow — a p-fold
    amplification (gigabytes per superstep at p=64); merged, each state
    array crosses exactly once per superstep.

    ``with_hubs`` (dense merges) additionally emits the column's sorted
    unique src locals + aligned global degrees — the hub metadata the
    dense gather and the state-side apply both align on. Computed here,
    on the executors, from data already present in the blocks (round 2
    collected one Python Row per (hub × block) onto the driver instead)."""

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        bc = int(pdf["block_col"].iloc[0])
        rb, sc_, nz = [], [], []
        src_cat, deg_cat, gdeg_cat, dst_cat, w_cat = [], [], [], [], []
        any_w = False
        for i in range(len(pdf)):
            rb.append(int(pdf["block_row"].iloc[i]))
            s = np.asarray(pdf["src_local"].iloc[i], dtype=np.int32)
            d = np.asarray(pdf["deg"].iloc[i], dtype=np.int32)
            g = np.asarray(pdf["gdeg"].iloc[i], dtype=np.int32)
            t = np.asarray(pdf["dst_local"].iloc[i], dtype=np.int32)
            sc_.append(len(s))
            nz.append(len(t))
            src_cat.append(s)
            deg_cat.append(d)
            gdeg_cat.append(g)
            dst_cat.append(t)
            w = pdf["weight"].iloc[i]
            if w is not None:
                any_w = True
                w_cat.append(np.asarray(w, dtype=np.float64))
        empty32 = np.array([], dtype=np.int32)
        src_all = np.concatenate(src_cat) if src_cat else empty32
        gd_all = np.concatenate(gdeg_cat) if gdeg_cat else empty32
        hub_locals = hub_gdeg = None
        if with_hubs:
            # sorted unique hub locals; gdeg is per-source-global so any
            # occurrence carries the same value
            uniq, first = np.unique(src_all, return_index=True)
            hub_locals = uniq.astype(np.int64)
            hub_gdeg = gd_all[first].astype(np.float64)
        return pd.DataFrame(
            {
                "block_col": [bc],
                "row_blocks": [np.asarray(rb, dtype=np.int32)],
                "src_counts": [np.asarray(sc_, dtype=np.int32)],
                "nnz": [np.asarray(nz, dtype=np.int32)],
                "src_local": [src_all],
                "deg": [np.concatenate(deg_cat) if deg_cat else empty32],
                "gdeg": [gd_all],
                "dst_local": [np.concatenate(dst_cat) if dst_cat else empty32],
                "weight": [np.concatenate(w_cat) if any_w else None],
                "hub_locals": [hub_locals],
                "hub_gdeg": [hub_gdeg],
            }
        )

    return _merge


def run_blocked(
    edges: DataFrame,
    program: VertexProgram,
    p: int | None = None,
    dense_threshold: int = DENSE_THRESHOLD_DEFAULT,
    max_iter: int = 100,
    checkpointer=None,
    blocks: DataFrame | None = None,
    n: int | None = None,
    on_iteration=None,
) -> GimvResult:
    """Run a vertex program on the blocked CSR plan (scalar semi-rings and
    the label_count family — label propagation).

    ``n`` defaults to max(id)+1 (the reference's numVertices rule,
    GraphPrepartitioningReducer.java:84-101) — ids should be contiguous
    [0, n) from graph.assign_ids / graph.remap_contiguous. Pre-built
    ``blocks`` (from prepartition, possibly read back from Parquet) skip
    the build (and require the build-time ``p``). ``p=None`` applies the
    measured auto rule (``auto_p``).
    """
    if not program.supports_blocked:
        raise ValueError(f"{program.name} does not support the blocked plan")
    if program.blocked_kind not in ("scalar", "label_count", "batch"):
        raise ValueError(f"unknown blocked kernel family {program.blocked_kind!r}")
    label_count = program.blocked_kind == "label_count"
    # 'batch' family: the state is a FLATTENED (n_local × k) row-major
    # matrix; kernels see (rows, k) 2-D views. Sum and min semi-rings
    # (the per-row compaction and delta identity tricks hold for both:
    # identity rows are dropped, and an identity entry is neutral under
    # either reduce).
    batch = program.blocked_kind == "batch"
    bk = int(getattr(program, "k", 1)) if batch else 1
    if batch and program.reduce_np not in ("sum", "min"):
        raise ValueError("batch blocked kernels support the sum/min semi-rings only")
    spark = edges.sparkSession
    import time as _time

    if p is None:
        if blocks is not None:
            raise ValueError(
                "pre-built blocks are only valid under their build-time p — "
                "pass it (read_blocks returns it in the _STATS manifest)"
            )
        cores = int(spark.conf.get("spark.sql.shuffle.partitions"))
        p = auto_p(edges.count(), cores)
    if n is None:
        n = edges.agg(F.greatest(F.max("src"), F.max("dst"))).first()[0]
        if n is None:
            return GimvResult(
                state=spark.createDataFrame([], "vertex long, value double"),
                iterations=0, converged=True, metrics=[],
            )
        n = int(n) + 1
    assert math.ceil(n / p) < 2**31, "block local ids must fit int32"

    weighted = program.weighted and "weight" in edges.columns
    if blocks is None:
        blocks = prepartition(edges, p, dense_threshold, weighted=weighted)
    if "gdeg" not in blocks.columns:
        raise ValueError(
            "pre-built blocks lack the 'gdeg' column — rebuild with "
            "prepartition() (block format carries global out-degrees)"
        )
    blocks = blocks.persist()

    # ONE setup aggregate: edge count + dense/sparse existence.
    row = blocks.agg(
        F.sum(F.size("dst_local")).alias("total"),
        F.sum(
            F.when(F.col("is_dense"), F.size("dst_local")).otherwise(F.lit(0))
        ).alias("dense_nnz"),
    ).first()
    edges_count = int(row["total"] or 0)
    dense_nnz = int(row["dense_nnz"] or 0)
    dense_exists = dense_nnz > 0
    sparse_exists = (edges_count - dense_nnz) > 0

    sparse_cols = None
    if sparse_exists:
        sparse_cols = (
            blocks.filter(~F.col("is_dense"))
            .groupBy("block_col")
            .applyInPandas(_merge_column_fn(with_hubs=False), _COLS_SCHEMA)
            .repartition(p, "block_col")
            .persist()
        )
        sparse_cols.count()
    dense_cols = None
    if dense_exists:
        # dense blocks are column-merged too: the per-iteration hub-sig
        # broadcast join then ships each column's sig array ONCE, not once
        # per (row-block, column) pair — a p-fold Arrow amplification
        # otherwise.
        dense_cols = (
            blocks.filter(F.col("is_dense"))
            .groupBy("block_col")
            .applyInPandas(_merge_column_fn(with_hubs=True), _COLS_SCHEMA)
            .repartition(p, "block_col")
            .persist()
        )
        dense_cols.count()
    blocks.unpersist()

    # Per-column hub metadata as a tiny (≤ p rows) DataFrame — broadcast-
    # joined wherever hub alignment is needed. O(#hubs) total payload by the
    # FlexGraph premise; never collected to the driver as Python rows.
    if dense_exists:
        hub_meta = dense_cols.select(
            F.col("block_col").alias("block"), "hub_locals", "hub_gdeg"
        ).persist()
        hub_meta.count()
    else:
        hub_meta = spark.createDataFrame([], _HUB_META_SCHEMA)

    reduce_min = program.reduce_np == "min"
    identity = program.identity
    delta = program.delta_messaging

    def _scatter_scalar(dst_l, contrib):
        size = int(dst_l.max()) + 1 if len(dst_l) else 0
        part = np.full(size, identity)
        if reduce_min:
            np.minimum.at(part, dst_l, contrib)
        else:
            np.add.at(part, dst_l, contrib)
        nz = np.nonzero(part != identity)[0]
        return nz.astype(np.int32), part[nz]

    def _scatter_batch(dst_l, contrib2d):
        """Scatter (nnz, k) contributions into per-dst k-rows (sum or
        min); compact to dsts with ANY non-identity column, values
        flattened row-major. Identity entries inside a kept row are
        neutral under the downstream reduce, so per-row (not per-cell)
        compaction is exact."""
        size = int(dst_l.max()) + 1 if len(dst_l) else 0
        part = np.full((size, bk), identity)
        if reduce_min:
            np.minimum.at(part, dst_l, contrib2d)
        else:
            np.add.at(part, dst_l, contrib2d)
        nz = np.nonzero((part != identity).any(axis=1))[0]
        return nz.astype(np.int32), part[nz].ravel()

    def _scatter_label(dst_l, lab, w=None):
        """Per-(dst, label) vote partials for one row-block slice:
        edge COUNTS when ``w`` is None (plain LP), edge-weight SUMS
        otherwise (weighted LP) — the downstream merge/argmax is
        identical (partials are float64 either way)."""
        order = np.lexsort((lab, dst_l))
        ds, ls = dst_l[order], lab[order]
        first = np.empty(len(ds), dtype=bool)
        first[0] = True
        first[1:] = (ds[1:] != ds[:-1]) | (ls[1:] != ls[:-1])
        idx = np.flatnonzero(first)
        bounds = np.append(idx, len(ds))
        if w is None:
            cnt = np.diff(bounds).astype(np.float64)
        else:
            csum = np.concatenate(([0.0], np.cumsum(w[order])))
            cnt = csum[bounds[1:]] - csum[bounds[:-1]]
        return ds[idx].astype(np.int32), cnt, ls[idx].astype(np.float64)

    def gather(pdf_iter):
        """mapInPandas over (merged column ⋈ state) rows -> compacted
        partials, one output row per (column, row-block). The signal kernel
        (combine2's source factor) is fused in and vectorized across the
        whole column; global out-degrees ride in the block (gdeg). Under
        delta messaging, inactive sources' signals collapse to the reduce
        identity and all-inactive columns are skipped."""
        for pdf in pdf_iter:
            out_block, out_dst, out_vals, out_lab = [], [], [], []
            for i in range(len(pdf)):
                vals = np.asarray(pdf["values"].iloc[i], dtype=np.float64)
                src_all = np.asarray(pdf["src_local"].iloc[i])
                if delta:
                    act = np.asarray(pdf["active"].iloc[i], dtype=bool)
                    src_act = act[src_all]
                    if not src_act.any():
                        continue  # no frontier source in this column
                row_blocks = np.asarray(pdf["row_blocks"].iloc[i])
                nnzs = np.asarray(pdf["nnz"].iloc[i])
                deg_all = np.asarray(pdf["deg"].iloc[i])
                gdeg_all = np.asarray(pdf["gdeg"].iloc[i], dtype=np.float64)
                dst_all = np.asarray(pdf["dst_local"].iloc[i])
                w_all = pdf["weight"].iloc[i]
                w_all = np.asarray(w_all, dtype=np.float64) if w_all is not None else None
                # whole-column vectorized signal + message
                if batch:
                    sig_src = np.asarray(
                        program.np_signal(vals.reshape(-1, bk)[src_all], gdeg_all),
                        dtype=np.float64,
                    )
                    if delta:
                        # inactive sources collapse to a full identity row
                        sig_src = np.where(src_act[:, None], sig_src, identity)
                    contrib_all = program.np_message(
                        np.repeat(sig_src, deg_all, axis=0), w_all
                    )
                else:
                    sig_src = np.asarray(
                        program.np_signal(vals[src_all], gdeg_all), dtype=np.float64
                    )
                    if delta:
                        sig_src = np.where(src_act, sig_src, identity)
                    contrib_all = program.np_message(
                        np.repeat(sig_src, deg_all), w_all
                    )
                no = np.concatenate(([0], np.cumsum(nnzs)))
                for j in range(len(row_blocks)):
                    sl = slice(no[j], no[j + 1])
                    dst_l = dst_all[sl]
                    if len(dst_l) == 0:
                        continue
                    if label_count:
                        d, v, l = _scatter_label(
                            dst_l, contrib_all[sl],
                            None if w_all is None else w_all[sl],
                        )
                    elif batch:
                        d, v = _scatter_batch(dst_l, contrib_all[sl])
                        l = None
                        if len(d) == 0:
                            continue
                    else:
                        d, v = _scatter_scalar(dst_l, contrib_all[sl])
                        l = None
                        if len(d) == 0:
                            continue
                    out_block.append(int(row_blocks[j]))
                    out_dst.append(d)
                    out_vals.append(v)
                    out_lab.append(l)
            if out_block:  # an all-skipped batch yields nothing (an empty
                # pd.DataFrame would arrive as float64 columns Arrow cannot
                # cast to the list types)
                yield pd.DataFrame(
                    {"block": out_block, "dst_local": out_dst,
                     "vals": out_vals, "lab": out_lab}
                )

    def dense_gather(pdf_iter):
        """mapInPandas over (merged dense column ⋈ broadcast hub-sig state
        slice): each merged-column row carries its column's hub SIGNALS
        (``sigs``, aligned with its own sorted ``hub_locals`` array) exactly
        once — the reference's dv republish (ComputationMapper.java:217-240),
        zero extra stages (the sigs were computed during the previous
        apply). Under delta messaging inactive hubs arrive as identity and
        all-identity columns are skipped."""
        for pdf in pdf_iter:
            out_block, out_dst, out_vals, out_lab = [], [], [], []
            for i in range(len(pdf)):
                sigs = np.asarray(pdf["sigs"].iloc[i], dtype=np.float64)
                if delta and (len(sigs) == 0 or np.all(sigs == identity)):
                    continue  # whole column inactive
                locs = _as_array(pdf["hub_locals"].iloc[i], np.int64)
                row_blocks = np.asarray(pdf["row_blocks"].iloc[i])
                nnzs = np.asarray(pdf["nnz"].iloc[i])
                src_all = np.asarray(pdf["src_local"].iloc[i])
                deg_all = np.asarray(pdf["deg"].iloc[i])
                dst_all = np.asarray(pdf["dst_local"].iloc[i])
                w_all = pdf["weight"].iloc[i]
                w_all = np.asarray(w_all, dtype=np.float64) if w_all is not None else None
                # hub signal lookup: src_local -> position in sorted hub list
                pos = np.searchsorted(locs, src_all)
                if batch:
                    contrib_all = program.np_message(
                        np.repeat(sigs.reshape(-1, bk)[pos], deg_all, axis=0), w_all
                    )
                else:
                    contrib_all = program.np_message(
                        np.repeat(sigs[pos], deg_all), w_all
                    )
                no = np.concatenate(([0], np.cumsum(nnzs)))
                for j in range(len(row_blocks)):
                    sl = slice(no[j], no[j + 1])
                    dst_l = dst_all[sl]
                    if len(dst_l) == 0:
                        continue
                    if label_count:
                        d, v, l = _scatter_label(
                            dst_l, contrib_all[sl],
                            None if w_all is None else w_all[sl],
                        )
                    elif batch:
                        d, v = _scatter_batch(dst_l, contrib_all[sl])
                        l = None
                        if len(d) == 0:
                            continue
                    else:
                        d, v = _scatter_scalar(dst_l, contrib_all[sl])
                        l = None
                        if len(d) == 0:
                            continue
                    out_block.append(int(row_blocks[j]))
                    out_dst.append(d)
                    out_vals.append(v)
                    out_lab.append(l)
            if out_block:  # an all-skipped batch yields nothing (an empty
                # pd.DataFrame would arrive as float64 columns Arrow cannot
                # cast to the list types)
                yield pd.DataFrame(
                    {"block": out_block, "dst_local": out_dst,
                     "vals": out_vals, "lab": out_lab}
                )

    apply_schema = T.StructType(
        list(_STATE_SCHEMA.fields)
        + [T.StructField("changed", T.LongType(), False)]
    )

    def _row_hub_arrays(state_pdf: pd.DataFrame):
        locs = _as_array(state_pdf["hub_locals"].iloc[0], np.int64)
        gd = _as_array(state_pdf["hub_gdeg"].iloc[0], np.float64)
        return locs, gd

    def reduce_apply(state_pdf: pd.DataFrame, part_pdf: pd.DataFrame) -> pd.DataFrame:
        """Fused combineAll + apply + convergence count + NEXT iteration's
        hub-signal extraction over one block (cogroup: ONE shuffle on
        ``block`` instead of reduce-shuffle -> join -> apply-shuffle ->
        hub-extract). Scalar family."""
        b = int(state_pdf["block"].iloc[0])
        old = np.asarray(state_pdf["values"].iloc[0], dtype=np.float64)
        locs, gd = _row_hub_arrays(state_pdf)
        if batch:
            old2 = old.reshape(-1, bk)
            acc = np.full(old2.shape, identity)
            for dst_l, vals in zip(part_pdf["dst_local"], part_pdf["vals"]):
                dst_l = np.asarray(dst_l)
                vals2 = np.asarray(vals, dtype=np.float64).reshape(-1, bk)
                if reduce_min:
                    np.minimum.at(acc, dst_l, vals2)
                else:
                    np.add.at(acc, dst_l, vals2)
            has = (acc != identity).any(axis=1)
            if getattr(program, "needs_global_ids", False):
                new2 = program.np_apply(
                    old2, acc, has, n,
                    global_ids=np.arange(b, n, p, dtype=np.int64)[: len(old2)],
                )
            else:
                new2 = program.np_apply(old2, acc, has, n)
            mask = np.asarray(program.np_changed(old2, new2), dtype=bool)
            changed = int(mask.sum())
            hs = _hub_sig(program, new2, locs, gd,
                          active_mask=mask if delta else None, identity=identity)
            active = mask if delta else np.ones(len(new2), dtype=bool)
            return pd.DataFrame(
                {"block": [b], "values": [new2.ravel()], "hub_sigs": [hs],
                 "active": [active],
                 "changed": [changed]}
            )
        acc = np.full(len(old), identity)
        for dst_l, vals in zip(part_pdf["dst_local"], part_pdf["vals"]):
            dst_l = np.asarray(dst_l)
            vals = np.asarray(vals, dtype=np.float64)
            if reduce_min:
                np.minimum.at(acc, dst_l, vals)
            else:
                np.add.at(acc, dst_l, vals)
        has = acc != identity
        if getattr(program, "needs_global_ids", False):
            # the block's global ids are a pure function of (block, n, p)
            new = program.np_apply(
                old, acc, has, n,
                global_ids=np.arange(b, n, p, dtype=np.int64)[: len(old)],
            )
        else:
            new = program.np_apply(old, acc, has, n)
        mask = np.asarray(program.np_changed(old, new), dtype=bool)
        changed = int(mask.sum())
        hs = _hub_sig(program, new, locs, gd,
                      active_mask=mask if delta else None, identity=identity)
        active = mask if delta else np.ones(len(new), dtype=bool)
        return pd.DataFrame(
            {"block": [b], "values": [new], "hub_sigs": [hs],
             "active": [active], "changed": [changed]}
        )

    def reduce_apply_lp(state_pdf: pd.DataFrame, part_pdf: pd.DataFrame) -> pd.DataFrame:
        """label_count family: merge per-(dst,label) count partials, pick
        the majority label per dst (lowest-label ties — the flat plan's
        max_by(msg, (cnt, -msg)) semantics), apply = coalesce(majority,
        old)."""
        b = int(state_pdf["block"].iloc[0])
        old = np.asarray(state_pdf["values"].iloc[0], dtype=np.float64)
        locs, gd = _row_hub_arrays(state_pdf)
        new = old.copy()
        if len(part_pdf):
            ds = np.concatenate([np.asarray(x) for x in part_pdf["dst_local"]])
            cs = np.concatenate(
                [np.asarray(x, dtype=np.float64) for x in part_pdf["vals"]]
            )
            ls = np.concatenate(
                [np.asarray(x, dtype=np.float64) for x in part_pdf["lab"]]
            )
            if len(ds):
                # merge counts across partials by (dst, label)
                order = np.lexsort((ls, ds))
                ds, ls, cs = ds[order], ls[order], cs[order]
                grp = np.empty(len(ds), dtype=bool)
                grp[0] = True
                grp[1:] = (ds[1:] != ds[:-1]) | (ls[1:] != ls[:-1])
                idx = np.flatnonzero(grp)
                csum = np.concatenate(([0.0], np.cumsum(cs)))
                bounds = np.append(idx, len(ds))
                tot = csum[bounds[1:]] - csum[bounds[:-1]]
                ds2, ls2 = ds[idx], ls[idx]
                # winner per dst: max count, then lowest label
                order2 = np.lexsort((ls2, -tot, ds2))
                dso, lso = ds2[order2], ls2[order2]
                first = np.empty(len(dso), dtype=bool)
                first[0] = True
                first[1:] = dso[1:] != dso[:-1]
                new[dso[first]] = lso[first]
        mask = new != old
        changed = int(mask.sum())
        hs = _hub_sig(program, new, locs, gd, identity=identity)
        return pd.DataFrame(
            {"block": [b], "values": [new], "hub_sigs": [hs],
             "active": [np.ones(len(new), dtype=bool)], "changed": [changed]}
        )

    reduce_fn = reduce_apply_lp if label_count else reduce_apply

    def _with_hub_meta(df: DataFrame) -> DataFrame:
        """Attach per-block hub arrays (broadcast join on the ≤ p-row
        hub_meta — executor-side, never a driver collect)."""
        return df.join(F.broadcast(hub_meta), "block", "left")

    def _init_state_df() -> DataFrame:
        def gen(pdf: pd.DataFrame) -> pd.DataFrame:
            out, hubs, acts = [], [], []
            for i in range(len(pdf)):
                b = int(pdf["block"].iloc[i])
                ids = np.arange(b, n, p, dtype=np.int64)
                vals = np.asarray(program.np_init(ids, n), dtype=np.float64)
                locs = _as_array(pdf["hub_locals"].iloc[i], np.int64)
                gd = _as_array(pdf["hub_gdeg"].iloc[i], np.float64)
                out.append(vals.ravel())
                hubs.append(_hub_sig(program, vals, locs, gd, identity=identity))
                acts.append(np.ones(len(ids), dtype=bool))
            return pd.DataFrame(
                {"block": pdf["block"], "values": out,
                 "hub_sigs": hubs, "active": acts}
            )

        base = spark.range(p).select(F.col("id").cast("int").alias("block"))
        return _with_hub_meta(base).groupBy("block").applyInPandas(gen, _STATE_SCHEMA)

    def _with_hub_sigs(df: DataFrame) -> DataFrame:
        """Recompute hub_sigs + active for a resumed state. Always applied on
        resume: hub alignment depends on dense_threshold (the hub set) and
        active on the delta contract — a checkpoint written under different
        settings would otherwise feed stale signals. Conservative active =
        all-true (one full resend; exact for every semi-ring)."""
        def fix(pdf: pd.DataFrame) -> pd.DataFrame:
            hubs, acts = [], []
            for i in range(len(pdf)):
                vals = np.asarray(pdf["values"].iloc[i], dtype=np.float64)
                if batch:
                    vals = vals.reshape(-1, bk)
                locs = _as_array(pdf["hub_locals"].iloc[i], np.int64)
                gd = _as_array(pdf["hub_gdeg"].iloc[i], np.float64)
                hubs.append(_hub_sig(program, vals, locs, gd, identity=identity))
                acts.append(np.ones(len(vals), dtype=bool))
            return pd.DataFrame(
                {"block": pdf["block"], "values": pdf["values"],
                 "hub_sigs": hubs, "active": acts}
            )

        return (
            _with_hub_meta(df.select("block", "values"))
            .groupBy("block")
            .applyInPandas(fix, _STATE_SCHEMA)
        )

    from flexgraph_spark.gimv import truncate_plan

    job_name = program.name + "_blocked"
    start_iter = 0
    state = None
    if checkpointer is not None:
        # Guard: state arrays decode under (block = vertex % p, local =
        # vertex // p) — a checkpoint written under a different p would
        # silently decode garbage (inner joins on block just drop mismatched
        # ids). Refuse; dense_threshold changes are safe because hub_sigs
        # are recomputed below.
        last = checkpointer.last_manifest(job_name)
        if last is not None and last.get("p") is not None and last["p"] != p:
            raise ValueError(
                f"checkpoint for {job_name} was written under p={last['p']}; "
                f"resuming with p={p} would decode state blocks under the "
                "wrong (block, local) split — rerun with the original p or "
                "start a fresh checkpoint dir"
            )
        checkpointer.set_job_params(job_name, p=p, dense_threshold=dense_threshold)
        resumed = checkpointer.resume(job_name)
        if resumed is not None:
            start_iter, state = resumed
            state = _with_hub_sigs(state).repartition(p, "block")
    if state is None:
        state = _init_state_df().repartition(p, "block")
        state = truncate_plan(state)

    metrics: list[IterationMetrics] = []
    converged = False
    it = start_iter
    # AQE off during the superstep loop (same rationale as gimv.run): the
    # blocked plan shape is static; AQE stage barriers only add latency.
    # try/finally so an exception mid-loop can't leak the disabled setting
    # into the shared session.
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for it in range(start_iter + 1, max_iter + 1):
            t0 = _time.time()
            parts = []
            if sparse_exists:
                parts.append(
                    sparse_cols.join(
                        state.withColumnRenamed("block", "block_col").hint("shuffle_hash"),
                        "block_col",
                    ).mapInPandas(gather, _PARTIAL_SCHEMA)
                )
            if dense_exists:
                hub_state = state.select(
                    F.col("block").alias("block_col"), F.col("hub_sigs").alias("sigs")
                )
                parts.append(
                    dense_cols.join(F.broadcast(hub_state), "block_col")
                    .mapInPandas(dense_gather, _PARTIAL_SCHEMA)
                )

            partials = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
            # real shuffled-message count (compacted partial entries) — under
            # delta messaging this decays toward zero over the convergent tail
            msg_obs = Observation()
            partials = partials.observe(
                msg_obs, F.sum(F.size("dst_local")).alias("m")
            )
            conv_obs = Observation()
            new_state = (
                state.select(*[f.name for f in _STATE_SCHEMA.fields])
                .join(F.broadcast(hub_meta), "block", "left")
                .groupBy("block")
                .cogroup(partials.groupBy("block"))
                .applyInPandas(reduce_fn, apply_schema)
                .observe(conv_obs, F.sum("changed").alias("c"))
            )
            # Materialize + truncate lineage; durable parquet when resumable
            # (same contract as the flat engine, gimv.run).
            if checkpointer is not None:
                new_state = checkpointer.save(job_name, it, new_state.drop("changed"))
            else:
                new_state = truncate_plan(new_state)
            changed = int(conv_obs.get["c"] or 0)

            m = IterationMetrics(
                iteration=it,
                messages_shuffled=int(msg_obs.get["m"] or 0),
                changed=changed,
                edges_scanned=int(edges_count),
                seconds=_time.time() - t0,
            )
            metrics.append(m)
            if on_iteration is not None:
                on_iteration(m)
            if checkpointer is not None:
                checkpointer.record_metrics(job_name, m)
            old_state = state
            state = new_state.drop("changed") if "changed" in new_state.columns else new_state
            if hasattr(old_state, "unpersist"):
                old_state.unpersist()
            if changed == 0:
                converged = True
                break
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    if batch:
        # re-chunk the flattened (n_local × k) matrix into one k-array per
        # local vertex before exploding; empty blocks (p > n_local rows
        # exist whenever p doesn't divide the vertex range evenly) must
        # yield array() — sequence(0, -1) would run DESCENDING and feed
        # slice() a zero/negative start
        chunked = F.expr(
            f"case when size(values) < {bk} then array() "
            f"else transform(sequence(1, int(size(values) / {bk})), "
            f"i -> slice(values, (i - 1) * {bk} + 1, {bk})) end"
        )
        flat = state.select(
            "block", F.posexplode(chunked).alias("local", "value")
        )
    else:
        flat = state.select(
            "block", F.posexplode("values").alias("local", "value")
        )
    flat = flat.select(
        (F.col("local").cast("long") * p + F.col("block")).alias("vertex"), "value"
    )
    result = program.finalize(flat)
    if sparse_cols is not None:
        sparse_cols.unpersist()
    if dense_cols is not None:
        dense_cols.unpersist()
    if dense_exists:
        hub_meta.unpersist()
    return GimvResult(state=result, iterations=it, converged=converged, metrics=metrics)
