"""M2 — FlexGraph-style block prepartitioning + skew-aware blocked superstep.

Re-expresses the reference's core contribution (hybrid vertex-cut/edge-cut
via degree-based dense/sparse edge placement — SURVEY.md §1.4, reference
UnweightedGraphPrepartitioning.java:169-244, ComputationInputFormat.java:102-123)
in Spark terms:

* **Grid**: edge (src, dst) lands in block (block_row = dst % p,
  block_col = src % p); local ids are ``global // p`` (int32, same split as
  the reference's IDUtils.java:23-37).
* **CSR blocks**: one DataFrame row per (block_row, block_col, is_dense)
  holding Arrow array columns (src_local[], deg[], dst_local[], weight[]?) —
  the reference's custom binary block files collapse into Parquet structs.
* **Dense/sparse split**: a source with global out-degree ≥ threshold is a
  hub ("dense"); threshold < 0 ⇒ all sparse, == 0 ⇒ all dense (degenerate
  modes, Constants.java:25-27 / ComputationMapper.java:173-176).
* **Superstep**: sparse blocks join the (small, p-row) blocked state on
  block_col and gather/scatter inside a pandas UDF; dense blocks receive
  only the HUB signals via a driver broadcast (O(#hubs), not O(E_dense)) —
  exactly the reference's dv-broadcast trick (ComputationMapper.java:217-240).
  Partials shuffle-reduce on block_row; apply is a vectorized kernel.

All Python execution is Arrow-batched NumPy over whole blocks — no per-row
Python anywhere.

Scale notes: p must grow with the cluster so each block's arrays stay
within executor memory (n/p state doubles + E/p² edges per block; assert
n/p < 2^31 like the reference). The blocked state is (p rows × n/p array
entries); joins on ``block`` are trivially co-partitioned.
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

_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("block_row", T.IntegerType(), False),
        T.StructField("block_col", T.IntegerType(), False),
        T.StructField("is_dense", T.BooleanType(), False),
        T.StructField("src_local", T.ArrayType(T.IntegerType()), False),
        T.StructField("deg", T.ArrayType(T.IntegerType()), False),
        T.StructField("dst_local", T.ArrayType(T.IntegerType()), False),
        T.StructField("weight", T.ArrayType(T.DoubleType()), True),
    ]
)

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("block", T.IntegerType(), False),
        T.StructField("dst_local", T.ArrayType(T.IntegerType()), False),
        T.StructField("vals", T.ArrayType(T.DoubleType()), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("block", T.IntegerType(), False),
        T.StructField("values", T.ArrayType(T.DoubleType()), False),
    ]
)

_HUB_SCHEMA = T.StructType(
    [
        T.StructField("block", T.IntegerType(), False),
        T.StructField("sigs", T.ArrayType(T.DoubleType()), False),
    ]
)


def _make_hub_extractor(hub_locals_b, col: str = "values"):
    """Executor-side slice of one per-block array down to its hub entries —
    only O(#hubs) values ever leave the block (the reference's dv-file
    republish, ComputationMapper.java:306-313)."""

    def extract(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["block"].iloc[0])
        locs = hub_locals_b.value.get(b)
        if locs is None or len(pdf) == 0:
            return pd.DataFrame(
                {"block": pd.Series(dtype="int32"), "sigs": pd.Series(dtype="object")}
            )
        sig = np.asarray(pdf[col].iloc[0], dtype=np.float64)
        return pd.DataFrame({"block": [b], "sigs": [sig[locs]]})

    return extract


def _make_hub_signal_extractor(program, hub_locals_b, hub_outdeg_b):
    """Executor-side hub-SIGNAL extractor: slice the block's state array to
    its hub entries AND apply np_signal there (using the static hub
    out-degrees), so the per-iteration dense republish is a small
    DataFrame — never a driver collect. The result broadcast-joins into the
    dense blocks (O(#hubs) network per superstep, zero driver round trip)."""

    def extract(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["block"].iloc[0])
        locs = hub_locals_b.value.get(b)
        if locs is None or len(pdf) == 0:
            return pd.DataFrame(
                {"block": pd.Series(dtype="int32"), "sigs": pd.Series(dtype="object")}
            )
        vals = np.asarray(pdf["values"].iloc[0], dtype=np.float64)[locs]
        od = hub_outdeg_b.value.get(b)
        sig = program.np_signal(vals, od if od is not None else vals)
        return pd.DataFrame({"block": [b], "sigs": [sig]})

    return extract


def _build_csr(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (block_row, block_col, is_dense) group -> one CSR row."""
    has_w = "weight" in pdf.columns
    order = np.lexsort((pdf["dst_local"].to_numpy(), pdf["src_local"].to_numpy()))
    src = pdf["src_local"].to_numpy()[order]
    dst = pdf["dst_local"].to_numpy()[order]
    w = pdf["weight"].to_numpy()[order] if has_w else None
    uniq, counts = np.unique(src, return_counts=True)
    return pd.DataFrame(
        {
            "block_row": [int(pdf["block_row"].iloc[0])],
            "block_col": [int(pdf["block_col"].iloc[0])],
            "is_dense": [bool(pdf["is_dense"].iloc[0])],
            "src_local": [uniq.astype(np.int32)],
            "deg": [counts.astype(np.int32)],
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
    0 ⇒ all dense.
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


def _init_state(spark, n: int, p: int, program: VertexProgram) -> DataFrame:
    """Blocked initial state: p rows, values[local] for global = local*p+block."""
    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in pdf["block"]:
            ids = np.arange(b, n, p, dtype=np.int64)
            out.append(program.np_init(ids, n))
        return pd.DataFrame({"block": pdf["block"], "values": out})

    base = spark.range(p).select(F.col("id").cast("int").alias("block"))
    return base.groupBy("block").applyInPandas(gen, _STATE_SCHEMA)


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
    """Run a scalar-semi-ring vertex program on the blocked CSR plan.

    ``n`` defaults to max(id)+1 (the reference's numVertices rule,
    GraphPrepartitioningReducer.java:84-101) — ids should be contiguous
    [0, n) from graph.assign_ids. Pre-built ``blocks`` (from prepartition,
    possibly read back from Parquet) skip the build.
    """
    if not program.supports_blocked:
        raise ValueError(f"{program.name} has a non-scalar semi-ring; use the flat plan")
    spark = edges.sparkSession
    import time as _time

    if p is None:
        p = int(spark.conf.get("spark.sql.shuffle.partitions"))
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
    blocks = blocks.repartition(p, "block_col").persist()
    edges_count = blocks.agg(F.sum(F.size("dst_local"))).first()[0] or 0

    # static per-block out-degree arrays (for signal kernels that need it)
    outdeg_blocks = None
    if program.needs_out_degree:
        deg_flat = edges.groupBy("src").agg(F.count("*").alias("degree"))

        def degarr(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["block"].iloc[0])
            arr = np.zeros(len(np.arange(b, n, p)), dtype=np.float64)
            loc = pdf["local"].to_numpy()
            dv = pdf["degree"].to_numpy(dtype=np.float64)
            mask = loc >= 0
            arr[loc[mask]] = dv[mask]
            return pd.DataFrame({"block": [b], "outdeg": [arr]})

        deg_b = deg_flat.select(
            F.pmod(F.col("src"), F.lit(p)).cast("int").alias("block"),
            (F.col("src") / p).cast("int").alias("local"),
            "degree",
        )
        # ensure every block has a row (blocks with no sources)
        anchor = spark.range(p).select(
            F.col("id").cast("int").alias("block"),
            F.lit(-1).cast("int").alias("local"),
            F.lit(0).cast("long").alias("degree"),
        )
        outdeg_blocks = (
            deg_b.unionByName(anchor)
            .groupBy("block")
            .applyInPandas(
                degarr,
                T.StructType(
                    [
                        T.StructField("block", T.IntegerType(), False),
                        T.StructField("outdeg", T.ArrayType(T.DoubleType()), False),
                    ]
                ),
            )
            .persist()
        )
        outdeg_blocks.count()

    # hubs (dense sources): (block, local) — driver-side, the FlexGraph
    # premise is |hubs| ≪ n (their per-iteration values get broadcast).
    dense_exists = blocks.filter("is_dense").limit(1).count() > 0
    hub_locals: dict[int, np.ndarray] = {}
    if dense_exists:
        hub_rows = (
            blocks.filter("is_dense")
            .select("block_col", F.explode("src_local").alias("local"))
            .distinct()
            .collect()
        )
        for r in hub_rows:
            hub_locals.setdefault(r["block_col"], []).append(r["local"])
        hub_locals = {b: np.sort(np.array(v, dtype=np.int64)) for b, v in hub_locals.items()}
    hub_locals_b = None
    if dense_exists:
        hub_locals_b = edges.sparkSession.sparkContext.broadcast(hub_locals)

    dense_blocks = blocks.filter(F.col("is_dense")).persist()

    # Column-major consolidation (the reference's worker-owns-column layout,
    # ComputationInputFormat.java:111-115): merge each column's p row-blocks
    # into ONE row. Without this, joining state to blocks ships one COPY of
    # the column's state array per row-block through Arrow — a p-fold
    # amplification (gigabytes per superstep at p=64); merged, each state
    # array crosses exactly once per superstep. Built once, persisted.
    _COLS_SCHEMA = T.StructType(
        [
            T.StructField("block_col", T.IntegerType(), False),
            T.StructField("row_blocks", T.ArrayType(T.IntegerType()), False),
            T.StructField("src_counts", T.ArrayType(T.IntegerType()), False),
            T.StructField("nnz", T.ArrayType(T.IntegerType()), False),
            T.StructField("src_local", T.ArrayType(T.IntegerType()), False),
            T.StructField("deg", T.ArrayType(T.IntegerType()), False),
            T.StructField("dst_local", T.ArrayType(T.IntegerType()), False),
            T.StructField("weight", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def _merge_column(pdf: pd.DataFrame) -> pd.DataFrame:
        bc = int(pdf["block_col"].iloc[0])
        rb, sc_, nz = [], [], []
        src_cat, deg_cat, dst_cat, w_cat = [], [], [], []
        any_w = False
        for i in range(len(pdf)):
            rb.append(int(pdf["block_row"].iloc[i]))
            s = np.asarray(pdf["src_local"].iloc[i], dtype=np.int32)
            d = np.asarray(pdf["deg"].iloc[i], dtype=np.int32)
            t = np.asarray(pdf["dst_local"].iloc[i], dtype=np.int32)
            sc_.append(len(s))
            nz.append(len(t))
            src_cat.append(s)
            deg_cat.append(d)
            dst_cat.append(t)
            w = pdf["weight"].iloc[i]
            if w is not None:
                any_w = True
                w_cat.append(np.asarray(w, dtype=np.float64))
        return pd.DataFrame(
            {
                "block_col": [bc],
                "row_blocks": [np.asarray(rb, dtype=np.int32)],
                "src_counts": [np.asarray(sc_, dtype=np.int32)],
                "nnz": [np.asarray(nz, dtype=np.int32)],
                "src_local": [np.concatenate(src_cat) if src_cat else np.array([], dtype=np.int32)],
                "deg": [np.concatenate(deg_cat) if deg_cat else np.array([], dtype=np.int32)],
                "dst_local": [np.concatenate(dst_cat) if dst_cat else np.array([], dtype=np.int32)],
                "weight": [np.concatenate(w_cat) if any_w else None],
            }
        )

    sparse_cols = (
        blocks.filter(~F.col("is_dense"))
        .groupBy("block_col")
        .applyInPandas(_merge_column, _COLS_SCHEMA)
        .repartition(p, "block_col")
        .persist()
    )
    sparse_exists = sparse_cols.limit(1).count() > 0

    sc = spark.sparkContext
    reduce_min = program.reduce_np == "min"
    identity = program.identity

    has_outdeg = program.needs_out_degree

    def gather(pdf_iter):
        """mapInPandas over (merged column ⋈ state[, outdeg] arrays) rows ->
        compacted partials, one output row per (column, row-block). The
        signal kernel (combine2's source factor) is fused in — no separate
        signal stage."""
        for pdf in pdf_iter:
            out_block, out_dst, out_vals = [], [], []
            for i in range(len(pdf)):
                vals = np.asarray(pdf["values"].iloc[i], dtype=np.float64)
                od = (
                    np.asarray(pdf["outdeg"].iloc[i], dtype=np.float64)
                    if has_outdeg
                    else vals
                )
                sig = program.np_signal(vals, od)
                row_blocks = np.asarray(pdf["row_blocks"].iloc[i])
                src_counts = np.asarray(pdf["src_counts"].iloc[i])
                nnzs = np.asarray(pdf["nnz"].iloc[i])
                src_all = np.asarray(pdf["src_local"].iloc[i])
                deg_all = np.asarray(pdf["deg"].iloc[i])
                dst_all = np.asarray(pdf["dst_local"].iloc[i])
                w_all = pdf["weight"].iloc[i]
                w_all = np.asarray(w_all, dtype=np.float64) if w_all is not None else None
                so = np.concatenate(([0], np.cumsum(src_counts)))
                no = np.concatenate(([0], np.cumsum(nnzs)))
                for j in range(len(row_blocks)):
                    src_l = src_all[so[j]:so[j + 1]]
                    degs = deg_all[so[j]:so[j + 1]]
                    dst_l = dst_all[no[j]:no[j + 1]]
                    w = w_all[no[j]:no[j + 1]] if w_all is not None else None
                    contrib = program.np_message(np.repeat(sig[src_l], degs), w)
                    size = int(dst_l.max()) + 1 if len(dst_l) else 0
                    part = np.full(size, identity)
                    if reduce_min:
                        np.minimum.at(part, dst_l, contrib)
                    else:
                        np.add.at(part, dst_l, contrib)
                    nz = np.nonzero(part != identity)[0]
                    out_block.append(int(row_blocks[j]))
                    out_dst.append(nz.astype(np.int32))
                    out_vals.append(part[nz])
            yield pd.DataFrame({"block": out_block, "dst_local": out_dst, "vals": out_vals})

    def dense_gather(pdf_iter):
        """mapInPandas over (dense block ⋈ broadcast hub sigs) rows: each row
        carries the hub SIGNALS of its column (``sigs``, aligned with the
        sorted hub-local list) — the reference's dv republish
        (ComputationMapper.java:217-240) without any driver round trip."""
        hub_locals = hub_locals_b.value
        for pdf in pdf_iter:
            out_block, out_dst, out_vals = [], [], []
            for i in range(len(pdf)):
                bc = int(pdf["block_col"].iloc[i])
                locs = hub_locals[bc]
                sigs = np.asarray(pdf["sigs"].iloc[i], dtype=np.float64)
                src_l = np.asarray(pdf["src_local"].iloc[i])
                degs = np.asarray(pdf["deg"].iloc[i])
                dst_l = np.asarray(pdf["dst_local"].iloc[i])
                w = pdf["weight"].iloc[i]
                w = np.asarray(w, dtype=np.float64) if w is not None else None
                # hub signal lookup: src_local -> position in sorted hub list
                pos = np.searchsorted(locs, src_l)
                sig_at_src = sigs[pos]
                contrib = program.np_message(np.repeat(sig_at_src, degs), w)
                size = int(dst_l.max()) + 1 if len(dst_l) else 0
                part = np.full(size, identity)
                if reduce_min:
                    np.minimum.at(part, dst_l, contrib)
                else:
                    np.add.at(part, dst_l, contrib)
                nz = np.nonzero(part != identity)[0]
                out_block.append(int(pdf["block_row"].iloc[i]))
                out_dst.append(nz.astype(np.int32))
                out_vals.append(part[nz])
            yield pd.DataFrame(
                {"block": out_block, "dst_local": out_dst, "vals": out_vals}
            )

    apply_schema = T.StructType(
        [
            T.StructField("block", T.IntegerType(), False),
            T.StructField("values", T.ArrayType(T.DoubleType()), False),
            T.StructField("changed", T.LongType(), False),
        ]
    )

    def reduce_apply(state_pdf: pd.DataFrame, part_pdf: pd.DataFrame) -> pd.DataFrame:
        """Fused combineAll + apply over one block (cogroup: ONE shuffle on
        ``block`` instead of reduce-shuffle -> join -> apply-shuffle)."""
        b = int(state_pdf["block"].iloc[0])
        old = np.asarray(state_pdf["values"].iloc[0], dtype=np.float64)
        acc = np.full(len(old), identity)
        for dst_l, vals in zip(part_pdf["dst_local"], part_pdf["vals"]):
            dst_l = np.asarray(dst_l)
            vals = np.asarray(vals, dtype=np.float64)
            if reduce_min:
                np.minimum.at(acc, dst_l, vals)
            else:
                np.add.at(acc, dst_l, vals)
        has = acc != identity
        new = program.np_apply(old, acc, has, n)
        changed = int(program.np_changed(old, new).sum())
        return pd.DataFrame({"block": [b], "values": [new], "changed": [changed]})

    # static hub out-degrees (broadcast once: needed executor-side by the
    # per-iteration hub-signal extractor)
    hub_outdeg_b = None
    if dense_exists:
        hub_outdeg: dict[int, np.ndarray] = {}
        if outdeg_blocks is not None:
            rows = (
                outdeg_blocks.groupBy("block")
                .applyInPandas(_make_hub_extractor(hub_locals_b, "outdeg"), _HUB_SCHEMA)
                .collect()
            )
            hub_outdeg = {
                r["block"]: np.asarray(r["sigs"], dtype=np.float64) for r in rows
            }
        hub_outdeg_b = sc.broadcast(hub_outdeg)
        hub_sig_extract = _make_hub_signal_extractor(program, hub_locals_b, hub_outdeg_b)

    from flexgraph_spark.gimv import truncate_plan

    job_name = program.name + "_blocked"
    start_iter = 0
    state = None
    if checkpointer is not None:
        resumed = checkpointer.resume(job_name)
        if resumed is not None:
            start_iter, state = resumed
            state = state.repartition(p, "block")
    if state is None:
        state = _init_state(spark, n, p, program).repartition(p, "block")
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
            src_side = (
                state.join(outdeg_blocks, "block") if outdeg_blocks is not None else state
            )
            parts = []
            if sparse_exists:
                parts.append(
                    sparse_cols.join(
                        src_side.withColumnRenamed("block", "block_col").hint("shuffle_hash"),
                        "block_col",
                    ).mapInPandas(gather, _PARTIAL_SCHEMA)
                )
            if dense_exists:
                # per-iteration dense republish: slice the state down to its
                # hub entries + signal (executor-side, O(#hubs) total) and
                # broadcast-JOIN it into the dense blocks — the reference's
                # dv trick (ComputationMapper.java:306-313) with no driver
                # round trip: dense-edge partials never shuffle; only the
                # tiny hub-signal table moves each superstep.
                hub_sigs = (
                    state.groupBy("block")
                    .applyInPandas(hub_sig_extract, _HUB_SCHEMA)
                    .withColumnRenamed("block", "block_col")
                )
                parts.append(
                    dense_blocks.join(F.broadcast(hub_sigs), "block_col")
                    .mapInPandas(dense_gather, _PARTIAL_SCHEMA)
                )

            partials = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
            conv_obs = Observation()
            new_state = (
                state.groupBy("block")
                .cogroup(partials.groupBy("block"))
                .applyInPandas(reduce_apply, apply_schema)
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
                messages_shuffled=edges_count,  # upper bound; partials are compacted
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
    flat = state.select(
        "block", F.posexplode("values").alias("local", "value")
    ).select(
        (F.col("local").cast("long") * p + F.col("block")).alias("vertex"), "value"
    )
    result = program.finalize(flat)
    for df in (sparse_cols, dense_blocks, blocks):
        df.unpersist()
    if outdeg_blocks is not None:
        outdeg_blocks.unpersist()
    return GimvResult(state=result, iterations=it, converged=converged, metrics=metrics)
