"""Structured-Streaming operators over the events table.

The reference engine is batch-only (Hadoop MR); streaming is part of this
engine's extended surface for training-data pipelines: the same declarative
transformations run in batch (driver-contract queries, DuckDB-oracled) and
as incremental streaming plans (``spark.readStream`` + watermark), because
they are built exclusively from streaming-capable constructs —
``F.window`` / ``F.session_window`` aggregations and
``applyInPandasWithState`` for the custom stateful path.

Scale notes: windowed/session aggregations shuffle on (window, key) with
map-side partial aggregation; watermarks bound state size (late rows beyond
the watermark are dropped instead of growing state forever). The stateful
operator keys by user_id — uniform hash distribution, state is O(1) per
key.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark, path: str, max_files_per_trigger: int | None = None):
    """File-source event stream (the parquet directory is the queue)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window per-event-type counts + value sums.

    Batch and streaming share this exact plan; on a streaming input the
    watermark bounds aggregation state and admits late rows up to its
    horizon."""
    df = events
    if df.isStreaming and watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_duration).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user sessions via the built-in session window (dynamic gap close:
    a session ends when no event arrives within ``gap``). Spark-first: no
    custom state management needed — ``F.session_window`` is
    streaming-capable and batch-exact."""
    df = events
    if df.isStreaming and watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), user_col)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


_RUNNING_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user running event count +
    value total, maintained across micro-batches with
    ``applyInPandasWithState`` (Arrow-batched; state is one (long, double)
    pair per user). The template for operators the built-in aggregations
    can't express (per-key models, decaying counters, ...)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        _RUNNING_OUT_SCHEMA,
        _RUNNING_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_doc_stream(spark, path: str, max_files_per_trigger: int | None = None):
    """File-source document stream (incoming crawl/ingest batches land as
    parquet files; each file is a micro-batch unit)."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_near_dup(
    docs: DataFrame,
    index: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    est_cut: float = 0.5,
) -> DataFrame:
    """Incremental near-duplicate screen: MinHash each INCOMING document
    and probe a STATIC LSH band index of the existing corpus
    (textops.minhash_band_index) — the ingest-time dedup gate of a
    training-data pipeline (drop/flag a crawled page that near-matches
    something already in the corpus, without rescanning the corpus).

    Returns ``(doc_id, match_id, est_jaccard)`` where est_jaccard is the
    signature-component match fraction (same estimator as the batch LSH
    screen), aggregated to one row per (incoming doc, corpus doc) pair.

    Stream-static shape: the signature + banding are stateless column
    expressions (streaming-legal), the probe is a stream-static equi-join
    on (band, bucket) — no streaming state at all; only the final
    per-pair max() aggregation carries state, keyed by the pair (emit in
    ``update`` mode, or window + watermark the input to bound it). Batch
    inputs run the identical plan (the stream≡batch pytest contract).
    At scale the index side is parquet bucketed by (band, bucket), so the
    probe co-locates; hot buckets (boilerplate bands) are AQE skew-join
    territory, same as the batch band join.

    Note: unlike the batch path (textops.shingle_table's persist barrier),
    a stream cannot persist the shingle array, so projection collapse may
    recompute the shingle split per hash seed — acceptable per micro-batch
    (the batch index side, where the corpus-scale cost sits, keeps the
    barrier).
    """
    from flexgraph_spark.textops import _band_explode, _signatures_from, shingle_hashes

    rpb = num_hashes // bands
    hs = docs.select(
        "doc_id", shingle_hashes(F.col("text"), k).alias("hs")
    ).filter(F.size("hs") > 0)
    sigs = _signatures_from(hs, num_hashes)
    banded = sigs.select(
        "doc_id", "sig", _band_explode(bands, rpb).alias("bb")
    ).select("doc_id", "sig", "bb.band", "bb.bucket")
    idx = index.select(
        "band", "bucket",
        F.col("doc_id").alias("match_id"), F.col("sig").alias("match_sig"),
    )
    est = F.aggregate(
        F.zip_with(
            F.col("sig"), F.col("match_sig"),
            lambda a, b: F.when(a == b, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(num_hashes))
    return (
        banded.join(idx, ["band", "bucket"])
        .filter(F.col("doc_id") != F.col("match_id"))
        .select("doc_id", "match_id", est.alias("est"))
        .filter(F.col("est") >= est_cut)
        .groupBy("doc_id", "match_id")
        .agg(F.max("est").alias("est_jaccard"))
    )


def streaming_exact_dedup(
    docs: DataFrame,
    corpus_index: DataFrame,
    normalize: bool = True,
) -> DataFrame:
    """Ingest-time EXACT-duplicate screen — the stateless sibling of
    :func:`streaming_near_dup`: sha256 each incoming document and probe a
    static fingerprint index of the existing corpus (one column
    ``fingerprint``, e.g. ``textops.fingerprints(...).select(sha256)``),
    tagging every arrival as already-known or new. The first gate of a
    crawl pipeline (drop exact re-crawls before any shingling work).

    Returns (doc_id, fingerprint, is_dup) — fully stateless (hash is a
    column expression, the probe a stream-static LEFT join), so it runs
    in ``append`` mode with no watermark and the identical plan serves
    batch inputs (the stream≡batch pytest contract). ``normalize``
    hashes the whitespace-collapsed lowercased body (catches re-crawls
    that differ in formatting only); pass False for byte-exact keys.
    At scale the index is parquet bucketed by fingerprint so the probe
    co-locates; the 256-bit key makes the join skew-proof."""
    body = F.col("text")
    if normalize:
        body = F.regexp_replace(F.trim(F.lower(body)), r"\s+", " ")
    fp = docs.select("doc_id", F.sha2(body, 256).alias("fingerprint"))
    idx = corpus_index.select(
        F.col("fingerprint"), F.lit(1).alias("_hit")
    ).distinct()
    return (
        fp.join(idx, "fingerprint", "left")
        .select(
            "doc_id", "fingerprint",
            F.col("_hit").isNotNull().alias("is_dup"),
        )
    )


def run_to_memory(stream_df: DataFrame, query_name: str, mode: str = "update"):
    """Drain a streaming DataFrame into an in-memory table with the
    availableNow trigger (process-everything-then-stop) — the test/dev
    harness; production sinks swap in parquet/Kafka writers."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


def windowed_degrees(
    edges: DataFrame,
    window_duration: str = "1 hour",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    direction: str = "out",
) -> DataFrame:
    """Windowed vertex degrees over a TIMESTAMPED edge stream — the
    incremental face of graph.degrees for a link graph that arrives as an
    append-only crawl feed: per tumbling window, the (exact) number of
    edges and distinct neighbors each vertex emitted (direction='out') or
    received ('in'). Batch and streaming share the plan; on a stream the
    watermark bounds the per-(window, vertex) state.

    Scale shape: one shuffle on (window, vertex) with map-side partial
    aggregation; hub vertices are one hot key per window — AQE skew-split
    territory, same as the batch degree job. Aggregates are
    streaming-legal (count + sum — exact DISTINCT aggregation is not
    supported on streams; chain a watermarked ``dropDuplicates`` upstream
    or use ``approx_count_distinct`` for neighbor cardinality).
    """
    key = "src" if direction == "out" else "dst"
    df = edges
    if df.isStreaming and watermark:
        df = df.withWatermark(ts_col, watermark)
    w = (
        F.sum("weight")
        if "weight" in df.columns
        else F.count("*").cast("double")
    )
    return (
        df.groupBy(F.window(ts_col, window_duration).alias("w"),
                   F.col(key).alias("vertex"))
        .agg(F.count("*").alias("n_edges"), w.alias("w_degree"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "vertex", "n_edges", "w_degree",
        )
    )


def streaming_cc_maintenance(
    edge_stream: DataFrame,
    labels_dir: str,
    checkpoint_dir: str,
    max_iter: int = 100,
):
    """Continuous connected-components maintenance over an edge stream —
    the streaming face of incremental CC (jobs/incremental): each
    micro-batch unions the new edges in and WARM-STARTS HashMin from
    the previous labels (``initial_state``), which is exact for edge
    additions (old labels are per-vertex upper bounds on the min-id and
    HashMin is monotone from any upper-bound init — see
    algorithms.connected_components). Labels live as a parquet table at
    ``labels_dir`` (read → warm run → overwrite per batch); new vertices
    enter at their own id, exactly a cold vertex's init.

    DELETIONS (crawl page removals, GDPR deletes) are supported via an
    optional ``op`` column ('add' | 'del') on the stream: deleted edges
    leave the live set, and :func:`_cc_delete_reset` cold-restarts ONLY
    the components that lost an edge (a delete can split a component, so
    their min labels are no longer trusted upper bounds) while every
    untouched component keeps its exact labels — per-batch cost stays
    proportional to the affected components, not the graph.

    GIM-V iteration inside a streaming trigger is expressed via
    ``foreachBatch`` — the documented escape hatch for batch-only plans
    (iterative joins are not incrementalizable by the streaming planner;
    the warm start is what makes the per-batch cost proportional to the
    DELTA's impact radius, usually 1-2 supersteps, instead of the cold
    diameter bound). Edge history accumulates in ``labels_dir``/edges as
    an append-only parquet log (at scale: a compacted table / Iceberg
    MERGE; semantics identical).

    Returns the StreamingQuery. The caller owns awaitTermination /
    availableNow triggers."""

    def run(all_edges, init, max_it):
        from flexgraph_spark import algorithms

        res = algorithms.connected_components(
            all_edges, max_iter=max_it, initial_state=init
        )
        return res, F.col("value").cast("long").alias("cluster")

    return _streaming_maintenance(
        edge_stream, labels_dir, checkpoint_dir, run, max_iter,
        reset=_cc_delete_reset,
    )


def _cc_delete_reset(init: DataFrame, dels: DataFrame, live: DataFrame) -> DataFrame:
    """Decremental CC repair: a deleted edge can SPLIT a component, so the
    min-label warm start is invalid for every vertex of any component that
    lost an edge (its label may be the id of a vertex it no longer
    reaches). Reset exactly those components to cold init (vertex = own
    id) and warm-start the rest — HashMin from this mixed init is exact:
    untouched components hold their (still-exact) labels, reset ones
    recompute from scratch, and both are upper bounds for the monotone
    min. Cost ∝ the AFFECTED components' sizes, not the graph."""
    endpoints = (
        dels.select(F.col("src").alias("vertex"))
        .unionByName(dels.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    hit = (
        init.join(endpoints, "vertex")
        .select(F.col("value").alias("_hl"))
        .distinct()
    )
    return init.join(hit, init["value"] == F.col("_hl"), "left").select(
        "vertex",
        F.when(F.col("_hl").isNotNull(), F.col("vertex"))
        .otherwise(F.col("value"))
        .alias("value"),
    )


def streaming_pagerank_maintenance(
    edge_stream: DataFrame,
    labels_dir: str,
    checkpoint_dir: str,
    threshold: float = 1e-7,
    max_iter: int = 100,
):
    """Continuous PageRank maintenance over an append-only edge stream —
    the streaming face of jobs/incremental: each micro-batch warm-starts
    the reference-semantics PageRank from the previous converged vector
    (exact: the fixpoint is unique, so the warm run converges to the SAME
    answer in fewer supersteps — typically 1-3 after a small delta vs the
    cold spectral-gap bound). New vertices enter at the cold init; the
    final normalize re-spreads rank over the grown graph. Mechanics
    (foreachBatch, edge log, label overwrite) shared with
    :func:`streaming_cc_maintenance`; deletions (``op`` column) need no
    repair pass here — PageRank's fixpoint is unique, so any previous
    vector is a valid warm start over whatever the live edge set is.
    Output column: ``rank`` double."""

    def run(all_edges, init, max_it):
        from flexgraph_spark import algorithms

        res = algorithms.pagerank(
            all_edges, threshold=threshold, max_iter=max_it,
            initial_state=init,
        )
        return res, F.col("value").alias("rank")

    return _streaming_maintenance(
        edge_stream, labels_dir, checkpoint_dir, run, max_iter
    )


def streaming_sssp_maintenance(
    edge_stream: DataFrame,
    labels_dir: str,
    checkpoint_dir: str,
    source_vertex: int,
    max_iter: int = 100,
    repair_metrics: list | None = None,
):
    """Continuous single-source shortest-path maintenance over a
    WEIGHTED edge stream (src, dst, weight): per micro-batch, warm-start
    the relaxation from the previous distance vector — exact for edge
    additions by the same argument as CC (old distances are per-vertex
    UPPER bounds and min-plus relaxation is monotone from any
    upper-bound init; a new edge can only shorten paths). New vertices
    enter at +inf (the cold init). Output column: ``dist`` double.

    DELETIONS (optional ``op`` column, 'add' | 'del'): a removed edge can
    LENGTHEN distances, which monotone relaxation cannot express — so
    :func:`_sssp_delete_reset` computes the affected closure (vertices
    whose shortest path may have used a deleted edge, Ramalingam–Reps
    style) and resets exactly those to +inf before the warm run; the
    rest keep their still-exact distances. Completes the maintenance
    triad with :func:`streaming_cc_maintenance` /
    :func:`streaming_pagerank_maintenance`."""

    def run(all_edges, init, max_it):
        from flexgraph_spark import algorithms

        res = algorithms.sssp(
            all_edges, source_vertex=source_vertex, max_iter=max_it,
            initial_state=init,
        )
        return res, F.col("value").alias("dist")

    return _streaming_maintenance(
        edge_stream, labels_dir, checkpoint_dir, run, max_iter,
        edge_cols=("src", "dst", "weight"),
        reset=_sssp_delete_reset(source_vertex, metrics=repair_metrics),
        # Edge identity is (src, dst): a 'del' need not repeat the exact
        # weight, and a re-'add' with a new weight replaces the edge
        # (the scaffold routes the weight change through the reset pass).
        key_cols=("src", "dst"),
    )


def _sssp_delete_reset(source_vertex: int, eps: float = 1e-9,
                       max_rounds: int = 200, metrics: list | None = None):
    """Decremental SSSP repair (the Ramalingam–Reps affected-set idea,
    re-expressed as DataFrame joins): a deleted edge can LENGTHEN
    distances, and min-plus relaxation never raises a value — so every
    vertex whose shortest path MAY have used a deleted edge must be reset
    to +inf before the warm run.

    Affected closure, overapproximated for safety (resetting too many
    vertices only costs recompute, never correctness):
      * seeds = heads v of deleted edges (u,v,w) with
        dist[v] >= dist[u] + w - eps (the edge could have been v's
        support);
      * propagate forward over LIVE "tight" edges (same eps test) until
        the frontier empties — descendants in any shortest-path DAG are
        covered; rounds ∝ the delta's impact radius.
    Unaffected vertices keep distances that are still EXACT in the new
    graph; affected ones restart at +inf; the source is pinned at 0. All
    initial values are then >= the true distance, which is exactly the
    warm-start precondition of the monotone relaxation.

    ``metrics`` (optional list): each invocation appends
    ``{"deleted_edges", "affected", "rounds"}`` — the decremental-repair
    cost witness: a leaf-edge delete must report ``affected`` ∝ the
    delete's downstream subtree and ``rounds`` ∝ its impact radius, NOT
    O(V)/O(diameter) (asserted in tests/test_streaming.py)."""

    def reset(init: DataFrame, dels: DataFrame, live: DataFrame) -> DataFrame:
        from flexgraph_spark import gimv

        d_src = init.select(F.col("vertex").alias("src"),
                            F.col("value").alias("_ds"))
        d_dst = init.select(F.col("vertex").alias("dst"),
                            F.col("value").alias("_dd"))

        def tight(edges: DataFrame) -> DataFrame:
            # Relative slack: eps scaled by the magnitude of the values
            # being compared, so large-distance graphs don't miss
            # alternate-support edges to float rounding (absolute 1e-9
            # is smaller than 1 ulp once distances exceed ~2^23).
            slack = eps * F.greatest(
                F.lit(1.0), F.abs(F.col("_dd")),
                F.abs(F.col("_ds") + F.col("weight")),
            )
            return (
                edges.join(d_src, "src").join(d_dst, "dst")
                .filter(F.col("_ds") < gimv.SSSP_INF)
                .filter(
                    F.col("_dd") >= F.col("_ds") + F.col("weight") - slack
                )
            )

        aff = gimv.truncate_plan(
            tight(dels).select(F.col("dst").alias("vertex")).distinct()
        )
        live_tight = gimv.truncate_plan(tight(live).select("src", "dst"))
        frontier = aff
        rounds = 0
        for _ in range(max_rounds):
            nxt = gimv.truncate_plan(
                live_tight.join(
                    frontier.withColumnRenamed("vertex", "src"), "src"
                )
                .select(F.col("dst").alias("vertex"))
                .distinct()
                .join(aff, "vertex", "left_anti")
            )
            if nxt.isEmpty():
                break
            rounds += 1
            aff = gimv.truncate_plan(aff.unionByName(nxt))
            frontier = nxt
        aff = aff.filter(F.col("vertex") != source_vertex)
        if metrics is not None:
            metrics.append({
                "deleted_edges": dels.count(),
                "affected": aff.count(),
                "rounds": rounds,
            })
        return init.join(
            aff.withColumn("_a", F.lit(1)), "vertex", "left"
        ).select(
            "vertex",
            F.when(F.col("_a").isNotNull(), F.lit(gimv.SSSP_INF))
            .otherwise(F.col("value"))
            .alias("value"),
        )

    return reset


def _streaming_maintenance(edge_stream, labels_dir, checkpoint_dir, run,
                           max_iter, edge_cols=("src", "dst"), reset=None,
                           key_cols=None):
    """Shared foreachBatch scaffold for warm-started per-batch graph
    recompute: append the delta to the edge log, warm-start from the
    previous labels, overwrite the labels table (via a tmp read-back so
    the read and write paths stay disjoint within one batch).

    DELETIONS: batches may carry an ``op`` column ('add' | 'del';
    absent column = all adds — anything else raises, so a typo'd op can
    never act as a silent delete). The edge log records (edge, op,
    batch) and the live edge set is last-writer-wins per EDGE IDENTITY
    ``key_cols`` (default: all of ``edge_cols``; weighted algorithms
    pass (src, dst) so a 'del' need not bit-match the original weight,
    and a re-'add' with a new weight replaces the edge) — within a
    batch, 'del' beats 'add'; at corpus scale the same log compacts via
    Iceberg MERGE with identical semantics. ``reset`` (per-algorithm)
    repairs the warm-start vector whenever rows LEFT the live set —
    whether by 'del' or by a weight-changing re-'add' (both can lengthen
    a min-plus value, which monotone relaxation cannot express): the
    effective deleted set is live-before MINUS live-after on the full
    ``edge_cols``, so it carries the pre-batch weight regardless of what
    the 'del' row said. Everything else keeps its still-exact value."""
    key_cols = tuple(key_cols or edge_cols)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        has_op = "op" in batch_df.columns
        batch = batch_df.select(
            *edge_cols,
            (F.lower(F.col("op")) if has_op else F.lit("add")).alias("op"),
        ).filter(F.col("src") != F.col("dst"))
        if has_op:
            bad = (
                batch.filter(~F.col("op").isin("add", "del"))
                .select("op").distinct().limit(5).collect()
            )
            if bad:
                raise ValueError(
                    "streaming maintenance: unknown op value(s) "
                    f"{sorted(r['op'] for r in bad)}; expected 'add' | 'del'"
                )
        edges_path = f"{labels_dir}/edges"
        labels_path = f"{labels_dir}/labels"
        batch.withColumn("_b", F.lit(batch_id)).write.mode("append").parquet(
            edges_path
        )
        log = spark.read.parquet(edges_path)
        w = Window.partitionBy(*key_cols).orderBy(
            F.col("_b").desc(), (F.col("op") == "del").cast("int").desc()
        )

        def live(frame: DataFrame) -> DataFrame:
            return (
                frame.withColumn("_rn", F.row_number().over(w))
                .filter((F.col("_rn") == 1) & (F.col("op") == "add"))
                .select(*edge_cols)
            )

        all_edges = live(log)
        try:
            prev = spark.read.parquet(labels_path)
            init = prev.select(
                "vertex", F.col(prev.columns[1]).alias("value")
            )
        except Exception:  # first batch: cold start
            init = None
        if init is not None and reset is not None:
            # Effective deletions = rows of the pre-batch live set absent
            # from the post-batch live set on the FULL edge_cols: catches
            # plain 'del's (at any claimed weight) and weight-changing
            # re-'add's, and carries the true pre-batch weight.
            dels = live(log.filter(F.col("_b") < batch_id)).join(
                all_edges, list(edge_cols), "left_anti"
            )
            if not dels.isEmpty():
                init = reset(init, dels, all_edges)
        res, value_col = run(all_edges, init, max_iter)
        out = res.state.select(
            "vertex", value_col,
            F.lit(batch_id).alias("batch_id"),
            F.lit(res.iterations).alias("iterations"),
        )
        out.write.mode("overwrite").parquet(f"{labels_path}_tmp")
        spark.read.parquet(f"{labels_path}_tmp").write.mode(
            "overwrite"
        ).parquet(labels_path)

    return (
        edge_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
