"""Streaming ≡ batch equivalence for the events operators.

The transformations are built only from streaming-capable constructs, so
the SAME function body runs as an incremental plan (readStream + watermark
+ availableNow trigger) and as a batch plan (the DuckDB-oracled driver
queries). These tests drain the stream into a memory sink and compare
against the batch result; multi-file input + maxFilesPerTrigger=1 forces
multiple micro-batches so cross-batch state is actually exercised.
"""

import shutil
import time
from pathlib import Path

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from flexgraph_spark import streaming

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(tmp_path_factory):
    """events.parquet split into two files (forces ≥2 micro-batches)."""
    d = tmp_path_factory.mktemp("events")
    t = pq.read_table(f"{SF}/events.parquet")
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), str(d / "part-0.parquet"))
    pq.write_table(t.slice(half), str(d / "part-1.parquet"))
    return str(d)


def _drain(q):
    q.awaitTermination(120)


def _rows(df, *key):
    return sorted(map(tuple, df.collect()))


def test_windowed_counts_stream_equals_batch(spark, event_dir):
    batch = streaming.windowed_event_counts(spark.read.parquet(event_dir))
    stream = streaming.windowed_event_counts(
        streaming.read_event_stream(spark, event_dir, max_files_per_trigger=1)
    )
    q = streaming.run_to_memory(stream, "wec", mode="complete")
    _drain(q)
    got = _rows(spark.table("wec"))
    exp = _rows(batch)
    assert got == exp and len(exp) > 0


def test_sessionize_stream_equals_batch(spark, event_dir):
    batch = streaming.sessionize(spark.read.parquet(event_dir))
    stream = streaming.sessionize(
        streaming.read_event_stream(spark, event_dir, max_files_per_trigger=1)
    )
    q = streaming.run_to_memory(stream, "sess", mode="complete")
    _drain(q)
    got = _rows(spark.table("sess"))
    exp = _rows(batch)
    assert got == exp and len(exp) > 0


def test_running_user_totals_stateful(spark, event_dir):
    """applyInPandasWithState accumulates across micro-batches: the final
    update per user must equal the batch groupBy."""
    from pyspark.sql import functions as F

    stream = streaming.running_user_totals(
        streaming.read_event_stream(spark, event_dir, max_files_per_trigger=1)
    )
    q = streaming.run_to_memory(stream, "running", mode="update")
    _drain(q)
    # update mode appends one row per (user, batch); the final state per
    # user is the row with the max n_events (monotonically increasing)
    final = (
        spark.table("running")
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in final.collect()}
    exp_rows = (
        spark.read.parquet(event_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    )
    exp = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in exp_rows}
    assert got == exp


def test_windowed_degrees_stream_equals_batch(spark, event_dir):
    """Edge stream derived from events (user -> event-bucket): the
    incremental windowed-degree plan equals the batch plan."""
    from pyspark.sql import functions as F

    def as_edges(df):
        return df.select(
            F.col("user_id").alias("src"),
            (F.col("event_id") % 97).alias("dst"),
            F.col("value").alias("weight"),
            "ts",
        )

    batch = streaming.windowed_degrees(as_edges(spark.read.parquet(event_dir)))
    stream = streaming.windowed_degrees(
        as_edges(streaming.read_event_stream(spark, event_dir, max_files_per_trigger=1))
    )
    q = streaming.run_to_memory(stream, "wdeg", mode="complete")
    _drain(q)
    got = _rows(spark.table("wdeg"))
    exp = _rows(batch)
    assert got == exp and len(exp) > 0


def test_windowed_degrees_unweighted_in_direction(spark):
    from datetime import datetime

    from pyspark.sql import functions as F  # noqa: F401

    rows = [
        (1, 2, datetime(2026, 1, 1, 10, 5)),
        (3, 2, datetime(2026, 1, 1, 10, 50)),
        (4, 2, datetime(2026, 1, 1, 11, 5)),
    ]
    e = spark.createDataFrame(rows, "src long, dst long, ts timestamp")
    out = {(r.vertex, r.window_start.hour): (r.n_edges, r.w_degree)
           for r in streaming.windowed_degrees(e, direction="in").collect()}
    assert out == {(2, 10): (2, 2.0), (2, 11): (1, 1.0)}


@pytest.fixture(scope="module")
def doc_dir(tmp_path_factory):
    """documents.parquet split into two files (forces ≥2 micro-batches)."""
    d = tmp_path_factory.mktemp("docs")
    t = pq.read_table(f"{SF}/documents.parquet")
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), str(d / "part-0.parquet"))
    pq.write_table(t.slice(half), str(d / "part-1.parquet"))
    return str(d)


def test_streaming_near_dup_stream_equals_batch(spark, doc_dir):
    """Stream-static LSH probe: the same incoming docs produce the same
    (doc, corpus-match) pairs whether they arrive as a stream or a batch."""
    from flexgraph_spark import textops

    corpus_docs = spark.read.parquet(f"{SF}/documents.parquet")
    index = textops.minhash_band_index(
        corpus_docs, num_hashes=32, bands=16
    ).persist()
    index.count()

    batch = streaming.streaming_near_dup(
        spark.read.parquet(doc_dir), index, num_hashes=32, bands=16, est_cut=0.5
    )
    stream = streaming.streaming_near_dup(
        streaming.read_doc_stream(spark, doc_dir, max_files_per_trigger=1),
        index, num_hashes=32, bands=16, est_cut=0.5,
    )
    q = streaming.run_to_memory(stream, "neardup", mode="complete")
    _drain(q)
    got = _rows(spark.table("neardup"))
    exp = _rows(batch)
    assert got == exp
    index.unpersist()


def test_streaming_near_dup_flags_planted_duplicate(spark, tmp_path):
    """A planted near-copy of a corpus doc is flagged against that doc;
    an unrelated doc is not flagged."""
    from flexgraph_spark import textops

    corpus_rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again", "en"),
        (1, "completely different corpus content about spark engines", "en"),
    ]
    corpus_docs = spark.createDataFrame(
        corpus_rows, "doc_id long, text string, lang string"
    )
    index = textops.minhash_band_index(corpus_docs, num_hashes=32, bands=16)
    incoming = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog again and agaiN", "en"),
            (101, "zzz qqq totally unrelated yyy www nothing shared here", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = streaming.streaming_near_dup(
        incoming, index, num_hashes=32, bands=16, est_cut=0.5
    ).collect()
    matched = {(r.doc_id, r.match_id) for r in out}
    assert (100, 0) in matched
    assert all(d != 101 for d, _ in matched)


def test_streaming_exact_dedup_stream_equals_batch_and_flags(spark, doc_dir):
    """Stateless sha256 probe: stream and batch agree row for row; an
    exact (formatting-normalized) re-crawl of a corpus doc is flagged,
    a fresh doc is not."""
    corpus = spark.createDataFrame(
        [(0, "Hello   World THIS is Doc zero"), (1, "another corpus doc")],
        "doc_id long, text string",
    )
    body = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    index = corpus.select(F.sha2(body, 256).alias("fingerprint"))

    incoming = spark.createDataFrame(
        [(100, "hello world this is doc ZERO"), (101, "never seen before")],
        "doc_id long, text string",
    )
    batch = streaming.streaming_exact_dedup(incoming, index)
    got = {r["doc_id"]: r["is_dup"] for r in batch.collect()}
    assert got == {100: True, 101: False}

    # stream == batch over the parquet doc fixture (append mode: stateless)
    corpus_fp = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.sha2(F.col("text"), 256).alias("fingerprint")
    ).persist()
    corpus_fp.count()
    b2 = streaming.streaming_exact_dedup(
        spark.read.parquet(doc_dir), corpus_fp)
    s2 = streaming.streaming_exact_dedup(
        streaming.read_doc_stream(spark, doc_dir, max_files_per_trigger=1),
        corpus_fp)
    q = streaming.run_to_memory(s2, "exactdedup", mode="append")
    _drain(q)
    assert _rows(spark.table("exactdedup")) == _rows(b2)
    corpus_fp.unpersist()


def test_streaming_cc_maintenance_matches_cold_cc(spark, tmp_path):
    """Three micro-batches of an edge stream: final labels must equal a
    cold CC over the union, and warm batches must converge in <= the cold
    iteration count (the warm start can only help)."""
    from flexgraph_spark import algorithms, streaming

    src_dir = str(tmp_path / "stream_src")
    # batch 1: two chains; batch 2: extend one; batch 3: bridge them
    batches = [
        [(0, 1), (1, 2), (10, 11)],
        [(2, 3), (11, 12)],
        [(3, 10)],
    ]
    import os

    os.makedirs(src_dir)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "src long, dst long").coalesce(1).write.parquet(
            f"{src_dir}/b{i}", mode="overwrite"
        )
        # file source ingests files under one dir; move part files up
        import glob
        import shutil

        for f in glob.glob(f"{src_dir}/b{i}/part-*.parquet"):
            shutil.move(f, f"{src_dir}/batch_{i}.parquet")
        shutil.rmtree(f"{src_dir}/b{i}")

    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    labels_dir = str(tmp_path / "cc_state")
    q = streaming.streaming_cc_maintenance(
        stream, labels_dir, str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)

    got = {
        r["vertex"]: r["cluster"]
        for r in spark.read.parquet(f"{labels_dir}/labels").collect()
    }
    all_edges = [e for b in batches for e in b]
    cold = algorithms.connected_components(
        spark.createDataFrame(all_edges, "src long, dst long")
    )
    want = {r["vertex"]: int(r["value"]) for r in cold.state.collect()}
    assert got == want
    # everything merged into one component rooted at 0
    assert set(got.values()) == {0}
    # the last (bridge) batch warm-started from near-converged labels
    last = spark.read.parquet(f"{labels_dir}/labels").select(
        "batch_id", "iterations"
    ).first()
    assert last["batch_id"] == 2
    assert last["iterations"] <= cold.iterations + 1


def test_streaming_pagerank_maintenance_matches_cold(spark, tmp_path):
    """Two micro-batches; final warm-maintained ranks equal a cold
    converged run on the union (unique fixpoint), in fewer supersteps."""
    import glob
    import os
    import shutil

    from flexgraph_spark import algorithms, streaming

    src_dir = str(tmp_path / "stream_src")
    os.makedirs(src_dir)
    batches = [
        [(i, (i + 1) % 20) for i in range(20)] + [(0, 10), (5, 15)],
        [(3, 17), (8, 2)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "src long, dst long").coalesce(1).write.parquet(
            f"{src_dir}/b{i}", mode="overwrite"
        )
        for f in glob.glob(f"{src_dir}/b{i}/part-*.parquet"):
            shutil.move(f, f"{src_dir}/batch_{i}.parquet")
        shutil.rmtree(f"{src_dir}/b{i}")

    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    labels_dir = str(tmp_path / "pr_state")
    q = streaming.streaming_pagerank_maintenance(
        stream, labels_dir, str(tmp_path / "ckpt_pr")
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)

    warm = spark.read.parquet(f"{labels_dir}/labels")
    all_edges = [e for b in batches for e in b]
    cold = algorithms.pagerank(
        spark.createDataFrame(all_edges, "src long, dst long")
    )
    want = {r["vertex"]: r["value"] for r in cold.state.collect()}
    got = {r["vertex"]: r["rank"] for r in warm.collect()}
    assert set(got) == set(want)
    for v, r in got.items():
        assert abs(r - want[v]) < 1e-6
    row = warm.select("batch_id", "iterations").first()
    assert row["batch_id"] == 1 and row["iterations"] <= cold.iterations


def test_streaming_sssp_maintenance_matches_cold(spark, tmp_path):
    """A later batch adds a SHORTCUT edge; the warm-started relaxation
    must settle to the same distances as a cold run on the union."""
    import glob
    import os
    import shutil

    from flexgraph_spark import algorithms, streaming

    src_dir = str(tmp_path / "stream_w")
    os.makedirs(src_dir)
    batches = [
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)],
        [(0, 3, 1.5)],  # shortcut: dist(3) 3.0 -> 1.5, dist(4) 4.0 -> 2.5
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "src long, dst long, weight double"
        ).coalesce(1).write.parquet(f"{src_dir}/b{i}", mode="overwrite")
        for f in glob.glob(f"{src_dir}/b{i}/part-*.parquet"):
            shutil.move(f, f"{src_dir}/batch_{i}.parquet")
        shutil.rmtree(f"{src_dir}/b{i}")

    stream = (
        spark.readStream.schema("src long, dst long, weight double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    labels_dir = str(tmp_path / "sssp_state")
    q = streaming.streaming_sssp_maintenance(
        stream, labels_dir, str(tmp_path / "ckpt_s"), source_vertex=0
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)

    got = {r["vertex"]: r["dist"]
           for r in spark.read.parquet(f"{labels_dir}/labels").collect()}
    cold = algorithms.sssp(
        spark.createDataFrame(
            [e for b in batches for e in b], "src long, dst long, weight double"
        ),
        source_vertex=0,
    )
    want = {r["vertex"]: r["value"] for r in cold.state.collect()}
    assert got == want
    assert got[3] == 1.5 and got[4] == 2.5


def _write_batches(spark, src_dir, batches, schema):
    import glob
    import os
    import shutil

    os.makedirs(src_dir)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src_dir}/b{i}", mode="overwrite"
        )
        for f in glob.glob(f"{src_dir}/b{i}/part-*.parquet"):
            shutil.move(f, f"{src_dir}/batch_{i}.parquet")
        shutil.rmtree(f"{src_dir}/b{i}")


def test_streaming_cc_maintenance_delete_splits_component(spark, tmp_path):
    """Decremental gate: a batch DELETES the bridge of a merged
    component; the warm-maintained labels must equal a cold CC over the
    live edge set (the split is recovered), and an untouched component
    keeps its label without a cold restart."""
    from flexgraph_spark import algorithms, streaming

    src_dir = str(tmp_path / "stream_del")
    batches = [
        [(0, 1, "add"), (1, 2, "add"), (10, 11, "add"), (11, 12, "add"),
         (100, 101, "add")],
        [(2, 10, "add")],   # bridge: merges {0..2} with {10..12}
        [(2, 10, "del")],   # delete the bridge: split back
    ]
    _write_batches(spark, src_dir, batches, "src long, dst long, op string")
    stream = (
        spark.readStream.schema("src long, dst long, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    labels_dir = str(tmp_path / "cc_del_state")
    q = streaming.streaming_cc_maintenance(
        stream, labels_dir, str(tmp_path / "ckpt_del")
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)

    got = {r["vertex"]: r["cluster"]
           for r in spark.read.parquet(f"{labels_dir}/labels").collect()}
    live = [(0, 1), (1, 2), (10, 11), (11, 12), (100, 101)]
    cold = algorithms.connected_components(
        spark.createDataFrame(live, "src long, dst long"))
    want = {r["vertex"]: int(r["value"]) for r in cold.state.collect()}
    assert got == want
    assert got[10] == got[11] == got[12] == 10  # split recovered
    assert got[0] == got[1] == got[2] == 0
    assert got[100] == got[101] == 100          # untouched component


def test_streaming_sssp_maintenance_delete_lengthens_and_disconnects(
        spark, tmp_path):
    """Decremental gate: deleting the shortest-path edge must LENGTHEN
    dist(2) to the alternate route (monotone relaxation alone could
    never raise it), and deleting the only edge into 4 must return it to
    +inf. Final state equals a cold run on the live edges."""
    from flexgraph_spark import algorithms, streaming

    src_dir = str(tmp_path / "stream_wdel")
    batches = [
        [(0, 1, 1.0, "add"), (1, 2, 1.0, "add"), (0, 3, 5.0, "add"),
         (3, 2, 1.0, "add"), (2, 4, 1.0, "add")],
        [(1, 2, 1.0, "del")],   # dist(2): 2.0 -> 6.0, dist(4): 3.0 -> 7.0
        [(2, 4, 1.0, "del")],   # 4 becomes unreachable
    ]
    _write_batches(
        spark, src_dir, batches, "src long, dst long, weight double, op string")
    stream = (
        spark.readStream.schema("src long, dst long, weight double, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    labels_dir = str(tmp_path / "sssp_del_state")
    q = streaming.streaming_sssp_maintenance(
        stream, labels_dir, str(tmp_path / "ckpt_wdel"), source_vertex=0
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)

    got = {r["vertex"]: r["dist"]
           for r in spark.read.parquet(f"{labels_dir}/labels").collect()}
    live = [(0, 1, 1.0), (0, 3, 5.0), (3, 2, 1.0)]
    cold = algorithms.sssp(
        spark.createDataFrame(live, "src long, dst long, weight double"),
        source_vertex=0)
    want = {r["vertex"]: r["value"] for r in cold.state.collect()}
    # the maintained table remembers vertices 2's/4's existence even after
    # their edges vanish; the cold graph never saw 4's edge at all — align
    # on the intersection plus explicit checks
    for v, d in want.items():
        assert got[v] == d, (v, got[v], d)
    assert got[1] == 1.0 and got[2] == 6.0
    # 4 lost its only incident edge: it leaves the graph (and the state),
    # exactly like the cold run over the live edges
    assert 4 not in got and 4 not in want


def test_streaming_maintenance_re_add_after_delete(spark, tmp_path):
    """Last-writer-wins edge log: add -> del -> add leaves the edge LIVE
    and the labels merge again."""
    from flexgraph_spark import streaming

    src_dir = str(tmp_path / "stream_reads")
    batches = [
        [(0, 1, "add"), (10, 11, "add")],
        [(0, 10, "add")],
        [(0, 10, "del")],
        [(0, 10, "add")],
    ]
    _write_batches(spark, src_dir, batches, "src long, dst long, op string")
    stream = (
        spark.readStream.schema("src long, dst long, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    labels_dir = str(tmp_path / "readd_state")
    q = streaming.streaming_cc_maintenance(
        stream, labels_dir, str(tmp_path / "ckpt_readd")
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)
    got = {r["vertex"]: r["cluster"]
           for r in spark.read.parquet(f"{labels_dir}/labels").collect()}
    assert set(got.values()) == {0}  # everything one component again


def test_sssp_repair_cost_proportional_to_impact_radius(spark, tmp_path):
    """Decremental-repair COST witness (the Ramalingam–Reps claim, now
    measured, not just asserted in prose): on a 40-vertex chain with a
    leaf hanging off vertex 1, deleting the leaf edge must reset exactly
    the leaf (affected = 1, rounds = 0 — its subtree), and deleting the
    mid-chain edge (20,21) must reset exactly the 20-vertex downstream
    suffix with rounds ∝ its depth — never O(V) / O(diameter-of-graph)
    relative to the untouched prefix."""
    from flexgraph_spark import streaming

    n = 40
    chain = [(i, i + 1, 1.0, "add") for i in range(n)]
    batches = [
        chain + [(1, 100, 1.0, "add")],
        [(1, 100, 1.0, "del")],      # leaf: subtree = {100}
        [(20, 21, 1.0, "del")],      # mid-chain: subtree = {21..40}
    ]
    src_dir = str(tmp_path / "stream_cost")
    _write_batches(
        spark, src_dir, batches, "src long, dst long, weight double, op string")
    stream = (
        spark.readStream.schema("src long, dst long, weight double, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    metrics: list[dict] = []
    q = streaming.streaming_sssp_maintenance(
        stream, str(tmp_path / "cost_state"), str(tmp_path / "ckpt_cost"),
        source_vertex=0, repair_metrics=metrics,
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)

    assert len(metrics) == 2, metrics
    leaf, mid = metrics
    assert leaf["deleted_edges"] == 1
    assert leaf["affected"] == 1        # just the leaf, not O(V)
    assert leaf["rounds"] == 0          # no live tight out-edges to chase
    assert mid["deleted_edges"] == 1
    assert mid["affected"] == n - 20    # exactly the downstream suffix
    assert mid["rounds"] <= n - 20      # ∝ impact radius, not graph size
    # the untouched prefix kept exact distances: final state == cold run
    got = {r["vertex"]: r["dist"] for r in
           spark.read.parquet(f"{tmp_path}/cost_state/labels").collect()}
    for v in range(21):
        assert got[v] == float(v), (v, got[v])
    assert all(v not in got or got[v] >= 1e17 for v in range(21, n + 1))


def test_sssp_weight_raising_readd_repairs(spark, tmp_path):
    """A re-'add' of an existing edge with a HIGHER weight lengthens
    distances (equivalent to delete+insert under the (src,dst) edge
    identity) — the maintenance scaffold must route it through the
    repair pass, and a 'del' that quotes a different weight than the
    original add must still kill the edge."""
    from flexgraph_spark import algorithms, streaming

    batches = [
        [(0, 1, 1.0, "add"), (1, 2, 1.0, "add"), (0, 2, 9.0, "add")],
        [(0, 1, 5.0, "add")],        # weight raise: dist(1) 1->5, dist(2) 2->7
        [(1, 2, 123.0, "del")],      # del with wrong weight: edge still dies
    ]
    src_dir = str(tmp_path / "stream_wraise")
    _write_batches(
        spark, src_dir, batches, "src long, dst long, weight double, op string")
    stream = (
        spark.readStream.schema("src long, dst long, weight double, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    labels_dir = str(tmp_path / "wraise_state")
    q = streaming.streaming_sssp_maintenance(
        stream, labels_dir, str(tmp_path / "ckpt_wraise"), source_vertex=0
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)
    got = {r["vertex"]: r["dist"] for r in
           spark.read.parquet(f"{labels_dir}/labels").collect()}
    live = [(0, 1, 5.0), (0, 2, 9.0)]
    cold = algorithms.sssp(
        spark.createDataFrame(live, "src long, dst long, weight double"),
        source_vertex=0)
    want = {r["vertex"]: r["value"] for r in cold.state.collect()}
    for v, d in want.items():
        assert got[v] == d, (v, got[v], d)
    assert got[1] == 5.0 and got[2] == 9.0


def test_streaming_maintenance_rejects_unknown_op(spark, tmp_path):
    """A typo'd op ('remove') must FAIL the batch loudly instead of
    silently acting as a delete (the edge would otherwise vanish from
    the last-writer-wins live set with no error)."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from flexgraph_spark import streaming

    batches = [[(0, 1, "add"), (1, 2, "remove")]]
    src_dir = str(tmp_path / "stream_badop")
    _write_batches(spark, src_dir, batches, "src long, dst long, op string")
    stream = (
        spark.readStream.schema("src long, dst long, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = streaming.streaming_cc_maintenance(
        stream, str(tmp_path / "badop_state"), str(tmp_path / "ckpt_badop")
    ).trigger(availableNow=True).start()
    with pytest.raises(StreamingQueryException, match="unknown op"):
        q.awaitTermination(300)
