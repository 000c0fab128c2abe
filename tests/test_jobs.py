"""Smoke tests for the spark-submit entry points — the CLI layer the
cluster actually launches (north rule: `spark-submit --py-files`). Run
in-process with patched argv; they cover the prepartition -> --blocks
manifest handshake that silently corrupted results pre-round-2 when
run-time p disagreed with build-time p."""

import json
import sys
from pathlib import Path

import pytest

import jobs.cc as cc_job
import jobs.pagerank as pr_job
import jobs.prepartition as prep_job


@pytest.fixture()
def edges_parquet(spark, tmp_path):
    from flexgraph_spark import fixtures

    p = str(tmp_path / "edges")
    fixtures.edges_df(spark, fixtures.rand_er(40, 0.15, seed=11)).write.parquet(p)
    return p


def _run(mod, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def test_prepartition_then_pagerank_blocks(spark, edges_parquet, tmp_path):
    blocks_out = str(tmp_path / "blocks")
    _run(prep_job, ["--edges", edges_parquet, "--output", blocks_out,
                    "--num-partitions", "4"])
    assert json.loads((Path(blocks_out) / "_STATS.json").read_text())["p"] == 4

    ranks_out = str(tmp_path / "ranks")
    ck = str(tmp_path / "ckpt")
    _run(pr_job, ["--edges", edges_parquet, "--output", ranks_out,
                  "--engine", "blocked", "--blocks", blocks_out,
                  "--checkpoint-dir", ck, "--max-iter", "3"])
    ranks = spark.read.parquet(ranks_out)
    assert ranks.count() == 40
    # blocked checkpointing ran (ADVICE round 1: this combination silently
    # did nothing)
    manifest = Path(ck) / "pagerank_blocked" / "manifest.jsonl"
    assert manifest.exists()
    assert len(manifest.read_text().splitlines()) == 3


def test_blocks_p_mismatch_errors(spark, edges_parquet, tmp_path):
    blocks_out = str(tmp_path / "blocks")
    _run(prep_job, ["--edges", edges_parquet, "--output", blocks_out,
                    "--num-partitions", "4"])
    with pytest.raises(SystemExit, match="p=4"):
        _run(cc_job, ["--edges", edges_parquet, "--output", str(tmp_path / "o"),
                      "--engine", "blocked", "--blocks", blocks_out,
                      "--num-partitions", "8"])


def test_pagerank_flat_job(spark, edges_parquet, tmp_path):
    out = str(tmp_path / "ranks_flat")
    _run(pr_job, ["--edges", edges_parquet, "--output", out,
                  "--max-iter", "5", "--engine", "auto"])
    assert spark.read.parquet(out).count() == 40


def test_batch_ppr_job(spark, edges_parquet, tmp_path):
    import jobs.ppr as ppr_job

    out = str(tmp_path / "ppr")
    _run(ppr_job, ["--edges", edges_parquet, "--output", out,
                   "--sources", "0,1,2", "--max-iter", "5"])
    df = spark.read.parquet(out)
    assert set(df.columns) == {"vertex", "source", "ppr"}
    assert df.select("source").distinct().count() == 3
    # blocked engine: the 'batch' kernel family (k-column matrices per
    # block) serves the same job
    out_b = str(tmp_path / "ppr_blocked")
    _run(ppr_job, ["--edges", edges_parquet, "--output", out_b,
                   "--sources", "0,1,2", "--max-iter", "5",
                   "--engine", "blocked", "--num-partitions", "2"])
    dfb = spark.read.parquet(out_b)
    assert set(dfb.columns) == {"vertex", "source", "ppr"}
    assert dfb.select("source").distinct().count() == 3


def test_sssp_job_multi_source_landmarks(spark, tmp_path):
    import jobs.sssp as sssp_job

    ep = str(tmp_path / "wedges")
    spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    ).write.parquet(ep)
    # scalar face unchanged
    out1 = str(tmp_path / "d1")
    _run(sssp_job, ["--edges", ep, "--output", out1, "--source-vertex", "0"])
    assert spark.read.parquet(out1).count() == 4
    # batched landmarks: long-form output, one column per source
    out2 = str(tmp_path / "d2")
    _run(sssp_job, ["--edges", ep, "--output", out2,
                    "--source-vertex", "0", "2"])
    df = spark.read.parquet(out2)
    assert set(df.columns) == {"vertex", "landmark", "dist"}
    assert df.select("landmark").distinct().count() == 2
    # blocked engine: the 'batch' kernel family under the min reduce
    out3 = str(tmp_path / "d3")
    _run(sssp_job, ["--edges", ep, "--output", out3,
                    "--source-vertex", "0", "2", "--engine", "blocked",
                    "--num-partitions", "2"])
    a = {(r.vertex, r.landmark): r.dist for r in df.collect()}
    b = {(r.vertex, r.landmark): r.dist
         for r in spark.read.parquet(out3).collect()}
    assert a == b


def test_temporal_job(spark, tmp_path):
    import jobs.temporal as temporal_job

    ep = str(tmp_path / "tedges")
    spark.createDataFrame(
        [(0, 1, 5.0), (1, 2, 3.0), (0, 3, 1.0), (3, 2, 4.0)],
        "src long, dst long, t double",
    ).write.parquet(ep)
    out = str(tmp_path / "arrivals")
    _run(temporal_job, ["--edges", ep, "--output", out,
                        "--source-vertex", "0"])
    from flexgraph_spark.gimv import SSSP_INF
    got = {r.vertex: r.value for r in spark.read.parquet(out).collect()}
    assert got == {0: 0.0, 1: 5.0, 2: 4.0, 3: 1.0}
    assert all(v < SSSP_INF for v in got.values())
    # latest-departure dual toward vertex 2 with a deadline
    out_l = str(tmp_path / "departures")
    _run(temporal_job, ["--edges", ep, "--output", out_l,
                        "--source-vertex", "2", "--mode", "latest",
                        "--deadline", "6"])
    dep = {r.vertex: r.departure for r in spark.read.parquet(out_l).collect()}
    assert dep[2] == 6.0 and dep[3] == 4.0 and dep[0] == 1.0
    with pytest.raises(SystemExit, match="deadline"):
        _run(temporal_job, ["--edges", ep, "--output", out_l,
                            "--source-vertex", "2", "--mode", "latest"])
    # fastest durations from 0
    out_f = str(tmp_path / "durations")
    _run(temporal_job, ["--edges", ep, "--output", out_f,
                        "--source-vertex", "0", "--mode", "fastest"])
    dur = {r.vertex: r.duration for r in spark.read.parquet(out_f).collect()}
    assert dur[0] == 0.0 and dur[2] == 3.0  # depart t=1 via 3, arrive t=4


def test_walks_job(spark, edges_parquet, tmp_path):
    import jobs.walks as walks_job

    out = str(tmp_path / "walks")
    _run(walks_job, ["--edges", edges_parquet, "--output", out,
                     "--walk-length", "3", "--num-walks", "2"])
    df = spark.read.parquet(out)
    assert set(df.columns) == {"start", "walk_id", "step", "vertex"}
    assert df.agg({"step": "max"}).first()[0] == 3


def test_dedup_job(spark, tmp_path):
    import jobs.dedup as dedup_job

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "the quick brown fox jumps over the lazy dot"),
         (2, "entirely different content here")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out = str(tmp_path / "clusters")
    _run(dedup_job, ["--documents", src, "--output", out,
                     "--threshold", "0.5"])
    df = spark.read.parquet(out)
    got = {r.doc_id: (r.cluster_id, r.is_canonical) for r in df.collect()}
    assert got[0] == (0, True) and got[1] == (0, False) and got[2] == (2, True)


def test_louvain_job(spark, edges_parquet, tmp_path):
    import jobs.louvain as louvain_job

    out = str(tmp_path / "communities")
    _run(louvain_job, ["--edges", edges_parquet, "--output", out,
                       "--levels", "2", "--rounds", "2"])
    df = spark.read.parquet(out)
    assert set(df.columns) == {"vertex", "label"}
    assert df.count() == df.select("vertex").distinct().count()
    # blocked engine is rejected explicitly (label-keyed joins)
    with pytest.raises(SystemExit):
        _run(louvain_job, ["--edges", edges_parquet, "--output", out,
                           "--engine", "blocked"])


def test_msf_job(spark, tmp_path):
    import jobs.msf as msf_job
    from flexgraph_spark import fixtures

    # weighted edges: deterministic weights over a random graph
    pairs = fixtures.rand_er(30, 0.2, seed=5)
    wdf = spark.createDataFrame(
        [(a, b, float((a * 7 + b * 3) % 10 + 1)) for a, b in pairs],
        "src long, dst long, weight double",
    )
    src = str(tmp_path / "wedges")
    wdf.write.parquet(src)
    out = str(tmp_path / "forest")
    _run(msf_job, ["--edges", src, "--output", out])
    df = spark.read.parquet(out)
    assert set(df.columns) == {"a", "b", "w"}
    # forest size: n_vertices - n_components (checked via the CC engine)
    from flexgraph_spark import algorithms

    und = wdf.selectExpr("src", "dst")
    cc = algorithms.connected_components_star(und)
    n = cc.state.count()
    c = cc.state.select("value").distinct().count()
    assert df.count() == n - c
    # unweighted input is rejected
    unw = str(tmp_path / "unweighted")
    wdf.select("src", "dst").write.parquet(unw)
    with pytest.raises(SystemExit):
        _run(msf_job, ["--edges", unw, "--output", out])


def test_fabp_job(spark, edges_parquet, tmp_path):
    import jobs.fabp as fabp_job

    priors_p = str(tmp_path / "priors")
    spark.createDataFrame(
        [(0, 1.0), (1, -1.0)], "vertex long, prior double"
    ).write.parquet(priors_p)
    out = str(tmp_path / "fabp")
    _run(fabp_job, ["--edges", edges_parquet, "--output", out,
                    "--priors", priors_p, "--homophily", "0.01",
                    "--max-iter", "5"])
    df = spark.read.parquet(out)
    assert set(df.columns) == {"vertex", "value"}
    assert df.count() > 0
    # blocked engine needs the PREDICATE prior form (--prior-mod), not a
    # parquet prior table (the statics dissolve into the kernels)
    with pytest.raises(SystemExit):
        _run(fabp_job, ["--edges", edges_parquet, "--output", out,
                        "--priors", priors_p, "--engine", "blocked"])
    out_b = str(tmp_path / "fabp_blocked")
    _run(fabp_job, ["--edges", edges_parquet, "--output", out_b,
                    "--prior-mod", "2", "--engine", "blocked",
                    "--homophily", "0.01", "--max-iter", "5",
                    "--num-partitions", "2"])
    dfb = spark.read.parquet(out_b)
    assert set(dfb.columns) == {"vertex", "value"}
    assert dfb.count() > 0


def test_dsir_job(spark, tmp_path):
    import jobs.dsir as dsir_job

    docs = spark.createDataFrame(
        [(i, ("spark data engine " * 3) if i % 2 == 0 else "bake bread now",
          "en" if i % 2 == 0 else "fr")
         for i in range(10)],
        "doc_id long, text string, lang string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    out = str(tmp_path / "weights")
    _run(dsir_job, ["--documents", src, "--output", out,
                    "--target-filter", "lang = 'en'",
                    "--num-buckets", "64"])
    w = spark.read.parquet(out)
    assert w.count() == 10
    got = {r.doc_id: r.logw for r in w.collect()}
    assert min(got[i] for i in range(0, 10, 2)) > max(
        got[i] for i in range(1, 10, 2)
    )

    sel = str(tmp_path / "selected")
    _run(dsir_job, ["--documents", src, "--output", sel,
                    "--target-filter", "lang = 'en'",
                    "--num-buckets", "64", "--select-k", "3"])
    assert spark.read.parquet(sel).count() == 3

    # exactly one of --target / --target-filter
    with pytest.raises(SystemExit):
        _run(dsir_job, ["--documents", src, "--output", out])


def test_clean_job_pipeline(spark, tmp_path):
    import jobs.clean as clean_job

    long_filler = " ".join(f"unique{i}" for i in range(15))
    shared = "alpha beta gamma delta epsilon"
    rows = [
        # passes quality; shares the paragraph AND a 5-gram span
        (1, f"{long_filler}\nmail me at a@b.com\n{shared} one"),
        (2, f"{shared} two\n{long_filler} extra tail words here"),
        # fails quality (too short)
        (3, "tiny"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out = str(tmp_path / "clean")
    _run(clean_job, ["--documents", src, "--output", out,
                     "--min-tokens", "5"])
    got = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    # doc 3 cut by the quality gate
    assert set(got) == {1, 2}
    # PII redacted before dedup
    assert "<EMAIL>" in got[1] and "a@b.com" not in got[1]
    # the shared 5-gram span is gone from both survivors
    for t in got.values():
        assert "alpha beta gamma delta epsilon" not in t
    # stage subset runs and unknown stage errors
    out2 = str(tmp_path / "pii_only")
    _run(clean_job, ["--documents", src, "--output", out2,
                     "--stages", "pii"])
    assert spark.read.parquet(out2).count() == 3
    with pytest.raises(SystemExit):
        _run(clean_job, ["--documents", src, "--output", out2,
                         "--stages", "nope"])


def test_clean_job_blocklist_stage(spark, tmp_path):
    import jobs.clean as clean_job

    rows = [
        (1, "a perfectly ordinary clean document body"),
        (2, "this one mentions forbidden topics"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out = str(tmp_path / "kept")
    # --block-terms auto-enables the stage alongside the explicit list
    _run(clean_job, ["--documents", src, "--output", out,
                     "--stages", "blocklist", "--block-terms", "forbidden"])
    kept = spark.read.parquet(out)
    assert [r.doc_id for r in kept.collect()] == [1]
    # blocklist stage without terms is an error
    with pytest.raises(SystemExit):
        _run(clean_job, ["--documents", src, "--output", out,
                         "--stages", "blocklist"])


def test_incremental_job_warm_start_and_noop(spark, tmp_path):
    from pyspark.sql import functions as F

    import jobs.incremental as inc_job
    from flexgraph_spark import algorithms

    old_edges = spark.createDataFrame(
        [(i, (i + 1) % 20) for i in range(20)], "src long, dst long"
    )
    new_edges = old_edges.union(
        spark.createDataFrame([(0, 10), (5, 15)], "src long, dst long")
    )
    p_old, p_new = str(tmp_path / "old"), str(tmp_path / "new")
    old_edges.write.parquet(p_old)
    new_edges.write.parquet(p_new)

    base = algorithms.pagerank(old_edges, threshold=1e-7, max_iter=100)
    p_state = str(tmp_path / "state")
    base.state.write.parquet(p_state)

    out = str(tmp_path / "out")
    _run(inc_job, ["--old-edges", p_old, "--new-edges", p_new,
                   "--prev-state", p_state, "--output", out])
    warm = spark.read.parquet(out)
    cold = algorithms.pagerank(new_edges, threshold=1e-7, max_iter=100).state
    joined = warm.withColumnRenamed("value", "w").join(
        cold.withColumnRenamed("value", "c"), "vertex"
    )
    assert joined.filter(F.abs(F.col("w") - F.col("c")) > 1e-5).count() == 0

    # identical snapshots -> state carried over untouched, no recompute
    out2 = str(tmp_path / "out2")
    _run(inc_job, ["--old-edges", p_new, "--new-edges", p_new,
                   "--prev-state", out, "--output", out2])
    a = sorted((r.vertex, r.value) for r in spark.read.parquet(out2).collect())
    b = sorted((r.vertex, r.value) for r in warm.collect())
    assert a == b


def test_similarity_job_simrank(spark, edges_parquet, tmp_path):
    import jobs.similarity as sim_job

    out = str(tmp_path / "simrank")
    _run(sim_job, ["--mode", "simrank", "--edges", edges_parquet,
                   "--output", out, "--queries", "0,1",
                   "--walk-length", "3", "--num-runs", "2"])
    df = spark.read.parquet(out)
    assert set(df.columns) == {"a", "b", "simrank"}
    assert set(r["a"] for r in df.select("a").distinct().collect()) <= {0, 1}


def test_similarity_job_communities(spark, tmp_path):
    import jobs.similarity as sim_job

    rows = [(i, [float(i % 3 == j) + 0.01 * i for j in range(3)])
            for i in range(9)]
    src = str(tmp_path / "emb")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(src)
    out = str(tmp_path / "comm")
    _run(sim_job, ["--mode", "communities", "--embeddings", src,
                   "--output", out, "--k", "2"])
    df = spark.read.parquet(out)
    assert set(df.columns) == {"vec_id", "cluster"}
    assert df.count() == 9


def test_maintain_job_cc_available_now(spark, tmp_path):
    import jobs.maintain as maintain_job

    src = str(tmp_path / "feed")
    import os
    os.makedirs(src)
    spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "src long, dst long"
    ).coalesce(1).write.parquet(f"{src}/b0")
    import glob
    import shutil
    for f in glob.glob(f"{src}/b0/part-*.parquet"):
        shutil.move(f, f"{src}/batch0.parquet")
    shutil.rmtree(f"{src}/b0")

    labels = str(tmp_path / "state")
    _run(maintain_job, [
        "--stream-dir", src, "--labels-dir", labels,
        "--checkpoint-dir", str(tmp_path / "ck"), "--algorithm", "cc",
        "--available-now",
    ])
    got = {r["vertex"]: r["cluster"]
           for r in spark.read.parquet(f"{labels}/labels").collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}


def test_triangles_job_k4_motif(spark, edges_parquet, tmp_path):
    import jobs.triangles as tri_job

    out = str(tmp_path / "k4s")
    _run(tri_job, ["--edges", edges_parquet, "--output", out,
                   "--motif", "k4"])
    df = spark.read.parquet(out)
    assert df.columns == ["k4s"] and df.count() == 1


def test_structure_job_modes(spark, tmp_path):
    import jobs.structure as st_job
    from flexgraph_spark import fixtures

    raw = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5), (5, 6)]
    src = str(tmp_path / "st_edges")
    fixtures.edges_df(spark, raw).write.parquet(src)
    out = str(tmp_path / "bridges")
    _run(st_job, ["--edges", src, "--mode", "bridges", "--output", out])
    got = {(r.a, r.b) for r in spark.read.parquet(out).collect()}
    assert got == {(2, 3), (5, 6)}
    out2 = str(tmp_path / "ecc")
    _run(st_job, ["--edges", src, "--mode", "2ecc", "--output", out2])
    labels = {r.vertex: r.ecc_label for r in spark.read.parquet(out2).collect()}
    assert labels[0] == labels[1] == labels[2] == 0
    out3 = str(tmp_path / "spread")
    _run(st_job, ["--edges", src, "--mode", "influence", "--seed-mod", "6",
                  "--prob", "1.0", "--output", out3])
    # p=1.0 keeps every edge: seeds {0, 6} flood the whole graph
    assert spark.read.parquet(out3).count() == 7
    with pytest.raises(SystemExit):
        _run(st_job, ["--edges", src, "--mode", "bridges", "--engine",
                      "blocked", "--output", out])


def test_analytics_job_quantiles_and_entity(spark, tmp_path):
    import jobs.analytics as an_job

    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "doc_id long, n_chars double"
    ).write.parquet(docs)
    out = str(tmp_path / "q")
    _run(an_job, ["--input", docs, "--mode", "quantiles", "--column",
                  "n_chars", "--qs", "0.5,1.0", "--output", out])
    got = {r.pct: r.val for r in spark.read.parquet(out).collect()}
    assert got == {50: 50.0, 100: 100.0}
    recs = str(tmp_path / "recs")
    spark.createDataFrame(
        [(1, "alice johnson", "A"), (2, "alice johnson jr", "A"),
         (3, "bob smith xyz", "A")],
        "rec_id long, name string, blk string",
    ).write.parquet(recs)
    out2 = str(tmp_path / "ents")
    _run(an_job, ["--input", recs, "--mode", "entity", "--text-cols", "name",
                  "--output", out2])
    ids = {r.rec_id: r.entity_id for r in spark.read.parquet(out2).collect()}
    assert ids[1] == ids[2] == 1 and ids[3] == 3


def test_dedup_job_fork_mode(spark, tmp_path):
    import jobs.dedup as dd_job

    rows = ([("A", f"d{i}") for i in range(10)]
            + [("A_fork", f"d{i}") for i in range(8)]
            + [("A_fork", "u1"), ("A_fork", "u2")]
            + [("B", "b1"), ("B", "b2")])
    src = str(tmp_path / "fork_docs")
    spark.createDataFrame(rows, "source string, text string").write.parquet(src)
    for method in ("exact", "minhash"):
        out = str(tmp_path / f"forks_{method}")
        _run(dd_job, ["--documents", src, "--mode", "fork", "--method", method,
                      "--threshold", "0.5", "--output", out])
        got = [(r.group_a, r.group_b, r.shared)
               for r in spark.read.parquet(out).collect()]
        assert got == [("A", "A_fork", 8)], method


def test_code_job_callgraph_and_dead(spark, tmp_path):
    import jobs.code as code_job

    rows = [
        ("r1", "src/a.py", "c0", "py",
         "def main():\n    return used()\n\ndef used():\n    return 1\n"),
        ("r1", "src/b.py", "c0", "py", "def orphan():\n    return used()\n"),
    ]
    src = str(tmp_path / "files")
    spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).write.parquet(src)
    out = str(tmp_path / "cg")
    _run(code_job, ["--repo-table", src, "--mode", "callgraph", "--output", out])
    got = {(r.caller, r.callee) for r in spark.read.parquet(out).collect()}
    assert got == {("main", "used"), ("orphan", "used")}
    out2 = str(tmp_path / "dead")
    _run(code_job, ["--repo-table", src, "--mode", "dead", "--output", out2])
    assert {r.fn_name for r in spark.read.parquet(out2).collect()} == {"orphan"}


def test_kcore_job_weighted_mode(spark, tmp_path):
    import jobs.kcore as kcore_job

    src = str(tmp_path / "wedges")
    spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 2.0), (0, 2, 2.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    ).write.parquet(src)
    out = str(tmp_path / "score")
    _run(kcore_job, ["--edges", src, "--output", out,
                     "--weighted", "--threshold", "4.0"])
    assert {r.vertex for r in spark.read.parquet(out).collect()} == {0, 1, 2}


def test_code_job_complexity_mode(spark, tmp_path):
    import jobs.code as code_job

    rows = [("r1", "a.py", "c0", "py",
             "def f():\n    if a and b:\n        return 1\n    return 0\n")]
    src = str(tmp_path / "cfiles")
    spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).write.parquet(src)
    out = str(tmp_path / "cx")
    _run(code_job, ["--repo-table", src, "--mode", "complexity",
                    "--output", out])
    [r] = spark.read.parquet(out).collect()
    assert (r.fn_name, r.complexity) == ("f", 3)  # 1 + if + and


def test_similarity_job_communities_lsh_candidates(spark, tmp_path):
    import jobs.similarity as sim_job

    rows = [(i, [float(i % 3 == j) + 0.01 * i for j in range(3)])
            for i in range(9)]
    src = str(tmp_path / "emb_lsh")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(src)
    out = str(tmp_path / "comm_lsh")
    _run(sim_job, ["--mode", "communities", "--embeddings", src,
                   "--output", out, "--k", "2", "--candidates", "lsh"])
    df = spark.read.parquet(out)
    assert set(df.columns) == {"vec_id", "cluster"} and df.count() == 9


def test_hits_job_both_engines(spark, edges_parquet, tmp_path):
    import jobs.hits as hits_job

    out_f = str(tmp_path / "hits_flat")
    _run(hits_job, ["--edges", edges_parquet, "--output", out_f,
                    "--max-iter", "3"])
    out_b = str(tmp_path / "hits_blocked")
    _run(hits_job, ["--edges", edges_parquet, "--output", out_b,
                    "--max-iter", "3", "--engine", "blocked",
                    "--num-partitions", "2"])
    f = {r.vertex: (round(r.hub, 9), round(r.auth, 9))
         for r in spark.read.parquet(out_f).collect()}
    b = {r.vertex: (round(r.hub, 9), round(r.auth, 9))
         for r in spark.read.parquet(out_b).collect()}
    assert f == b
