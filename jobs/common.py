"""Shared CLI plumbing for the spark-submit job entry points.

Launch pattern (north_rule):

    scripts/make_pyfiles.sh           # builds dist/flexgraph_spark.zip
    spark-submit --py-files dist/flexgraph_spark.zip jobs/pagerank.py \
        --edges hdfs://.../edges.parquet --output hdfs://.../ranks \
        --checkpoint-dir hdfs://.../ckpt --engine blocked

On a cluster, spark-submit owns master/executor conf; these scripts never
set a master. ``--repo-table`` accepts the Iceberg-style source table
(repo, path, commit, lang, content) and derives the link graph first
(flexgraph_spark.graph.derive_graph); ``--edges`` accepts a ready
(src, dst[, weight]) parquet table.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--edges", help="parquet path of (src, dst[, weight])")
    src.add_argument(
        "--repo-table",
        help="parquet/Iceberg path of (repo, path, commit, lang, content); "
        "the link graph is derived first",
    )
    p.add_argument("--output", required=True, help="output parquet path")
    p.add_argument(
        "--expand", choices=["directed", "undirected", "transposed"],
        default="directed",
        help="direction expansion applied at load "
             "(UnweightedGraphPrepartitioning.java:105-148)",
    )
    p.add_argument("--checkpoint-dir", help="durable per-iteration checkpoints")
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--engine", choices=["flat", "blocked", "auto"], default="flat",
                   help="auto picks by the measured crossover "
                        "(BENCH/BASELINE.md): blocked at >=1M edges/core")
    p.add_argument("--num-partitions", type=int, default=None)
    p.add_argument("--dense-threshold", type=int, default=None,
                   help="hub out-degree cutoff (default 100, or the blocks "
                        "manifest value with --blocks)")
    p.add_argument(
        "--blocks",
        help="path of prepartitioned CSR blocks (jobs/prepartition.py); "
        "only used with --engine blocked",
    )
    return p


def get_session(app: str) -> SparkSession:
    from flexgraph_spark.session import get_spark

    return get_spark(app, master=None)


def load_edges(spark: SparkSession, args) -> DataFrame:
    if args.edges:
        edges = spark.read.parquet(args.edges)
    else:
        from flexgraph_spark.graph import derive_graph, read_repo_table

        # Iceberg identifier/path or parquet dir — read_repo_table probes
        # Iceberg first (the north-rule input shape) and falls back
        files = read_repo_table(spark, args.repo_table)
        _, edges = derive_graph(files)
    mode = getattr(args, "expand", "directed")
    if mode != "directed":
        from flexgraph_spark.graph import expand_direction

        edges = expand_direction(edges, mode)
    return edges


def engine_kwargs(spark: SparkSession, args) -> dict:
    """Engine-specific kwargs for algorithms.* calls.

    For ``--engine blocked`` with ``--blocks``, the prepartition manifest
    (_STATS.json) is authoritative for p/dense_threshold: blocks built under
    a different p decode to different (local, block) splits, so silently
    mixing run-time CLI values with prebuilt blocks would corrupt the
    gather. CLI values, when given, must match the manifest."""
    if args.engine == "flat":
        return {"num_partitions": args.num_partitions}
    # blocked or auto (auto + --blocks forces blocked in algorithms._dispatch)
    kw = {"p": args.num_partitions,
          "dense_threshold": args.dense_threshold if args.dense_threshold is not None else 100}
    if args.blocks:
        from flexgraph_spark.blocks import read_blocks

        blocks_df, stats = read_blocks(spark, args.blocks)
        for cli_val, key in ((args.num_partitions, "p"),
                             (args.dense_threshold, "dense_threshold")):
            if cli_val is not None and key in stats and cli_val != stats[key]:
                raise SystemExit(
                    f"--blocks manifest has {key}={stats[key]} but CLI asked "
                    f"for {cli_val}; prebuilt blocks are only valid under "
                    f"their build-time {key}"
                )
        kw = {"p": stats["p"], "dense_threshold": stats["dense_threshold"],
              "blocks": blocks_df}
    return kw


def make_checkpointer(args, edges: DataFrame):
    if not args.checkpoint_dir:
        return None
    from flexgraph_spark.checkpoint import Checkpointer, edges_fingerprint

    return Checkpointer(args.checkpoint_dir, input_fingerprint=edges_fingerprint(edges))
