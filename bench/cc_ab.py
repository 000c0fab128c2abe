"""A/B evidence: HashMin (GIM-V + delta messaging) vs star contraction CC.

Two deterministic in-Spark graphs (no data files):

* ``uniform``: E uniform-random edges over N vertices (xxhash64
  arithmetic) — diameter ~log N / log(E/N); the shape where HashMin's
  O(diameter) supersteps are already fine.
* ``chained``: the same graph plus a P-hop path on fresh vertex ids —
  diameter P. This is the web-scale failure mode for label-walking CC
  (page chains, monotone ID ranges): HashMin needs P supersteps, each a
  full frontier join, while star contraction halves the path every round.

Each (algorithm, graph) cell runs in its own subprocess (fresh JVM).
HashMin on the chained graph is CAPPED (it would need P supersteps); the
report shows rounds completed, convergence flag, and wall seconds, so the
comparison is star's measured total vs HashMin's measured per-round cost x
the P rounds it would still need.

Usage: python bench/cc_ab.py [--edges 20000000] [--vertices 5000000]
           [--path-hops 100000] [--cpus 8] [--hashmin-cap 12]
Results -> stdout JSON lines; summarized in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def gen(spark, num_edges: int, n: int, path_hops: int):
    from pyspark.sql import functions as F

    base = spark.range(num_edges)
    uni = base.select(
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(n)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    if not path_hops:
        return uni
    path = spark.range(path_hops).select(
        (F.lit(n) + F.col("id")).alias("src"),
        (F.lit(n) + F.col("id") + 1).alias("dst"),
    )
    return uni.union(path)


def run_cell() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from flexgraph_spark import algorithms
    from flexgraph_spark.session import get_spark

    algo = os.environ["AB_ALGO"]
    num_edges = int(os.environ["AB_EDGES"])
    n = int(os.environ["AB_VERTICES"])
    path_hops = int(os.environ["AB_PATH_HOPS"])
    cpus = int(os.environ["AB_CPUS"])
    cap = int(os.environ["AB_CAP"])

    spark = get_spark(
        f"cc-ab-{algo}", master=f"local[{cpus}]", shuffle_partitions=3 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = gen(spark, num_edges, n, path_hops).persist()
    e_count = edges.count()

    t0 = time.time()
    if algo == "star":
        res = algorithms.connected_components_star(edges, max_iter=60)
    else:
        res = algorithms.connected_components(edges, max_iter=cap)
    n_labels = res.state.count()
    dt = time.time() - t0
    per_round = sorted(m.seconds for m in res.metrics)
    print(
        json.dumps(
            {
                "algo": algo,
                "edges": e_count,
                "path_hops": path_hops,
                "rounds": res.iterations,
                "converged": res.converged,
                "seconds": round(dt, 2),
                "median_round_sec": round(per_round[len(per_round) // 2], 2),
                "vertices_labeled": n_labels,
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--vertices", type=int, default=5_000_000)
    ap.add_argument("--path-hops", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--hashmin-cap", type=int, default=12)
    args = ap.parse_args()

    cells = [
        ("hashmin", 0),
        ("star", 0),
        ("hashmin", args.path_hops),
        ("star", args.path_hops),
    ]
    for algo, hops in cells:
        env = dict(
            os.environ,
            AB_ALGO=algo,
            AB_EDGES=str(args.edges),
            AB_VERTICES=str(args.vertices),
            AB_PATH_HOPS=str(hops),
            AB_CPUS=str(args.cpus),
            AB_CAP=str(args.hashmin_cap),
        )
        subprocess.run(
            [
                sys.executable,
                "-c",
                "import importlib.util, pathlib; "
                "p = pathlib.Path('bench/cc_ab.py').resolve(); "
                "spec = importlib.util.spec_from_file_location('cc_ab', p); "
                "m = importlib.util.module_from_spec(spec); "
                "spec.loader.exec_module(m); m.run_cell()",
            ],
            env=env,
            cwd=str(Path(__file__).resolve().parent.parent),
            check=True,
        )


if __name__ == "__main__":
    main()
