"""spark-submit entry: vertex/embedding similarity suite.

Three modes:

* ``simrank``     — Monte-Carlo SimRank for a query set over an edge
                    list (algorithms.simrank: coupled reverse-walk
                    fingerprints, deterministic at any parallelism);
* ``knn``         — mutual k-NN cosine graph over an embeddings table
                    (textops.knn_graph; ``--candidates lsh|ivf`` selects
                    the corpus-scale candidate generators, same output
                    shape as the exact face);
* ``communities`` — the mutual k-NN graph fed into the GIM-V HashMin
                    CC engine (textops.semantic_communities).

Uses its own parser (not jobs.common.base_parser) because the input is
mode-dependent: ``--edges`` for simrank, ``--embeddings`` for the rest.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import get_session


def main() -> None:
    p = argparse.ArgumentParser(
        description="Similarity suite: simrank | knn | communities"
    )
    p.add_argument("--mode", choices=["simrank", "knn", "communities"],
                   default="simrank")
    p.add_argument("--edges", help="parquet of (src, dst) — simrank mode")
    p.add_argument("--embeddings",
                   help="parquet of (vec_id, embedding) — knn/communities")
    p.add_argument("--output", required=True)
    p.add_argument("--queries", default="",
                   help="comma-separated query vertex ids (simrank)")
    p.add_argument("--walk-length", type=int, default=5)
    p.add_argument("--num-runs", type=int, default=8)
    p.add_argument("--decay", type=float, default=0.6)
    p.add_argument("--topk", type=int, default=None)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--candidates", choices=["exact", "lsh", "ivf"],
                   default="exact",
                   help="knn/communities: neighbor generation — exact "
                        "(oracle face) | lsh | ivf (corpus-scale paths)")
    args = p.parse_args()

    spark = get_session("flexgraph-similarity")
    if args.mode == "simrank":
        if not args.edges:
            raise SystemExit("--edges is required for simrank")
        from flexgraph_spark import algorithms

        queries = [int(q) for q in args.queries.split(",") if q.strip()]
        out = algorithms.simrank(
            spark.read.parquet(args.edges), queries=queries,
            walk_length=args.walk_length, num_runs=args.num_runs,
            c=args.decay, topk=args.topk,
        )
    else:
        if not args.embeddings:
            raise SystemExit("--embeddings is required for knn/communities")
        from flexgraph_spark import textops

        emb = spark.read.parquet(args.embeddings)
        if args.mode == "knn":
            out = textops.knn_graph(
                emb, k=args.k, mutual=True, candidates=args.candidates)
        else:
            out = textops.semantic_communities(
                emb, k=args.k, candidates=args.candidates)
    out.write.mode("overwrite").parquet(args.output)
    print(f"similarity[{args.mode}] -> {args.output}")


if __name__ == "__main__":
    main()
