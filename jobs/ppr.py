"""spark-submit entry: batch multi-source personalized PageRank.

One GIM-V job computes a PPR column per source (array-valued state,
gimv.BatchPPR) — the amortized form of running sbin/pagerank.sh once per
seed vertex (reference: PageRankComputation.java:202-256 semantics per
column). Output is long-format (vertex, source, ppr) parquet.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges, make_checkpointer


def main() -> None:
    p = base_parser("Batch multi-source personalized PageRank (GIM-V)")
    p.add_argument("--alpha", type=float, default=0.85)
    p.add_argument("--threshold", type=float, default=1e-8)
    p.add_argument(
        "--sources", required=True,
        help="comma-separated seed vertex ids (one PPR column each)",
    )
    args = p.parse_args()
    sources = [int(s) for s in args.sources.split(",") if s.strip()]

    spark = get_session("flexgraph-ppr")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    if args.engine == "blocked":
        raise SystemExit(
            "batch_ppr runs on the flat engine only (array-valued state; "
            "the blocked NumPy kernels are scalar) — use --engine flat"
        )
    res = algorithms.batch_ppr(
        edges,
        sources,
        alpha=args.alpha,
        threshold=args.threshold,
        max_iter=args.max_iter,
        checkpointer=make_checkpointer(args, edges),
        num_partitions=args.num_partitions,
    )
    out = algorithms.ppr_long(res, sources)
    out.write.mode("overwrite").parquet(args.output)
    print(
        f"batch_ppr: sources={len(sources)} iterations={res.iterations} "
        f"converged={res.converged} -> {args.output}"
    )


if __name__ == "__main__":
    main()
