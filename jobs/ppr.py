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

from jobs.common import (
    base_parser, engine_kwargs, get_session, load_edges, make_checkpointer,
)


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

    # --engine blocked runs the 'batch' CSR kernel family (flattened
    # (n_local x k) matrices per block) — requires contiguous ids like
    # every blocked job
    res = algorithms.batch_ppr(
        edges,
        sources,
        alpha=args.alpha,
        threshold=args.threshold,
        max_iter=args.max_iter,
        engine=args.engine,
        checkpointer=make_checkpointer(args, edges),
        **engine_kwargs(spark, args),
    )
    out = algorithms.ppr_long(res, sources)
    out.write.mode("overwrite").parquet(args.output)
    print(
        f"batch_ppr: sources={len(sources)} iterations={res.iterations} "
        f"converged={res.converged} -> {args.output}"
    )


if __name__ == "__main__":
    main()
