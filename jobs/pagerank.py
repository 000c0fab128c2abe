"""spark-submit entry: PageRank / RWR over a link graph.

Reference parity: sbin/pagerank.sh (prepartition + PageRankComputation,
/root/reference/sbin/pagerank.sh:11-50) collapses into one Spark app.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import (
    base_parser, engine_kwargs, get_session, load_edges, make_checkpointer,
)


def main() -> None:
    p = base_parser("PageRank / RWR (GIM-V)")
    p.add_argument("--alpha", type=float, default=0.85)
    p.add_argument("--threshold", type=float, default=1e-8)
    p.add_argument("--source-vertex", type=int, default=None, help="RWR source")
    p.add_argument(
        "--weighted", action="store_true",
        help="distribute rank proportionally to edge weight "
             "(needs a weight column; flat engine only)",
    )
    args = p.parse_args()

    spark = get_session("flexgraph-pagerank")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    res = algorithms.pagerank(
        edges,
        alpha=args.alpha,
        threshold=args.threshold,
        max_iter=args.max_iter,
        source_vertex=args.source_vertex,
        weighted=args.weighted,
        checkpointer=make_checkpointer(args, edges),
        engine=args.engine,
        **engine_kwargs(spark, args),
    )
    res.state.write.mode("overwrite").parquet(args.output)
    print(
        f"pagerank: iterations={res.iterations} converged={res.converged} "
        f"-> {args.output}"
    )


if __name__ == "__main__":
    main()
