"""spark-submit entry: single-source shortest paths (weighted GIM-V)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import (
    base_parser, engine_kwargs, get_session, load_edges, make_checkpointer,
)


def main() -> None:
    p = base_parser("SSSP (min-plus GIM-V)")
    p.add_argument(
        "--source-vertex", type=int, required=True, nargs="+",
        help="one source runs scalar SSSP; several run the batched "
             "landmark job (one edge scan per superstep for all of them) "
             "and write long-form (vertex, landmark, dist)",
    )
    args = p.parse_args()
    spark = get_session("flexgraph-sssp")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    if len(args.source_vertex) == 1:
        res = algorithms.sssp(
            edges,
            args.source_vertex[0],
            max_iter=args.max_iter,
            checkpointer=make_checkpointer(args, edges),
            engine=args.engine,
            **engine_kwargs(spark, args),
        )
        out = res.state
    else:
        res = algorithms.landmark_distances(
            edges,
            args.source_vertex,
            max_iter=args.max_iter,
            checkpointer=make_checkpointer(args, edges),
            engine=args.engine,
            **engine_kwargs(spark, args),
        )
        out = algorithms.landmark_long(res, args.source_vertex)
    out.write.mode("overwrite").parquet(args.output)
    print(f"sssp: iterations={res.iterations} converged={res.converged} -> {args.output}")


if __name__ == "__main__":
    main()
