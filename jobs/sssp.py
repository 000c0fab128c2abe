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
    p.add_argument("--source-vertex", type=int, required=True)
    args = p.parse_args()
    spark = get_session("flexgraph-sssp")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    res = algorithms.sssp(
        edges,
        args.source_vertex,
        max_iter=args.max_iter,
        checkpointer=make_checkpointer(args, edges),
        engine=args.engine,
        **engine_kwargs(spark, args),
    )
    res.state.write.mode("overwrite").parquet(args.output)
    print(f"sssp: iterations={res.iterations} converged={res.converged} -> {args.output}")


if __name__ == "__main__":
    main()
