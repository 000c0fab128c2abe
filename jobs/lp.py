"""spark-submit entry: label propagation (majority label, lowest-label ties)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges, make_checkpointer


def main() -> None:
    p = base_parser("Label propagation")
    p.set_defaults(max_iter=20)
    args = p.parse_args()
    spark = get_session("flexgraph-lp")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms
    from jobs.common import engine_kwargs

    res = algorithms.label_propagation(
        edges, max_iter=args.max_iter, engine=args.engine,
        checkpointer=make_checkpointer(args, edges),
        **engine_kwargs(spark, args),
    )
    res.state.write.mode("overwrite").parquet(args.output)
    print(f"lp: iterations={res.iterations} -> {args.output}")


if __name__ == "__main__":
    main()
