"""spark-submit entry: connected components (HashMin).

Unlike the reference's cc.sh (which never symmetrizes — SURVEY.md §3.2),
this computes true WCC by symmetrizing explicitly.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import (
    base_parser, engine_kwargs, get_session, load_edges, make_checkpointer,
)


def main() -> None:
    p = base_parser("Connected components (HashMin GIM-V or star contraction)")
    p.add_argument(
        "--algorithm", choices=["hashmin", "star"], default="hashmin",
        help="hashmin: GIM-V min-propagation, O(diameter) supersteps "
             "(flat/blocked engines). star: alternating large-star/"
             "small-star contraction (Kiveris et al. SoCC'14), O(log n) "
             "rounds — use on high-diameter graphs; identical labels.",
    )
    args = p.parse_args()
    spark = get_session("flexgraph-cc")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    if args.algorithm == "star":
        res = algorithms.connected_components_star(
            edges, max_iter=args.max_iter,
            num_partitions=args.num_partitions,
        )
    else:
        res = algorithms.connected_components(
            edges,
            max_iter=args.max_iter,
            checkpointer=make_checkpointer(args, edges),
            engine=args.engine,
            **engine_kwargs(spark, args),
        )
    res.state.write.mode("overwrite").parquet(args.output)
    print(f"cc: iterations={res.iterations} converged={res.converged} -> {args.output}")


if __name__ == "__main__":
    main()
