"""spark-submit entry: truncated Katz centrality (GIM-V, both engines).

value after t supersteps = sum_{k<=t} alpha^k * #paths of length k ending
at the vertex. --threshold 0 (default) runs the full fixed depth; a
positive threshold stops at the |delta| fixpoint.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import (
    base_parser, engine_kwargs, get_session, load_edges, make_checkpointer,
)


def main() -> None:
    p = base_parser("Katz centrality (GIM-V)")
    p.add_argument("--alpha", type=float, default=0.05,
                   help="attenuation; must be < 1/lambda_max for convergence")
    p.add_argument("--threshold", type=float, default=0.0)
    args = p.parse_args()

    spark = get_session("flexgraph-katz")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    res = algorithms.katz(
        edges,
        alpha=args.alpha,
        threshold=args.threshold,
        max_iter=args.max_iter,
        checkpointer=make_checkpointer(args, edges),
        engine=args.engine,
        **engine_kwargs(spark, args),
    )
    res.state.write.mode("overwrite").parquet(args.output)
    print(
        f"katz: iterations={res.iterations} converged={res.converged} "
        f"-> {args.output}"
    )


if __name__ == "__main__":
    main()
