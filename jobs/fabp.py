"""spark-submit entry: FaBP semi-supervised belief propagation.

Jacobi-iterates b <- phi + c'*A*b - a*D*b (Koutra et al., PKDD 2011) over
the symmetrized input graph from a parquet of seed priors (vertex, prior).
Keep c' = 2h/(1-4h^2) below 1/lambda_max(A) for a contraction (estimate
lambda_max with jobs-free algorithms.power_iteration if unsure).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges, make_checkpointer


def main() -> None:
    p = base_parser("FaBP belief propagation (GIM-V, flat plan)")
    p.add_argument("--priors", required=True,
                   help="parquet path of (vertex, prior) seed beliefs")
    p.add_argument("--homophily", type=float, default=0.002,
                   help="h; c' = 2h/(1-4h^2) must stay below 1/lambda_max")
    p.add_argument("--threshold", type=float, default=0.0,
                   help="per-vertex |delta| stop; 0 runs the fixed depth")
    args = p.parse_args()
    if args.engine not in ("flat", "auto"):
        p.error("fabp runs on the flat plan only (struct-valued state)")

    spark = get_session("flexgraph-fabp")
    edges = load_edges(spark, args)
    priors = spark.read.parquet(args.priors)
    from flexgraph_spark import algorithms

    res = algorithms.fabp(
        edges,
        priors,
        h=args.homophily,
        threshold=args.threshold,
        max_iter=args.max_iter,
        num_partitions=args.num_partitions,
        checkpointer=make_checkpointer(args, edges),
    )
    res.state.write.mode("overwrite").parquet(args.output)
    print(
        f"fabp: iterations={res.iterations} converged={res.converged} "
        f"-> {args.output}"
    )


if __name__ == "__main__":
    main()
