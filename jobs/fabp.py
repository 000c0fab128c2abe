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
    p = base_parser("FaBP belief propagation")
    p.add_argument("--priors",
                   help="parquet path of (vertex, prior) seed beliefs "
                        "(flat plan; struct-valued state)")
    p.add_argument("--prior-mod", type=int,
                   help="predicate prior form: v %% MOD == 0 -> +VAL, "
                        "== 1 -> -VAL, else 0 — required for "
                        "--engine blocked (priors dissolve into the "
                        "kernels; ids must be contiguous [0, n))")
    p.add_argument("--prior-val", type=float, default=1.0)
    p.add_argument("--homophily", type=float, default=0.002,
                   help="h; c' = 2h/(1-4h^2) must stay below 1/lambda_max")
    p.add_argument("--threshold", type=float, default=0.0,
                   help="per-vertex |delta| stop; 0 runs the fixed depth")
    args = p.parse_args()
    if args.engine == "blocked" and args.prior_mod is None:
        p.error("--engine blocked needs --prior-mod (predicate priors; "
                "a parquet prior table runs on the flat plan)")
    if args.prior_mod is not None and args.engine != "blocked":
        p.error("--prior-mod is the blocked-engine prior form; add "
                "--engine blocked (or pass --priors for the flat plan)")
    if args.priors is None and args.prior_mod is None:
        p.error("one of --priors / --prior-mod is required")

    spark = get_session("flexgraph-fabp")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    if args.prior_mod is not None:
        import numpy as np

        mod, val = args.prior_mod, args.prior_val

        def prior_np(ids):
            return np.where(ids % mod == 0, val,
                            np.where(ids % mod == 1, -val, 0.0))

        from jobs.common import engine_kwargs

        res = algorithms.fabp(
            edges,
            prior_pred=prior_np,
            h=args.homophily,
            threshold=args.threshold,
            max_iter=args.max_iter,
            engine=args.engine,
            **engine_kwargs(spark, args),
        )
    else:
        priors = spark.read.parquet(args.priors)
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
