"""spark-submit entry: the trust-propagation suite over a directed link
graph — TrustRank (teleport restricted to a trusted seed set), relative
spam mass ((PR − TR)/PR at equal depth), or k-step hitting probability of
an absorbing seed set (the transposed dual). Seeds come from a parquet of
(vertex) rows.

Gyöngyi et al., VLDB 2004 (TrustRank) / VLDB 2006 (spam mass).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges, make_checkpointer


def main() -> None:
    p = base_parser("trust propagation (TrustRank / spam mass / hitting)")
    seeds_src = p.add_mutually_exclusive_group(required=True)
    seeds_src.add_argument("--seeds",
                           help="parquet path of (vertex) trusted/target seeds")
    seeds_src.add_argument("--seed-mod", type=int,
                           help="predicate seed set vertex %% MOD == 0 — "
                                "enables --engine blocked/auto for trustrank "
                                "(gimv.TrustRankPredicate)")
    p.add_argument("--mode", choices=["trustrank", "spam_mass", "hitting"],
                   default="trustrank")
    p.add_argument("--alpha", type=float, default=0.85)
    p.add_argument("--threshold", type=float, default=0.0,
                   help="per-vertex |delta| stop; 0 runs the fixed depth")
    args = p.parse_args()
    if args.engine not in ("flat", "auto") and not (
        args.mode == "trustrank" and args.seed_mod is not None
    ):
        p.error("only trustrank with --seed-mod runs on the blocked plan; "
                "DataFrame seeds / spam_mass / hitting are flat-only "
                "(struct-valued state)")

    spark = get_session(f"flexgraph-{args.mode}")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    if args.seed_mod is not None:
        if args.mode != "trustrank":
            p.error("--seed-mod currently applies to --mode trustrank")
        from pyspark.sql import functions as F  # noqa: F401

        res = algorithms.trustrank(
            edges,
            seed_pred=(
                lambda c: c % args.seed_mod == 0,
                lambda ids: ids % args.seed_mod == 0,
            ),
            alpha=args.alpha, threshold=args.threshold,
            max_iter=args.max_iter, engine=args.engine,
            num_partitions=args.num_partitions,
        )
        res.state.write.mode("overwrite").parquet(args.output)
        print(
            f"trustrank[pred %{args.seed_mod}]: iterations={res.iterations} "
            f"converged={res.converged} -> {args.output}"
        )
        return

    seeds = spark.read.parquet(args.seeds)

    if args.mode == "spam_mass":
        out = algorithms.spam_mass(
            edges, seeds, alpha=args.alpha, max_iter=args.max_iter,
            num_partitions=args.num_partitions,
        )
        out.write.mode("overwrite").parquet(args.output)
        print(f"spam_mass: depth={args.max_iter} -> {args.output}")
        return

    fn = (algorithms.trustrank if args.mode == "trustrank"
          else algorithms.hitting_probability)
    kwargs = dict(
        threshold=args.threshold, max_iter=args.max_iter,
        num_partitions=args.num_partitions,
        checkpointer=make_checkpointer(args, edges),
    )
    if args.mode == "trustrank":
        kwargs["alpha"] = args.alpha
    res = fn(edges, seeds, **kwargs)
    res.state.write.mode("overwrite").parquet(args.output)
    print(
        f"{args.mode}: iterations={res.iterations} converged={res.converged} "
        f"-> {args.output}"
    )


if __name__ == "__main__":
    main()
