"""spark-submit entry: k-core membership by iterative peeling.

Symmetrizes and drops self-loops first; writes the surviving vertex set.
``--weighted --threshold T`` switches to the generalized (s-core) peel on
decimal-exact weighted degree (algorithms.weighted_kcore); the input then
needs a ``weight`` column.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    p = base_parser("k-core decomposition (iterative peeling)")
    p.add_argument("--k", type=int, default=None, help="minimum core degree")
    p.add_argument("--weighted", action="store_true",
                   help="peel on weighted degree (s-core) instead of count")
    p.add_argument("--threshold", type=float, default=None,
                   help="weighted: minimum surviving weighted degree")
    args = p.parse_args()
    if args.engine != "flat":
        raise SystemExit(
            "kcore: only --engine flat (peeling is a shrinking semi-join "
            "loop, not a fixed-matrix GIM-V)"
        )
    spark = get_session("flexgraph-kcore")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    if args.weighted:
        if args.threshold is None:
            raise SystemExit("kcore: --weighted needs --threshold")
        res = algorithms.weighted_kcore(
            edges, t=args.threshold, max_rounds=args.max_iter,
            num_partitions=args.num_partitions,
        )
        label = f"t={args.threshold} (weighted)"
    else:
        if args.k is None:
            raise SystemExit("kcore: need --k (or --weighted --threshold)")
        res = algorithms.kcore(
            edges, k=args.k, max_rounds=args.max_iter,
            num_partitions=args.num_partitions,
        )
        label = f"k={args.k}"
    res.state.write.mode("overwrite").parquet(args.output)
    print(
        f"kcore: {label} rounds={res.iterations} "
        f"converged={res.converged} -> {args.output}"
    )


if __name__ == "__main__":
    main()
