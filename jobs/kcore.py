"""spark-submit entry: k-core membership by iterative peeling.

Symmetrizes and drops self-loops first; writes the surviving vertex set.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    p = base_parser("k-core decomposition (iterative peeling)")
    p.add_argument("--k", type=int, required=True, help="minimum core degree")
    args = p.parse_args()
    if args.engine != "flat":
        raise SystemExit(
            "kcore: only --engine flat (peeling is a shrinking semi-join "
            "loop, not a fixed-matrix GIM-V)"
        )
    spark = get_session("flexgraph-kcore")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    res = algorithms.kcore(
        edges, k=args.k, max_rounds=args.max_iter,
        num_partitions=args.num_partitions,
    )
    res.state.write.mode("overwrite").parquet(args.output)
    print(
        f"kcore: k={args.k} rounds={res.iterations} "
        f"converged={res.converged} -> {args.output}"
    )


if __name__ == "__main__":
    main()
