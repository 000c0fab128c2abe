"""spark-submit entry: minimum spanning forest (Borůvka + pointer-jump
contraction).

Input edges need a weight column (parquet (src, dst, weight) or a
weighted text edge list); output is the forest edge set (a, b, w) —
n - c rows, unique minimum total weight, deterministic under tied
weights via the (w, a, b) edge total order.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    p = base_parser("minimum spanning forest (Borůvka rounds)")
    args = p.parse_args()
    if args.engine != "flat":
        raise SystemExit(
            "msf: only --engine flat (per-round min-pick + contraction is "
            "a shrinking join loop, not a fixed-matrix GIM-V)"
        )
    spark = get_session("flexgraph-msf")
    edges = load_edges(spark, args)
    if "weight" not in edges.columns:
        raise SystemExit("msf: input edges need a weight column")
    from flexgraph_spark import algorithms

    res = algorithms.boruvka_msf(
        edges, max_rounds=args.max_iter,
        num_partitions=args.num_partitions,
    )
    res.state.write.mode("overwrite").parquet(args.output)
    print(
        f"msf: rounds={res.iterations} converged={res.converged} "
        f"-> {args.output}"
    )


if __name__ == "__main__":
    main()
