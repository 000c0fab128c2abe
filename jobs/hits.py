"""spark-submit entry: HITS hubs & authorities (fixed-depth recurrence).

Runs exactly --max-iter L2-normalized half-step pairs (the recurrence
depth is the result's contract — see flexgraph_spark.algorithms.hits).
Engine flags don't apply: HITS alternates two GIM-V products over M and
M^T, so it runs its own flat two-copy plan.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    p = base_parser("HITS hubs & authorities")
    args = p.parse_args()
    if args.engine != "flat":
        raise SystemExit(
            "hits: only --engine flat (two alternating GIM-V products over "
            "M and M^T — the blocked kernels assume one fixed matrix)"
        )
    spark = get_session("flexgraph-hits")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    res = algorithms.hits(
        edges, max_iter=args.max_iter, num_partitions=args.num_partitions
    )
    res.state.write.mode("overwrite").parquet(args.output)
    print(f"hits: iterations={res.iterations} -> {args.output}")


if __name__ == "__main__":
    main()
