"""spark-submit entry: Luby-style maximal independent set.

Outputs (vertex, value) for MIS members, value = joining round.
Deterministic by-id priorities; --max-iter caps the rounds (the capped
run is exactly the first k layers of the full run).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    p = base_parser("Maximal independent set (Luby rounds)")
    args = p.parse_args()
    if args.engine != "flat":
        raise SystemExit("mis: only --engine flat (shrinking-set rounds)")
    spark = get_session("flexgraph-mis")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    res = algorithms.maximal_independent_set(
        edges, max_rounds=args.max_iter, num_partitions=args.num_partitions
    )
    res.state.write.mode("overwrite").parquet(args.output)
    print(
        f"mis: rounds={res.iterations} converged={res.converged} "
        f"members={res.state.count()} -> {args.output}"
    )


if __name__ == "__main__":
    main()
