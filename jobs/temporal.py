"""spark-submit entry: time-respecting earliest-arrival reachability.

Input edges must carry (src, dst, t) — t the edge timestamp as a double
(epoch seconds / day number). Parallel (src, dst) edges at different
times are distinct travel opportunities; this job never dedupes them.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges, make_checkpointer


def main() -> None:
    p = base_parser("Earliest arrival (temporal min-plus GIM-V)")
    p.add_argument("--source-vertex", type=int, required=True)
    p.add_argument("--start-time", type=float, default=0.0,
                   help="no departure before this time")
    p.add_argument("--dur", type=float, default=0.0,
                   help="per-hop traversal duration added to each arrival")
    args = p.parse_args()
    if args.engine != "flat":
        raise SystemExit("earliest arrival is flat-plan only "
                         "(conditional combine2)")
    spark = get_session("flexgraph-temporal")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    res = algorithms.earliest_arrival(
        edges,
        args.source_vertex,
        start_time=args.start_time,
        dur=args.dur,
        max_iter=args.max_iter,
        checkpointer=make_checkpointer(args, edges),
        num_partitions=args.num_partitions,
    )
    res.state.write.mode("overwrite").parquet(args.output)
    print(
        f"earliest_arrival: iterations={res.iterations} "
        f"converged={res.converged} -> {args.output}"
    )


if __name__ == "__main__":
    main()
