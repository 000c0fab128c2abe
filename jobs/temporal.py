"""spark-submit entry: time-respecting temporal path problems.

Input edges must carry (src, dst, t) — t the edge timestamp as a double
(epoch seconds / day number). Parallel (src, dst) edges at different
times are distinct travel opportunities; this job never dedupes them.

Modes (Wu et al., "Path Problems in Temporal Graphs", VLDB 2014):
  earliest  — earliest arrival at every vertex from --source-vertex
  latest    — latest departure from every vertex that still reaches
              --source-vertex by --deadline
  fastest   — minimum duration (arrival - departure) from
              --source-vertex over its candidate departure times
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import (
    base_parser, engine_kwargs, get_session, load_edges, make_checkpointer,
)


def main() -> None:
    p = base_parser("Temporal path problems (min-plus GIM-V)")
    p.add_argument("--source-vertex", type=int, required=True)
    p.add_argument("--mode", choices=["earliest", "latest", "fastest"],
                   default="earliest")
    p.add_argument("--start-time", type=float, default=0.0,
                   help="[earliest] no departure before this time")
    p.add_argument("--deadline", type=float, default=None,
                   help="[latest] must reach --source-vertex by this time")
    p.add_argument("--dur", type=float, default=0.0,
                   help="per-hop traversal duration added to each arrival")
    p.add_argument("--max-departures", type=int, default=64,
                   help="[fastest] cap on candidate departure times "
                        "(exact when the source has at most this many)")
    args = p.parse_args()
    spark = get_session("flexgraph-temporal")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    ekw = engine_kwargs(spark, args)
    if args.mode == "latest":
        if args.deadline is None:
            raise SystemExit("--mode latest requires --deadline")
        out = algorithms.latest_departure(
            edges, args.source_vertex, args.deadline, dur=args.dur,
            max_iter=args.max_iter, engine=args.engine, **ekw,
        )
        out.write.mode("overwrite").parquet(args.output)
        print(f"latest_departure -> {args.output}")
        return
    if args.mode == "fastest":
        out = algorithms.fastest_path(
            edges, args.source_vertex, dur=args.dur,
            max_iter=args.max_iter, max_departures=args.max_departures,
            engine=args.engine, **ekw,
        )
        out.write.mode("overwrite").parquet(args.output)
        print(f"fastest_path -> {args.output}")
        return
    res = algorithms.earliest_arrival(
        edges,
        args.source_vertex,
        start_time=args.start_time,
        dur=args.dur,
        max_iter=args.max_iter,
        checkpointer=make_checkpointer(args, edges),
        engine=args.engine,
        **ekw,
    )
    res.state.write.mode("overwrite").parquet(args.output)
    print(
        f"earliest_arrival: iterations={res.iterations} "
        f"converged={res.converged} -> {args.output}"
    )


if __name__ == "__main__":
    main()
