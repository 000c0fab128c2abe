"""spark-submit entry: degree computation (the reference's offline
DegreeComputation job, DegreeComputation.java:50-215)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    p = base_parser("Degree computation")
    p.add_argument("--direction", choices=["in", "out", "both"], default="out")
    p.add_argument("--weighted", action="store_true",
                   help="sum edge weights instead of counting edges "
                        "(DegreeComputation.java:106-198)")
    args = p.parse_args()
    spark = get_session("flexgraph-degrees")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    algorithms.degrees(edges, args.direction, weighted=args.weighted).write.mode(
        "overwrite"
    ).parquet(args.output)
    print(f"degrees({args.direction}, weighted={args.weighted}) -> {args.output}")


if __name__ == "__main__":
    main()
