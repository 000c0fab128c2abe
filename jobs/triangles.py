"""spark-submit entry: exact motif counts on the degree-oriented plan
(--motif triangle | k4)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    p = base_parser("Exact motif count (degree-oriented)")
    p.add_argument("--motif", choices=["triangle", "k4"], default="triangle")
    args = p.parse_args()
    spark = get_session("flexgraph-triangles")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    if args.motif == "k4":
        n = algorithms.k4_count(edges)
    else:
        n = algorithms.triangle_count(edges)
    spark.createDataFrame([(int(n),)], f"{args.motif}s long").write.mode(
        "overwrite"
    ).parquet(args.output)
    print(f"{args.motif}s: {n} -> {args.output}")


if __name__ == "__main__":
    main()
