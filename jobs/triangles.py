"""spark-submit entry: exact triangle count (degree-oriented join plan)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    args = base_parser("Triangle count").parse_args()
    spark = get_session("flexgraph-triangles")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    n = algorithms.triangle_count(edges)
    spark.createDataFrame([(int(n),)], "triangles long").write.mode(
        "overwrite"
    ).parquet(args.output)
    print(f"triangles: {n} -> {args.output}")


if __name__ == "__main__":
    main()
