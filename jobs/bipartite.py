"""spark-submit entry: per-component bipartiteness / odd-cycle check.

Runs gimv.RootedBFS — HashMin CC fused with unit-weight BFS layering in
one lexicographic-min GIM-V fixpoint — then flags each component
non-bipartite iff any undirected edge joins two vertices of equal BFS
distance parity. Output: one row per component
(root, n_vertices, n_edges, odd_edges, is_bipartite).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    p = base_parser("bipartiteness / odd-cycle check")
    args = p.parse_args()
    spark = get_session("flexgraph-bipartite")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    out = algorithms.bipartite_check(
        edges, max_iter=args.max_iter, num_partitions=args.num_partitions
    )
    out.write.mode("overwrite").parquet(args.output)
    import pyspark.sql.functions as F

    row = out.agg(
        F.count("*").alias("c"),
        F.sum("is_bipartite").alias("b"),
        F.sum("odd_edges").alias("o"),
    ).first()
    print(
        f"bipartite: components={row.c} bipartite={row.b} "
        f"odd_edges_total={row.o} -> {args.output}"
    )


if __name__ == "__main__":
    main()
