"""spark-submit entry: multi-level Louvain community detection
(deterministic synchronous local moves + weighted contraction; the
returned labels are the best-modularity partition seen across every
scored round — see flexgraph_spark.algorithms.louvain)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    p = base_parser("Louvain community detection")
    p.add_argument("--levels", type=int, default=2,
                   help="contraction levels (each level shrinks the graph "
                        "to one vertex per community)")
    p.add_argument("--rounds", type=int, default=3,
                   help="synchronous local-move rounds per level")
    args = p.parse_args()
    if args.engine == "blocked":
        p.error("louvain runs on the flat plan (label-keyed joins, not a "
                "scalar semi-ring); --engine blocked is not applicable")
    spark = get_session("flexgraph-louvain")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    res = algorithms.louvain(
        edges, levels=args.levels, rounds=args.rounds,
        num_partitions=args.num_partitions,
    )
    res.labels.write.mode("overwrite").parquet(args.output)
    print(
        f"louvain: levels={res.levels} modularity={res.modularity:.6f} "
        f"communities={res.n_communities} -> {args.output}"
    )


if __name__ == "__main__":
    main()
