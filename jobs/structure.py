"""spark-submit entry: graph-structure robustness — bridges (cut edges),
2-edge-connected components, and independent-cascade influence spread.

    spark-submit --py-files dist/flexgraph_spark.zip jobs/structure.py \
        --edges .../edges.parquet --mode bridges --output .../bridges
    ... --mode 2ecc --output .../ecc_labels
    ... --mode influence --seed-mod 101 --prob 0.2 --output .../spread

``--mode bridges`` writes the cut-edge set (a, b); ``2ecc`` writes
(vertex, ecc_label); ``influence`` writes (vertex, hops) activation
rounds from the seed set {v : v % seed_mod == 0} under a deterministic
live-edge coin (vary --cascade-seed for Monte-Carlo samples).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    p = base_parser("graph structure: bridges / 2ecc / influence")
    p.add_argument("--mode", choices=["bridges", "2ecc", "articulation", "bcc", "influence"],
                   default="bridges")
    p.add_argument("--max-depth", type=int, default=64,
                   help="BFS forest depth cap (bridges/2ecc)")
    p.add_argument("--prob", type=float, default=0.2,
                   help="influence: edge activation probability")
    p.add_argument("--cascade-seed", type=int, default=1,
                   help="influence: which deterministic cascade draw")
    p.add_argument("--seed-mod", type=int, default=101,
                   help="influence: seeds are vertices with v %% seed-mod == 0")
    args = p.parse_args()
    if args.engine != "flat":
        raise SystemExit(
            "structure: only --engine flat (forest + closure joins)"
        )
    spark = get_session(f"flexgraph-structure-{args.mode}")
    edges = load_edges(spark, args)
    from pyspark.sql import functions as F

    from flexgraph_spark import algorithms

    if args.mode == "bridges":
        out = algorithms.bridges(
            edges, max_depth=args.max_depth,
            num_partitions=args.num_partitions,
        )
    elif args.mode == "2ecc":
        out = algorithms.two_edge_components(
            edges, max_depth=args.max_depth,
            num_partitions=args.num_partitions,
        )
    elif args.mode == "articulation":
        out = algorithms.articulation_points(
            edges, max_depth=args.max_depth,
            num_partitions=args.num_partitions,
        )
    elif args.mode == "bcc":
        out = algorithms.biconnected_components(
            edges, max_depth=args.max_depth,
            num_partitions=args.num_partitions,
        )
    else:
        verts = (
            edges.select(F.col("src").alias("vertex"))
            .union(edges.select("dst")).distinct()
        )
        seeds = verts.filter(F.col("vertex") % args.seed_mod == 0)
        out = algorithms.influence_spread(
            edges, seeds, p=args.prob, cascade_seed=args.cascade_seed,
            max_hops=args.max_iter, num_partitions=args.num_partitions,
        )
    out.write.mode("overwrite").parquet(args.output)
    print(f"structure[{args.mode}]: {out.count()} rows -> {args.output}")


if __name__ == "__main__":
    main()
