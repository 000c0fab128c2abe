"""spark-submit entry: SlashBurn hub-removal vertex ordering.

Kang & Faloutsos, "Beyond 'Caveman Communities': Hubs and Spokes for
Graph Compression and Mining" (ICDM 2011): alternately slash the k
highest-degree hubs to the front of the permutation and burn the
non-giant remainder components to the back, recursing on the giant
component. The output (vertex, position, round, role) permutation
concentrates adjacency-matrix nonzeros into a few dense blocks — feed
``position`` as the vertex id into jobs/prepartition.py to raise the
dense-block fraction the blocked CSR engine exploits, or use
``k * rounds / n`` (the wing-width ratio, printed) as a
hub-compressibility score.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    p = base_parser("SlashBurn hub-removal ordering")
    p.add_argument("--k", type=int, default=2,
                   help="hubs slashed per round (paper: ~0.5%% of n)")
    p.add_argument("--max-rounds", type=int, default=30,
                   help="round cap; the residual giant component takes the "
                        "middle positions, so a capped run is still a total "
                        "permutation")
    args = p.parse_args()
    spark = get_session("flexgraph-slashburn")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    res = algorithms.slashburn(
        edges, k=args.k, max_rounds=args.max_rounds,
        num_partitions=args.num_partitions,
    )
    res.state.write.mode("overwrite").parquet(args.output)
    n = res.state.count() or 1
    print(
        f"slashburn: rounds={res.iterations} exhausted={res.converged} "
        f"wing_width_ratio={args.k * res.iterations / n:.4f} -> {args.output}"
    )


if __name__ == "__main__":
    main()
