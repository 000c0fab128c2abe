"""spark-submit entry: deterministic random-walk corpus generation.

DeepWalk/node2vec input step over a link graph: ``--num-walks`` walks of
``--walk-length`` steps from every vertex, next hop chosen by
sha256(salt:start:walk:step) mod out-degree (algorithms.random_walks) —
reproducible at any parallelism / after any retry. Output is long-format
(start, walk_id, step, vertex) parquet, ready to groupBy into sequences.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    p = base_parser("Deterministic random walks (hash-seeded)")
    p.add_argument("--walk-length", type=int, default=10)
    p.add_argument("--num-walks", type=int, default=1)
    p.add_argument("--salt", default="walk")
    args = p.parse_args()

    spark = get_session("flexgraph-walks")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    out = algorithms.random_walks(
        edges,
        walk_length=args.walk_length,
        num_walks=args.num_walks,
        salt=args.salt,
    )
    out.write.mode("overwrite").parquet(args.output)
    print(f"random_walks: length={args.walk_length} x{args.num_walks} -> {args.output}")


if __name__ == "__main__":
    main()
