"""spark-submit entry: prepartition a link graph into CSR blocks + stats.

Reference parity: the UnweightedGraphPrepartitioning /
WeightedGraphPrepartitioning jobs (sbin/prepartitioning_*.sh) — block grid,
dense/sparse classification, and the _STATS sidecar
(GraphPrepartitioningReducer.java:106-127) — collapse into one Spark app
writing block-partitioned Parquet plus a JSON manifest. pagerank.py / cc.py
can then run with ``--blocks <out>`` to skip the build.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    args = base_parser("Graph prepartitioning (CSR blocks + stats)").parse_args()
    spark = get_session("flexgraph-prepartition")
    edges = load_edges(spark, args)
    from flexgraph_spark import blocks as B

    p = args.num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    weighted = "weight" in edges.columns
    dt = (
        args.dense_threshold
        if args.dense_threshold is not None
        else B.DENSE_THRESHOLD_DEFAULT
    )
    blk = B.prepartition(edges, p, dt, weighted=weighted)
    stats = B.write_blocks(blk, args.output, p=p, dense_threshold=dt)
    print(
        f"prepartition: p={p} threshold={dt} -> {args.output} "
        f"({stats['total_edges']} edges, {stats['dense_edges']} dense, "
        f"skew={stats['skew_ratio']:.2f})"
    )


if __name__ == "__main__":
    main()
