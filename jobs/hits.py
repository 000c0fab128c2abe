"""spark-submit entry: HITS hubs & authorities (fixed-depth recurrence).

Runs exactly --max-iter L2-normalized half-step pairs (the recurrence
depth is the result's contract — see flexgraph_spark.algorithms.hits).
``--engine blocked`` runs the alternation on the CSR kernels via vertex
doubling + parity masking (gimv.AlternatingPropagation) with the
per-half-step L2 norms deferred to one end normalize — requires
contiguous ids [0, n) (graph.remap_contiguous).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, engine_kwargs, get_session, load_edges


def main() -> None:
    p = base_parser("HITS hubs & authorities")
    args = p.parse_args()
    spark = get_session("flexgraph-hits")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    res = algorithms.hits(
        edges, max_iter=args.max_iter, engine=args.engine,
        **engine_kwargs(spark, args),
    )
    res.state.write.mode("overwrite").parquet(args.output)
    print(f"hits: iterations={res.iterations} -> {args.output}")


if __name__ == "__main__":
    main()
