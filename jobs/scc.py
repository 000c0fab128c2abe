"""spark-submit entry: strongly connected components (coloring + FW-BW).

Outputs (vertex, value) with value = min member id of the SCC; add
--levels to ALSO write the condensation-DAG topological levels
(vertex, scc_id, level) — the build-order face of a dependency graph.
Runs its own multi-fixpoint plan (forward min-color flood + color-local
backward BFS per outer round), so engine flags don't apply.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import base_parser, get_session, load_edges


def main() -> None:
    p = base_parser("Strongly connected components")
    p.add_argument(
        "--levels", action="store_true",
        help="write condensation-DAG topological levels instead of bare labels",
    )
    args = p.parse_args()
    if args.engine != "flat":
        raise SystemExit(
            "scc: only --engine flat (multi-fixpoint outer loop, not a "
            "single GIM-V product)"
        )
    spark = get_session("flexgraph-scc")
    edges = load_edges(spark, args)
    from flexgraph_spark import algorithms

    res = algorithms.scc(
        edges, max_outer=args.max_iter, num_partitions=args.num_partitions
    )
    if args.levels:
        out = algorithms.condensation_levels(
            edges, num_partitions=args.num_partitions, scc_labels=res.state
        )
        out.write.mode("overwrite").parquet(args.output)
    else:
        res.state.write.mode("overwrite").parquet(args.output)
    print(
        f"scc: outer_rounds={res.iterations} converged={res.converged} "
        f"-> {args.output}"
    )


if __name__ == "__main__":
    main()
