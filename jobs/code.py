"""spark-submit entry: code-payload analyses over a repo table
(repo, path, commit, lang, content).

    spark-submit --py-files dist/flexgraph_spark.zip jobs/code.py \
        --repo-table .../files.parquet --mode callgraph --output .../edges
    ... --mode dead --root-pattern '^main' --output .../dead_fns
    ... --mode clones --output .../clone_classes
    ... --mode quality --output .../kept_files
    ... --mode complexity --output .../fn_complexity
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import get_session


def main() -> None:
    p = argparse.ArgumentParser(description="code-payload analyses")
    p.add_argument("--repo-table", required=True,
                   help="parquet path of (repo, path, commit, lang, content)")
    p.add_argument("--output", required=True)
    p.add_argument("--mode", required=True,
                   choices=["callgraph", "dead", "clones", "quality", "complexity"])
    p.add_argument("--root-pattern", default=r"^main",
                   help="dead: entry-point name regex")
    p.add_argument("--min-copies", type=int, default=2,
                   help="clones: minimum class size")
    args = p.parse_args()
    spark = get_session(f"flexgraph-code-{args.mode}")
    files = spark.read.parquet(args.repo_table)
    from flexgraph_spark import codeops

    if args.mode == "callgraph":
        out = codeops.call_graph(files)
    elif args.mode == "dead":
        out = codeops.dead_functions(files, root_pattern=args.root_pattern)
    elif args.mode == "clones":
        out = codeops.function_clones(files, min_copies=args.min_copies)
    elif args.mode == "complexity":
        out = codeops.cyclomatic_complexity(files)
    else:
        out = codeops.code_quality_filter(files)
    out.write.mode("overwrite").parquet(args.output)
    print(f"code[{args.mode}]: {out.count()} rows -> {args.output}")


if __name__ == "__main__":
    main()
