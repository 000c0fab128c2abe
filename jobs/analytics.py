"""spark-submit entry: batch analytics & record ops over parquet tables.

    spark-submit --py-files dist/flexgraph_spark.zip jobs/analytics.py \
        --input .../events.parquet --mode funnel \
        --steps view,click,purchase --output .../funnel
    ... --mode retention --output .../retention
    ... --mode quantiles --column n_chars --qs 0.25,0.5,0.75,0.99
    ... --mode entity --key rec_id --text-cols name,addr --block-col blk

Modes map 1:1 onto flexgraph_spark.analytics: funnel / retention over an
events table (user_id, event_type, ts), exact distributed quantiles over
any numeric column, and entity resolution over structured records.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import get_session


def main() -> None:
    p = argparse.ArgumentParser(description="batch analytics jobs")
    p.add_argument("--input", required=True, help="input parquet path")
    p.add_argument("--output", required=True, help="output parquet path")
    p.add_argument("--mode", required=True,
                   choices=["funnel", "retention", "quantiles", "entity"])
    p.add_argument("--steps", default="view,click,purchase",
                   help="funnel: ordered event types, comma-separated")
    p.add_argument("--column", default="n_chars", help="quantiles: column")
    p.add_argument("--qs", default="0.25,0.5,0.75,0.99",
                   help="quantiles: comma-separated q values in (0,1]")
    p.add_argument("--weight-col", default=None,
                   help="quantiles: weight column -> weighted-CDF inverse")
    p.add_argument("--key", default="rec_id", help="entity: key column")
    p.add_argument("--text-cols", default="name",
                   help="entity: comma-separated text columns")
    p.add_argument("--block-col", default="blk", help="entity: blocking column")
    p.add_argument("--threshold", type=float, default=0.6,
                   help="entity: Jaccard threshold")
    args = p.parse_args()
    spark = get_session(f"flexgraph-analytics-{args.mode}")
    df = spark.read.parquet(args.input)
    from flexgraph_spark import analytics

    if args.mode == "funnel":
        out = analytics.funnel(df, args.steps.split(","))
    elif args.mode == "retention":
        out = analytics.retention(df, period="day")
    elif args.mode == "quantiles":
        if args.weight_col:
            out = analytics.weighted_quantiles(
                df, args.column, args.weight_col,
                [int(round(float(q) * 100)) for q in args.qs.split(",")],
            )
        else:
            out = analytics.exact_quantiles(
                df, args.column, [float(q) for q in args.qs.split(",")]
            )
    else:
        out = analytics.entity_resolution(
            df, args.key, args.text_cols.split(","), args.block_col,
            threshold=args.threshold,
        )
    out.write.mode("overwrite").parquet(args.output)
    print(f"analytics[{args.mode}]: {out.count()} rows -> {args.output}")


if __name__ == "__main__":
    main()
