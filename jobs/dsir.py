"""spark-submit entry: DSIR data selection (Xie et al., NeurIPS 2023).

Scores every raw document by how target-like its hashed n-gram features
are (importance log-weights under target-vs-raw bucket LMs) and either
writes the full weight table or resamples ``--select-k`` documents
without replacement via deterministic Gumbel top-k.

The target corpus is a second parquet table (``--target``) or a predicate
over the raw table (``--target-filter``, a SQL boolean expression — e.g.
"lang = 'en'"). Both the weights and the selected set are pure functions
of (text, doc_id, salt): rerunnable at any parallelism with identical
output.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import get_session


def main() -> None:
    p = argparse.ArgumentParser(description="DSIR importance selection")
    p.add_argument("--documents", required=True,
                   help="raw corpus parquet with (doc_id, text[, ...])")
    p.add_argument("--target", default=None,
                   help="target corpus parquet with (doc_id, text[, ...])")
    p.add_argument("--target-filter", default=None,
                   help="SQL predicate selecting the target slice of the "
                        "raw table (alternative to --target)")
    p.add_argument("--output", required=True, help="output parquet path")
    p.add_argument("--text-col", default="text")
    p.add_argument("--num-buckets", type=int, default=4096)
    p.add_argument("--salt", default="dsir")
    p.add_argument("--select-k", type=int, default=None,
                   help="resample this many docs (Gumbel top-k); "
                        "omit to write weights for every raw doc")
    args = p.parse_args()
    if (args.target is None) == (args.target_filter is None):
        p.error("exactly one of --target / --target-filter is required")

    spark = get_session("flexgraph-dsir")
    from flexgraph_spark import corpus

    raw = spark.read.parquet(args.documents)
    target = (
        spark.read.parquet(args.target)
        if args.target is not None
        else raw.filter(args.target_filter)
    )
    if args.select_k is not None:
        out = corpus.dsir_sample(
            raw, target, k=args.select_k, text_col=args.text_col,
            num_buckets=args.num_buckets, salt=args.salt,
        )
        what = f"selected {args.select_k}"
    else:
        out = corpus.dsir_logweights(
            raw, target, text_col=args.text_col,
            num_buckets=args.num_buckets, salt=args.salt,
        )
        what = "weights for all"
    out.write.mode("overwrite").parquet(args.output)
    print(f"dsir: {what} of {raw.count()} raw docs "
          f"(B={args.num_buckets}) -> {args.output}")


if __name__ == "__main__":
    main()
