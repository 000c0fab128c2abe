"""spark-submit entry: end-to-end corpus cleaning pipeline.

Chains the pretraining text-cleaning operators in production order, each
stage optional:

1. ``quality``   — Gopher/C4-style rule gate (token window, punct/digit
                   density, dup-line cap): drops failing documents.
2. ``blocklist`` — C4 bad-words screen (one whole-token hit kills the
                   doc; needs ``--block-terms``).
3. ``pii``       — email/IPv4/SSN redaction (rewrites text; runs before
                   dedup so docs differing only in PII dedup together).
4. ``paradedup`` — C4 corpus-wide paragraph dedup (first occurrence wins,
                   document rebuilt).
5. ``spandedup`` — Lee et al. exact duplicated-substring removal (every
                   corpus-duplicated n-gram span cut out, overlaps merged).

Writes (doc_id, text) plus the per-stage audit counters the run printed.
Every stage is a pure DataFrame plan (no Python rows); the whole pipeline
is one lazy composition until the final write.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import get_session

STAGES = ["quality", "blocklist", "pii", "paradedup", "spandedup"]


def main() -> None:
    p = argparse.ArgumentParser(description="Corpus cleaning pipeline")
    p.add_argument("--documents", required=True,
                   help="parquet path with (doc_id, text[, ...])")
    p.add_argument("--output", required=True, help="output parquet path")
    p.add_argument("--text-col", default="text")
    p.add_argument("--stages", default="quality,pii,paradedup,spandedup",
                   help=f"comma list from {STAGES} (order fixed); blocklist"
                        " joins the default set when --block-terms is given")
    p.add_argument("--block-terms", default=None,
                   help="comma list of blocklist words (enables the"
                        " blocklist stage)")
    p.add_argument("--max-flagged-frac", type=float, default=0.0)
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--span-n", type=int, default=5,
                   help="spandedup n-gram length")
    p.add_argument("--span-min-docs", type=int, default=2)
    args = p.parse_args()
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    if args.block_terms and "blocklist" not in stages:
        stages.insert(1 if "quality" in stages else 0, "blocklist")
    bad = set(stages) - set(STAGES)
    if bad:
        p.error(f"unknown stages: {sorted(bad)}")
    if "blocklist" in stages and not args.block_terms:
        p.error("the blocklist stage needs --block-terms")

    spark = get_session("flexgraph-clean")
    from pyspark.sql import functions as F

    from flexgraph_spark import textops

    docs = spark.read.parquet(args.documents).select(
        "doc_id", F.col(args.text_col).alias("text")
    )
    n_in = docs.count()
    audit: list[str] = [f"in={n_in}"]

    if "quality" in stages:
        passing = textops.quality_filter(
            docs, min_tokens=args.min_tokens
        ).select("doc_id")
        docs = docs.join(passing, "doc_id")
        n = docs.count()
        audit.append(f"quality_kept={n}")

    if "blocklist" in stages:
        terms = [t.strip() for t in args.block_terms.split(",") if t.strip()]
        ok = textops.blocklist_stats(
            docs, terms, max_flagged_frac=args.max_flagged_frac
        ).filter("passes").select("doc_id")
        docs = docs.join(ok, "doc_id")
        audit.append(f"blocklist_kept={docs.count()}")

    if "pii" in stages:
        docs = textops.redact_pii(docs).select(
            "doc_id", F.col("redacted").alias("text")
        )

    if "paradedup" in stages:
        out = textops.paragraph_dedup(docs)
        dropped = out.agg(F.sum("n_dropped")).first()[0] or 0
        docs = out.select("doc_id", F.col("clean_text").alias("text"))
        audit.append(f"paras_dropped={dropped}")

    if "spandedup" in stages:
        out = textops.remove_duplicated_spans(
            docs, n=args.span_n, min_docs=args.span_min_docs
        )
        removed = out.agg(F.sum("n_removed")).first()[0] or 0
        docs = out.select("doc_id", F.col("clean_text").alias("text"))
        audit.append(f"span_tokens_removed={removed}")

    docs.write.mode("overwrite").parquet(args.output)
    audit.append(f"out={spark.read.parquet(args.output).count()}")
    print("clean: " + " ".join(audit) + f" stages={','.join(stages)} "
          f"-> {args.output}")


if __name__ == "__main__":
    main()
