"""spark-submit entry: end-to-end corpus near-dup deduplication.

Reads a documents parquet table (doc_id, text[, ...]), finds near-duplicate
pairs, clusters them transitively through the GIM-V connected-components
engine, and writes (doc_id, cluster_id, is_canonical) — filter
``is_canonical`` to get the deduplicated corpus.

Two candidate paths:
* ``--method exact``   — prefix-filtered AllPairs/PPJoin exact Jaccard join
  (lossless for the threshold; the default).
* ``--method minhash`` — MinHash signatures + LSH banding + exact verify
  (cheaper at extreme scale; banding recall at the threshold boundary is
  the standard LSH trade-off, precision stays exact).

``--mode fork`` switches to COLLECTION-level fork/mirror detection:
group documents by ``--group-col`` and report collection pairs whose
exact content-sha Jaccard reaches the threshold (inverted-index exact
path, or the banded-MinHash scale face with ``--method minhash``).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import get_session


def main() -> None:
    p = argparse.ArgumentParser(description="Near-dup dedup clustering")
    p.add_argument("--documents", required=True,
                   help="parquet path with (doc_id, text[, ...])")
    p.add_argument("--output", required=True, help="output parquet path")
    p.add_argument("--text-col", default="text")
    p.add_argument("--threshold", type=float, default=0.7,
                   help="Jaccard near-dup threshold")
    p.add_argument("--shingle-k", type=int, default=5)
    p.add_argument("--method", choices=["exact", "minhash"], default="exact")
    p.add_argument("--num-hashes", type=int, default=32)
    p.add_argument("--bands", type=int, default=16)
    p.add_argument("--mode", choices=["docs", "fork"], default="docs")
    p.add_argument("--group-col", default="source",
                   help="fork mode: collection column")
    p.add_argument("--max-sha-freq", type=int, default=1000,
                   help="fork mode: drop shas in more collections than this")
    args = p.parse_args()

    spark = get_session("flexgraph-dedup")
    docs = spark.read.parquet(args.documents)
    from flexgraph_spark import corpus, textops

    if args.mode == "fork":
        fn = (textops.group_overlap_minhash if args.method == "minhash"
              else textops.group_overlap)
        kw = ({"num_hashes": args.num_hashes, "bands": args.bands}
              if args.method == "minhash" else {})
        out = fn(docs, group_col=args.group_col, text_col=args.text_col,
                 min_jaccard=args.threshold,
                 max_sha_freq=args.max_sha_freq, **kw)
        out.write.mode("overwrite").parquet(args.output)
        print(f"dedup[fork/{args.method}]: {out.count()} collection pairs "
              f"-> {args.output}")
        return

    if args.method == "minhash":
        pairs = textops.minhash_near_duplicates(
            docs, args.text_col, threshold=args.threshold,
            num_hashes=args.num_hashes, bands=args.bands, k=args.shingle_k,
        )
    else:
        pairs = textops.jaccard_similarity_join(
            docs, args.text_col, threshold=args.threshold, k=args.shingle_k
        )
    out = corpus.dedup_clusters(
        docs, args.text_col, threshold=args.threshold, k=args.shingle_k,
        pairs=pairs,
    )
    out.write.mode("overwrite").parquet(args.output)
    kept = out.filter("is_canonical").count()
    total = out.count()
    print(f"dedup: {total} docs -> {kept} canonical ({args.method}, "
          f"t={args.threshold}) -> {args.output}")


if __name__ == "__main__":
    main()
