"""spark-submit entry: distributed BPE tokenizer training.

Reads a documents parquet table (text[, ...]), learns ``--merges`` BPE
merge rules over the corpus word-count table (Sennrich et al., ACL 2016 —
deterministic tie-break, greedy relational application; see
flexgraph_spark.corpus.bpe_learn), and writes two parquet outputs:
``<output>/merges`` (round, a, b, n) and ``<output>/vocab``
(word, cnt, syms) — the encoder table for every in-vocabulary word.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import get_session


def main() -> None:
    p = argparse.ArgumentParser(description="Distributed BPE merge learning")
    p.add_argument("--documents", required=True,
                   help="parquet path with (text[, ...])")
    p.add_argument("--text-col", default="text")
    p.add_argument("--merges", type=int, default=1000,
                   help="number of merge rounds to learn")
    p.add_argument("--min-count", type=int, default=2,
                   help="stop when no pair reaches this frequency")
    p.add_argument("--keep-case", action="store_true",
                   help="skip the default lowercase normalization")
    p.add_argument("--output", required=True)
    p.add_argument("--num-partitions", type=int, default=None)
    args = p.parse_args()
    spark = get_session("flexgraph-bpe")
    from flexgraph_spark import corpus

    docs = spark.read.parquet(args.documents)
    res = corpus.bpe_learn(
        docs,
        n_merges=args.merges,
        text_col=args.text_col,
        lowercase=not args.keep_case,
        min_count=args.min_count,
        num_partitions=args.num_partitions,
    )
    res.merges_df.write.mode("overwrite").parquet(f"{args.output}/merges")
    res.vocab.write.mode("overwrite").parquet(f"{args.output}/vocab")
    print(
        f"bpe: learned={len(res.merges)} (requested {args.merges}) "
        f"vocab_words={res.vocab.count()} -> {args.output}"
    )


if __name__ == "__main__":
    main()
