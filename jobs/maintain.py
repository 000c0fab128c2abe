"""spark-submit entry: continuous graph maintenance over an edge stream.

Watches a parquet directory as an edge feed (the crawl ingest queue) and
keeps connected-component labels / PageRank / SSSP distances current via
per-micro-batch warm starts (streaming.streaming_cc_maintenance and
siblings). Batches may carry an ``op`` column ('add' | 'del'; absent =
all adds): deletions leave the live set via last-writer-wins on the edge
log, and the per-algorithm repair pass (component cold-restart for CC,
affected-closure reset for SSSP) keeps the warm start exact — crawl page
removals and GDPR deletes no longer force a cold rerun.
``--available-now`` drains the backlog and exits (the batch-ish cron
mode); otherwise the query runs until interrupted.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.common import get_session


def main() -> None:
    p = argparse.ArgumentParser(
        description="Streaming graph maintenance: cc | pagerank"
    )
    p.add_argument("--stream-dir", required=True,
                   help="parquet directory ingested as the edge stream")
    p.add_argument("--labels-dir", required=True,
                   help="state directory (edge log + labels table)")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--algorithm", choices=["cc", "pagerank", "sssp"], default="cc")
    p.add_argument("--threshold", type=float, default=1e-7)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--available-now", action="store_true",
                   help="drain the current backlog, then exit")
    p.add_argument("--source", type=int, default=0,
                   help="source vertex (sssp)")
    args = p.parse_args()

    spark = get_session("flexgraph-maintain")
    from flexgraph_spark import streaming

    schema = ("src long, dst long, weight double"
              if args.algorithm == "sssp" else "src long, dst long")
    reader = spark.readStream.schema(schema)
    if args.max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", args.max_files_per_trigger)
    stream = reader.parquet(args.stream_dir)

    if args.algorithm == "cc":
        writer = streaming.streaming_cc_maintenance(
            stream, args.labels_dir, args.checkpoint_dir,
            max_iter=args.max_iter,
        )
    elif args.algorithm == "sssp":
        writer = streaming.streaming_sssp_maintenance(
            stream, args.labels_dir, args.checkpoint_dir,
            source_vertex=args.source, max_iter=args.max_iter,
        )
    else:
        writer = streaming.streaming_pagerank_maintenance(
            stream, args.labels_dir, args.checkpoint_dir,
            threshold=args.threshold, max_iter=args.max_iter,
        )
    if args.available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        print(f"maintain[{args.algorithm}]: backlog drained -> {args.labels_dir}/labels")
    else:
        q = writer.start()
        q.awaitTermination()


if __name__ == "__main__":
    main()
