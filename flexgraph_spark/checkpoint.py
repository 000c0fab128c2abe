"""M3 — per-iteration checkpointing with lineage, metrics, and resume.

Each superstep writes the vertex-state DataFrame to
``<dir>/<job>/iter=NNNNN/`` as Parquet and appends a manifest line to
``<dir>/<job>/manifest.jsonl``:

    {"iteration": k, "state_path": ..., "input_fingerprint": ...,
     "messages_shuffled": ..., "changed": ..., "edges_scanned": ...,
     "skew_ratio": ..., "seconds": ..., "completed_utc": ...}

The write is atomic-enough for resume: the manifest line is appended only
AFTER the Parquet commit succeeds (Spark's output committer makes the
directory itself all-or-nothing), so ``resume`` trusting the last manifest
line is safe — a killed run leaves at most an orphan partial directory that
is never referenced.

The reference keeps no durable iteration state at all (its intermediate
pv/dv vector files are deleted per-iteration barriers —
ComputationMapper.java:306-331); resumability is a new-engine requirement
(BASELINE.json north_rule).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict
from pathlib import Path

from pyspark.sql import DataFrame


class Checkpointer:
    def __init__(self, base_dir: str, input_fingerprint: str = "", keep_last: int = 3):
        self.base = Path(base_dir)
        self.input_fingerprint = input_fingerprint
        self.keep_last = keep_last
        self._job_params: dict[str, dict] = {}
        self.base.mkdir(parents=True, exist_ok=True)

    def set_job_params(self, job: str, **params) -> None:
        """Engine-level parameters recorded into every manifest row of a job
        (e.g. the blocked engine's p / dense_threshold — resuming under a
        different p would decode state arrays under the wrong (block, local)
        split, so the engine checks these via ``last_manifest``)."""
        self._job_params[job] = dict(params)

    def last_manifest(self, job: str) -> dict | None:
        """Latest manifest row of a job (by iteration), or None."""
        rows = self.manifest_rows(job)
        return max(rows, key=lambda r: r["iteration"]) if rows else None

    def _job_dir(self, job: str) -> Path:
        d = self.base / job
        d.mkdir(parents=True, exist_ok=True)
        return d

    def _manifest(self, job: str) -> Path:
        return self._job_dir(job) / "manifest.jsonl"

    def manifest_rows(self, job: str) -> list[dict]:
        mf = self._manifest(job)
        if not mf.exists():
            return []
        rows = []
        for line in mf.read_text().splitlines():
            line = line.strip()
            if line:
                rows.append(json.loads(line))
        return rows

    def save(self, job: str, iteration: int, state: DataFrame) -> DataFrame:
        """Write state Parquet, return the re-read DataFrame (lineage is now
        rooted at the files — the iterative-plan truncation)."""
        path = str(self._job_dir(job) / f"iter={iteration:05d}")
        state.write.mode("overwrite").parquet(path)
        self._last_path = path
        return state.sparkSession.read.parquet(path)

    def record_metrics(self, job: str, metrics) -> None:
        row = asdict(metrics) if not isinstance(metrics, dict) else dict(metrics)
        row.update(self._job_params.get(job, {}))
        row["state_path"] = getattr(self, "_last_path", None)
        row["input_fingerprint"] = self.input_fingerprint
        row["completed_utc"] = time.time()
        with open(self._manifest(job), "a") as f:
            f.write(json.dumps(row) + "\n")
        self._gc(job, row["iteration"])

    def _gc(self, job: str, current_iteration: int) -> None:
        """Drop state dirs older than keep_last iterations (keep disk flat —
        at 100 TB state you cannot keep every superstep)."""
        cutoff = current_iteration - self.keep_last
        for d in self._job_dir(job).glob("iter=*"):
            try:
                if int(d.name.split("=")[1]) < cutoff:
                    import shutil

                    shutil.rmtree(d, ignore_errors=True)
            except ValueError:
                pass

    def resume(self, job: str):
        """(iteration, state DataFrame) of the latest completed superstep,
        or None. Refuses to resume across a different input fingerprint."""
        rows = self.manifest_rows(job)
        rows = [r for r in rows if r.get("state_path") and os.path.isdir(r["state_path"])]
        if not rows:
            return None
        last = max(rows, key=lambda r: r["iteration"])
        if self.input_fingerprint and last.get("input_fingerprint") not in ("", self.input_fingerprint):
            raise ValueError(
                f"checkpoint fingerprint {last.get('input_fingerprint')!r} != "
                f"current input {self.input_fingerprint!r}"
            )
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        df = spark.read.parquet(last["state_path"])
        for c in ("_changed",):
            if c in df.columns:
                df = df.drop(c)
        return last["iteration"], df


def edges_fingerprint(edges: DataFrame) -> str:
    """Order-insensitive content hash of an edge DataFrame — ties a
    checkpoint to its exact input."""
    from pyspark.sql import functions as F

    cols = [F.col(c).cast("string") for c in edges.columns]
    # decimal(38) sum: order-insensitive and overflow-proof under ANSI mode
    row = edges.agg(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        F.count("*").alias("c"),
    ).first()
    return f"{row['h']}:{row['c']}"
