"""SparkSession construction with the engine's recommended configuration.

Single place for settings that matter at scale: AQE (runtime re-planning +
skew-join splitting), Arrow for pandas UDFs (the only Python execution path
the engine allows), and sane shuffle-partition defaults for local testing.
On a real cluster these come from spark-submit conf; the helper only fills
gaps so tests and bench runs behave consistently.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "flexgraph-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    ``master=None`` defers to spark-submit / existing session; tests pass
    ``local[4]``, bench passes ``local[8]`` / ``local[32]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None and cpus:
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        "spark.sql.parquet.compression.codec": "zstd",
        # Iterative jobs re-reference the same small state DataFrames; keep
        # broadcast threshold modest so hub-value joins broadcast by default.
        "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
