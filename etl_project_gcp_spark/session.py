"""SparkSession factory.

The reference builds its execution client at module import time
(``etl_medallion.py:56`` constructs the BigQuery client as a global),
which makes the module untestable. Here the session is built lazily by an
explicit factory, configured for Catalyst/AQE-first execution.

Scale notes (100 TB design stance):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  broadcast demotion/promotion replace hand-tuned partition counts.
- Arrow enabled: every pandas_udf / mapInPandas boundary is columnar.
- ``shuffle.partitions`` defaults to a small local value; on a real
  cluster AQE's coalescing makes the initial number a ceiling, so a
  deployment would raise it (e.g. 2000+) and let AQE shrink per-stage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "etl_project_gcp_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Idempotent: repeated calls return the active session (Spark semantics
    of ``getOrCreate``). ``master`` defaults to ``local[N]`` with N from
    ``$SPARK_GRAFT_CPUS`` when no cluster master is configured.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
