"""A/B the FileOutputCommitter algorithm (v1 vs v2) on write-heavy
registry entries, interleaved in ONE process so box drift cannot
masquerade as a difference.

Per rep: run each entry once under v1, once under v2 (order ABBA-
alternated per rep). Reports per-entry medians and the per-rep ratio.

The conf is flipped at runtime: SessionState.newHadoopConf() copies
every session SQL conf into the per-job Hadoop conf, so
spark.conf.set("mapreduce.fileoutputcommitter.algorithm.version", ...)
takes effect for the next write without a JVM restart (verified: the
probe asserts the effective value by reading it back from a fresh
newHadoopConf through the session).

Usage: python tools/commit_ab_probe.py [reps] [entry ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_project_gcp_spark import queries as Q  # noqa: E402
from etl_project_gcp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_ENTRIES = [
    "medallion_gold_sales_summary",
    "medallion_gold_incremental_refresh",
    "zorder_pruning_report",
    "training_export_pipeline",
    "orc_roundtrip",
    "customer_upsert",
]

CONF = "mapreduce.fileoutputcommitter.algorithm.version"


def set_committer(spark, version: int) -> None:
    spark.conf.set(CONF, str(version))
    # belt and braces: also the context-level base conf
    spark.sparkContext._jsc.hadoopConfiguration().set(CONF, str(version))
    eff = (
        spark._jsparkSession.sessionState().newHadoopConf().get(CONF)
    )
    assert eff == str(version), f"committer conf did not take: {eff}"


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    entries = sys.argv[2:] or DEFAULT_ENTRIES
    os.environ["ETL_GCP_SPARK_DISABLE_PINS"] = "1"
    spark = get_spark(app_name="commit_ab_probe")
    registry = Q.queries()
    materialize(registry["count_lineitem"](spark, SF_DIR))  # warmup

    times: dict[tuple[str, int], list[float]] = {}
    for rep in range(reps):
        order = (1, 2) if rep % 2 == 0 else (2, 1)
        for name in entries:
            for v in order:
                set_committer(spark, v)
                t0 = time.time()
                materialize(registry[name](spark, SF_DIR))
                times.setdefault((name, v), []).append(time.time() - t0)
        print(f"rep {rep} done", flush=True)

    print(f"\n{'entry':40s} {'v1 med':>8s} {'v2 med':>8s} {'v2/v1':>6s}")
    for name in entries:
        m1 = statistics.median(times[(name, 1)])
        m2 = statistics.median(times[(name, 2)])
        print(f"{name:40s} {m1:8.3f} {m2:8.3f} {m2 / m1:6.3f}")
        print(
            "   v1:",
            [round(t, 2) for t in times[(name, 1)]],
            " v2:",
            [round(t, 2) for t in times[(name, 2)]],
        )


if __name__ == "__main__":
    main()
