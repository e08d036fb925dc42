"""Benchmark harness: times EVERY registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value" (total cold sec), "unit", "queries",
"queries_warm", "sf", "bench_protocol"}.

Protocol (round-5 fix for single-shot timing noise): per query, one
cold run then WARM_RUNS immediate re-runs; "queries" records the cold
time, "queries_warm" the MEDIAN of the warm re-runs. Single-shot warm
numbers manufactured a phantom 2x regression in round 4
(shipping_priority_top10: one 3.08s sample vs 1.07-1.40s on re-measure)
— medians make cross-round comparisons meaningful. Each run is forced
to full materialization via the noop sink (count() alone can let
Catalyst skip projected columns). One warmup of the smallest query
amortizes session/JIT startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_project_gcp_spark import queries as Q  # noqa: E402
from etl_project_gcp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_WARM_RUNS", "3"))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_query(fn, spark) -> tuple[float, float]:
    """One cold run + WARM_RUNS re-runs; returns (cold, median-warm).
    The DataFrame is rebuilt per run so each timing covers the full
    plan+execute path (analysis cache aside — same as the driver)."""
    t0 = time.time()
    materialize(fn(spark, SF_DIR))
    cold = time.time() - t0
    warms = []
    for _ in range(WARM_RUNS):
        t0 = time.time()
        materialize(fn(spark, SF_DIR))
        warms.append(time.time() - t0)
    return round(cold, 3), round(statistics.median(warms), 3)


def time_medallion(spark) -> tuple[float, float]:
    """End-to-end bronze→silver→gold at the reference's own data scale
    (2 500 employees / 150 products / 5 000 sales — data_generator.py:19-21).
    Fixture generation is excluded from the timed span; the pipeline's
    9 statements (3 loads + 3 silver + 3 gold writes) are timed, cold
    plus median of WARM_RUNS full re-runs (every run rewrites all
    layers — the pipeline is overwrite-idempotent)."""
    import shutil
    import tempfile

    from etl_project_gcp_spark import datagen
    from etl_project_gcp_spark.plans.medallion import MedallionPipeline

    root = tempfile.mkdtemp(prefix="bench_medallion_")
    try:
        sources = datagen.write_fixture_csvs(
            spark, f"{root}/landing", n_employees=2500, n_products=150, n_sales=5000
        )
        pipe = MedallionPipeline(spark, f"{root}/warehouse")
        runs = []
        for _ in range(1 + WARM_RUNS):
            t0 = time.time()
            result = pipe.run_etl(sources)
            runs.append(time.time() - t0)
            if not result.get("success"):
                raise RuntimeError(f"medallion pipeline failed: {result}")
        return round(runs[0], 3), round(statistics.median(runs[1:]), 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="etl_project_gcp_spark-bench")
    registry = Q.queries()
    materialize(registry["count_lineitem"](spark, SF_DIR))  # warmup

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name, fn in registry.items():
        timings[name], warm[name] = time_query(fn, spark)
    timings["medallion_pipeline"], warm["medallion_pipeline"] = time_medallion(
        spark
    )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "full-registry query wall time, local[%s]"
                % os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "value_warm": round(sum(warm.values()), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "bench_protocol": (
                    "per query: 1 cold run + median of %d immediate re-runs "
                    "(queries=cold, queries_warm=median-warm); every run fully "
                    "materialized via noop sink; all %d registry entries + "
                    "medallion_pipeline covered"
                ) % (WARM_RUNS, len(registry)),
            }
        )
    )


if __name__ == "__main__":
    main()
