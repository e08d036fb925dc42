"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value" (total sec), "unit", "queries", "sf"}.

Each query is forced to full materialization via the noop sink (count()
alone can let Catalyst skip projected columns). One warmup of the
smallest query amortizes session/JIT startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_project_gcp_spark import queries as Q  # noqa: E402
from etl_project_gcp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: every operator family from SURVEY §2 with a scale story.
BENCH_QUERIES = [
    "pricing_summary",
    "silver_lineitem",
    "sales_analytics",
    "shipping_priority_top10",
    "local_supplier_volume",
    "product_metrics",
    "sales_summary",
    "priority_rollup",
    "region_summary",
    "top5_parts_by_revenue",
    "top3_parts_per_brand",
    "customer_running_total",
    "hourly_event_counts",
    "sliding_event_counts",
    "event_sessions",
    "purchase_last_click",
    "errors_recent_clicks",
    "event_props_by_type",
    "dedup_exact",
    "doc_token_stats",
    "doc_quality",
    "word_counts_top20",
    "doc_fingerprint",
    "doc_normalized",
    "doc_redacted",
    "dedup_minhash",
    "dedup_simhash",
    "cosine_topk",
    "cosine_topk_arrow",
    "ann_ivf_topk",
    "binary_meta",
    "embedding_dedup_clusters",
    "tfidf_top_terms",
    "token_budget_packing",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_medallion(spark) -> float:
    """End-to-end bronze→silver→gold at the reference's own data scale
    (2 500 employees / 150 products / 5 000 sales — data_generator.py:19-21).
    Fixture generation is excluded from the timed span; the pipeline's
    9 statements (3 loads + 3 silver + 3 gold writes) are timed."""
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
        t0 = time.time()
        result = pipe.run_etl(sources)
        dt = time.time() - t0
        if not result.get("success"):
            raise RuntimeError(f"medallion pipeline failed: {result}")
        return round(dt, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="etl_project_gcp_spark-bench")
    registry = Q.queries()
    materialize(registry["count_lineitem"](spark, SF_DIR))  # warmup

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        materialize(registry[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)
        # immediate re-run: codegen/JIT/page cache warm — isolates plan cost
        # from one-time compilation so plan changes are visible round-over-round
        t0 = time.time()
        materialize(registry[name](spark, SF_DIR))
        warm[name] = round(time.time() - t0, 3)
    timings["medallion_pipeline"] = time_medallion(spark)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline-query wall time, local[%s]"
                % os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "value_warm": round(sum(warm.values()), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
