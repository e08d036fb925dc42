"""A/B the coarse-scan rebalance (_t_wide) per registry entry, by
monkeypatching Q._t for the probed variant — measurement only; the
real rollout edits each entry explicitly after this probe says where
the win is.

Interleaved in one process: per rep, each entry runs base then wide
(order alternating). Reports medians + ratio, worst-first.

Usage: python tools/rebalance_ab_probe.py [reps] [entry ...]
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

# tables worth widening for the probe (CPU-heavy scan consumers).
# embeddings is EXCLUDED: its 2000-row scan is not a CPU term, and the
# Arrow brute-force path receives empty batches when a 5-row query
# side is spread over 32 partitions (numpy norm axis error).
WIDE_TABLES = {"documents", "lineitem", "orders", "events"}

DEFAULT_ENTRIES = [
    "dedup_minhash", "dedup_pipeline", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_cluster_canonical", "dedup_incremental_near",
    "dedup_incremental_near_indexed", "dedup_incremental_near_bucketed",
    "embedding_dedup_clusters", "embedding_near_dups",
    "simhash_quality_report", "bpe_merges", "tfidf_top_terms",
    "doc_common_token_ratio", "doc_unigram_lm_score",
    "bigram_collocations", "word_counts_top20", "doc_token_stats",
    "doc_duplicate_spans", "token_budget_packing", "pricing_summary",
    "lineitem_stats", "large_volume_orders", "product_metrics",
    "sales_analytics", "nation_profit", "sliding_event_counts",
    "event_sessions",
    "quality_model_report", "customer_running_total", "dedup_exact",
]

_orig_t = Q._t


def _patched_t(spark, sf_dir, name):
    df = _orig_t(spark, sf_dir, name)
    if name in WIDE_TABLES:
        return Q._coarse_rebalance(spark, df, sf_dir, name)
    return df


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    entries = sys.argv[2:] or DEFAULT_ENTRIES
    os.environ["ETL_GCP_SPARK_DISABLE_PINS"] = "1"
    spark = get_spark(app_name="rebalance_ab_probe")
    registry = Q.queries()
    materialize(registry["count_lineitem"](spark, SF_DIR))  # warmup

    times: dict[tuple[str, str], list[float]] = {}
    for rep in range(reps):
        variants = ["base", "wide"] if rep % 2 == 0 else ["wide", "base"]
        for name in entries:
            for variant in variants:
                Q._t = _patched_t if variant == "wide" else _orig_t
                try:
                    t0 = time.time()
                    materialize(registry[name](spark, SF_DIR))
                    times.setdefault((name, variant), []).append(
                        time.time() - t0
                    )
                finally:
                    Q._t = _orig_t
        print(f"rep {rep} done", flush=True)

    rows = []
    for name in entries:
        b = statistics.median(times[(name, "base")])
        w = statistics.median(times[(name, "wide")])
        rows.append((w / b, b, w, name))
    print(f"\n{'entry':36s} {'base':>7s} {'wide':>7s} {'w/b':>6s}")
    for ratio, b, w, name in sorted(rows):
        print(f"{name:36s} {b:7.3f} {w:7.3f} {ratio:6.3f}")
    tot_b = sum(r[1] for r in rows)
    tot_w = sum(r[2] for r in rows)
    print(f"{'TOTAL':36s} {tot_b:7.3f} {tot_w:7.3f} {tot_w / tot_b:6.3f}")


if __name__ == "__main__":
    main()
