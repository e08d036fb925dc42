"""Distributed connected-components scale probe (r9 verdict ask #2).

The hybrid ``connected_components`` takes the driver union-find below
2M edges, so the 100x ladder never exercised the distributed
min-label loop — its round-count/shuffle behavior at scale was
asserted by argument, not measurement. This probe runs BOTH paths on
the real dedup pair graphs the ladder corpora produce:

- pair graphs: ``minhash_near_duplicates`` over the 10x (/tmp/sf1eq,
  ~250k pairs) and 100x (/tmp/sf10eq, ~27.2M pairs) document corpora
  (tools/scale_probe.py replicas — each doc's K perturbed replicas
  form a near-dup clique, so the 100x graph is the near-clique shape
  the docstring claims converges in 2-3 rounds);
- distributed path: ``small_graph_threshold=0``, rounds recorded via
  the ``stats`` out-param, labels noop-materialized (the loop's own
  checkpoints do the heavy work inside the call);
- driver path: ``small_graph_threshold`` above the edge count
  (union-find over ``toLocalIterator``) — at 54M symmetrized edges
  this measures what the 2M threshold protects against;
- equality: full node-level join between the two label tables (both
  compute min-reachable-id per component, so any mismatch is a bug).

Pair graphs are built once and parqueted next to the corpus
(``<corpus>/cc_pairs.parquet``) so re-runs skip the ~6 min 100x LSH
stage. Results print as a NOTES.md-ready markdown table.

Usage:
    SPARK_DRIVER_MEMORY=16g python tools/cc_probe.py \
        [--rungs 10x:/tmp/sf1eq,100x:/tmp/sf10eq] [--skip-driver-at N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ensure_pairs(spark, corpus: str) -> str:
    from etl_project_gcp_spark.operators import dedup as DD

    out = os.path.join(corpus, "cc_pairs.parquet")
    if not os.path.exists(out):
        docs = spark.read.parquet(f"{corpus}/documents.parquet")
        t0 = time.time()
        DD.minhash_near_duplicates(docs).select("a", "b").write.mode(
            "overwrite"
        ).parquet(out)
        print(f"built {out} in {time.time() - t0:.0f}s", flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--rungs", default="10x:/tmp/sf1eq,100x:/tmp/sf10eq",
        help="comma list of tag:corpus_dir pairs (scale_probe replicas)",
    )
    ap.add_argument(
        "--skip-driver-at", type=int, default=0,
        help="skip the driver-path timing above this many edges (0 = never)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_project_gcp_spark.operators import dedup as DD
    from etl_project_gcp_spark.session import get_spark

    spark = get_spark(app_name="cc-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for tag, corpus in (p.split(":", 1) for p in args.rungs.split(",")):
        pairs = spark.read.parquet(ensure_pairs(spark, corpus))
        n_pairs = pairs.count()

        # distributed min-label loop, warm min-of-2
        dist_stats: dict = {}
        dist_ts = []
        for _ in range(2):
            dist_stats = {}
            t0 = time.time()
            dist = DD.connected_components(
                pairs, small_graph_threshold=0, stats=dist_stats
            )
            dist.write.format("noop").mode("overwrite").save()
            dist_ts.append(time.time() - t0)
        dist_labels = dist.localCheckpoint()

        # driver union-find (forced): what the 2M threshold buys below
        # it, and what it protects against above it
        drv_s, match = None, None
        if not args.skip_driver_at or dist_stats["edges"] <= args.skip_driver_at:
            t0 = time.time()
            drv = DD.connected_components(
                pairs, small_graph_threshold=1 << 62
            )
            drv_labels = drv.localCheckpoint()
            drv_s = time.time() - t0
            mismatches = (
                dist_labels.join(
                    drv_labels.withColumnRenamed("cluster_id", "drv"), "node",
                    "full",
                )
                .filter(
                    F.col("cluster_id").isNull()
                    | F.col("drv").isNull()
                    | (F.col("cluster_id") != F.col("drv"))
                )
                .count()
            )
            match = mismatches == 0

        n_nodes = dist_labels.count()
        n_clusters = dist_labels.select("cluster_id").distinct().count()
        rows.append(
            (tag, n_pairs, dist_stats["edges"], n_nodes, n_clusters,
             dist_stats["rounds"], min(dist_ts), drv_s, match)
        )
        print(f"{tag}: {rows[-1]}", flush=True)

    print("\n| graph | pairs | sym edges | nodes | clusters | rounds "
          "| distributed (s) | driver union-find (s) | labels equal |")
    print("|---|---|---|---|---|---|---|---|---|")
    for tag, np_, ne, nn, nc, r, ds, vs, eq in rows:
        vs_s = f"{vs:.1f}" if vs is not None else "skipped"
        eq_s = "yes" if eq else ("-" if eq is None else "NO")
        print(f"| {tag} | {np_:,} | {ne:,} | {nn:,} | {nc:,} | {r} "
              f"| {min_fmt(ds)} | {vs_s} | {eq_s} |")
    return 0


def min_fmt(s: float) -> str:
    return f"{s:.1f}"


if __name__ == "__main__":
    sys.exit(main())
