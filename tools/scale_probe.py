"""Scale probe: replicate the sf0.1 corpus K× (default 10 → sf1-equivalent)
with FK-consistent key offsets, then time selected queries at both scales
and print a markdown scaling table for NOTES.md.

Replication keeps referential integrity: every key column in a replica is
offset by ``rep * STRIDE``, so joins land exactly as they would on organic
data. Text/embedding payloads are perturbed per replica (suffix token /
tiny constant shift) so dedup and ANN probes see realistic near-duplicates
instead of a degenerate all-exact-dup corpus.

Usage: python tools/scale_probe.py [--k 10] [--base /root/testdata/sf0.1]
       [--out /tmp/sf1eq] [--names q1,q2,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STRIDE = 1_000_000_000

# table -> key columns that must offset together to preserve FKs
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]  # fixed dims, never scale

PROBE_QUERIES = [
    # relational headline
    "pricing_summary",
    "sales_analytics",
    "product_metrics",
    "shipping_priority_top10",
    "local_supplier_volume",
    # top-cost round-1 entries + the restructured LSH path
    "dedup_minhash",
    "dedup_simhash",
    "embedding_dedup_clusters",
    "cosine_topk",
    "cosine_topk_arrow",
    "ann_lsh_topk",
]


def build(spark, base: str, out: str, k: int) -> None:
    from pyspark.sql import functions as F

    reps = spark.range(k).withColumnRenamed("id", "rep")
    for t in COPY_ONLY:
        spark.read.parquet(f"{base}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{base}/{t}.parquet").crossJoin(F.broadcast(reps))
        for c in keys:
            df = df.withColumn(c, (F.col(c) + F.col("rep") * F.lit(STRIDE)).cast("long"))
        if t == "documents":
            # replicas become near-duplicates (suffix token), not exact dups
            df = df.withColumn(
                "text",
                F.when(F.col("rep") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" rep"), F.col("rep"))
                ),
            )
        if t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x: (x + F.col("rep").cast("float") * F.lit(1e-4)).cast("float"),
                ),
            )
        df.drop("rep").write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1eq")
    ap.add_argument("--names", default=None)
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    Q._ensure_session_confs(spark)  # events.parquet is TIMESTAMP(NANOS)

    if not args.skip_build:
        t0 = time.time()
        build(spark, args.base, args.out, args.k)
        print(f"built {args.k}x corpus at {args.out} in {time.time() - t0:.0f}s", flush=True)

    registry = Q.queries()
    names = args.names.split(",") if args.names else PROBE_QUERIES

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    print(f"| query | sf0.1 (s) | {args.k}x (s) | ratio |")
    print("|---|---|---|---|")
    for name in names:
        t0 = time.time()
        materialize(registry[name](spark, args.base))
        base_s = time.time() - t0
        t0 = time.time()
        materialize(registry[name](spark, args.out))
        big_s = time.time() - t0
        print(
            f"| {name} | {base_s:.2f} | {big_s:.2f} | {big_s / base_s:.1f}x |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
