"""Scale probe for the medallion/CTAS WRITE path (r12 verdict ask #3).

Every [EXT] family has a 10x/100x scale table; the write path — the
thing a 100 TB pipeline does most — had none. This probe replicates the
sf0.1 ORDERS table K x (K in {1, 10, 100} -> 150k/1.5M/15M rows; orders
is the corpus the medallion gate actually ingests —
plans/medallion.py::run_corpus_gold_sales_summary) with per-replica key
offsets and per-replica date/price perturbation so gold's (year, month,
priority, status) group count stays FIXED while group sizes grow with K
(the aggregation regime a calendar rollup actually sees at scale: more
rows per partition, not more partitions), and measures per K:

- per-layer wall (land_csv, bronze, silver, gold), median of --runs
  after one untimed warm pass (the bench protocol), each rep in a
  fresh temp warehouse;
- shuffle write bytes per run (Spark UI REST, the span_scale_probe
  method) — expected ~flat in the landing/bronze/silver layers (no
  shuffle: map-side writes) and linear-in-groups tiny for gold (the
  partial-agg output, NOT the input rows, crosses the wire);
- files written per layer (commit overhead is per-file: a write path
  whose file count grows super-linearly dies at 1000 executors).

Super-linear wall in any layer = a term to attribute; linear wall with
flat shuffle = the layer scales as a map-side stream, which is the
100 TB claim being tested.

Usage: python tools/medallion_scale_probe.py [--ks 1,10,100] [--runs 3]
Prints one JSON line; paste the table into NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STRIDE = 1_000_000_000


def _shuffle_write_bytes(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _count_files(root: str) -> int:
    n = 0
    for _, _, files in os.walk(root):
        n += sum(
            1 for f in files
            if not f.startswith((".", "_"))  # crc sidecars, _SUCCESS
        )
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--ks", default="1,10,100")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    ks = [int(k) for k in args.ks.split(",")]

    from pyspark.sql import functions as F

    from etl_project_gcp_spark import exact as X
    from etl_project_gcp_spark.session import get_spark
    from etl_project_gcp_spark.sources.readers import read_csv_bronze

    spark = get_spark(
        app_name="medallion-scale-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            # ADVICE r13: _shuffle_write_bytes sums the completed-stages
            # REST listing; a K=100 sweep can exceed the default 1000
            # retained stages, silently evicting early stages and
            # undercounting the start-to-end delta. Retain enough for
            # the whole sweep.
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(f"{args.base}/orders.parquet")
    root = tempfile.mkdtemp(prefix="medallion_scale_")
    out = {"base": args.base, "runs": args.runs, "ks": ks, "rows": {},
           "loadavg_start": [round(x, 2) for x in os.getloadavg()]}

    def _layers(src, w: str) -> dict[str, float]:
        """One full chain into warehouse `w`; returns per-layer walls."""
        walls = {}
        t0 = time.perf_counter()
        src.write.mode("overwrite").options(header=True).csv(
            f"{w}/landing/orders"
        )
        walls["land_csv"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        bronze = read_csv_bronze(spark, f"{w}/landing/orders")
        bronze.write.mode("overwrite").parquet(f"{w}/bronze/orders")
        walls["bronze"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        silver = (
            spark.read.parquet(f"{w}/bronze/orders")
            .select(
                "o_orderkey",
                "o_custkey",
                F.col("o_orderstatus").cast("string").alias("o_orderstatus"),
                F.col("o_totalprice").cast("decimal(15,2)").alias("o_totalprice"),
                F.col("o_orderdate").cast("date").alias("o_orderdate"),
                "o_orderpriority",
            )
            .filter(F.col("o_totalprice") > 0)
        )
        silver.write.mode("overwrite").parquet(f"{w}/silver/orders")
        walls["silver"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        gold = (
            spark.read.parquet(f"{w}/silver/orders")
            .groupBy(
                F.year("o_orderdate").alias("year"),
                F.month("o_orderdate").alias("month"),
                "o_orderpriority",
                "o_orderstatus",
            )
            .agg(
                F.count(F.lit(1)).alias("total_transactions"),
                X.dsum_round(F.col("o_totalprice")).alias("total_revenue"),
                X.davg(F.col("o_totalprice")).alias("avg_transaction_value"),
            )
        )
        gold.write.mode("overwrite").partitionBy("year", "month").parquet(
            f"{w}/gold/sales_summary"
        )
        walls["gold"] = time.perf_counter() - t0
        return {k: round(v, 3) for k, v in walls.items()}

    for k in ks:
        path = f"{root}/orders_x{k}"
        reps = [
            orders.select(
                (F.col("o_orderkey") + F.lit(i * STRIDE)).alias("o_orderkey"),
                "o_custkey", "o_orderstatus",
                # perturb price per replica (cent jitter) so gold's
                # sums aren't a trivial K-multiple of the base corpus
                (F.col("o_totalprice") + F.lit(i) / F.lit(100.0)).alias(
                    "o_totalprice"
                ),
                "o_orderdate", "o_orderpriority",
            )
            for i in range(k)
        ]
        corpus = reps[0]
        for r in reps[1:]:
            corpus = corpus.unionByName(r)
        corpus.repartition(32).write.mode("overwrite").parquet(path)
        scaled = spark.read.parquet(path)
        out["rows"][str(k)] = scaled.count()

        # untimed warm pass (also supplies the file counts)
        warm_w = f"{root}/wh_warm_x{k}"
        _layers(scaled, warm_w)
        out[f"k{k}_files"] = {
            layer: _count_files(f"{warm_w}/{sub}")
            for layer, sub in [
                ("land_csv", "landing"), ("bronze", "bronze"),
                ("silver", "silver"), ("gold", "gold"),
            ]
        }
        shutil.rmtree(warm_w, ignore_errors=True)

        per_layer: dict[str, list[float]] = {}
        sw0 = _shuffle_write_bytes(spark)
        for rep in range(args.runs):
            w = f"{root}/wh_x{k}_r{rep}"
            walls = _layers(scaled, w)
            shutil.rmtree(w, ignore_errors=True)
            for layer, sec in walls.items():
                per_layer.setdefault(layer, []).append(sec)
        sw = _shuffle_write_bytes(spark) - sw0
        out[f"k{k}"] = {
            "wall_median": {
                layer: round(statistics.median(v), 3)
                for layer, v in per_layer.items()
            },
            "wall": per_layer,
            "total_median": round(
                sum(statistics.median(v) for v in per_layer.values()), 3
            ),
            "shuffle_write_bytes_per_run": sw // args.runs,
        }
        print(f"k{k}: {out[f'k{k}']['wall_median']} "
              f"total={out[f'k{k}']['total_median']} "
              f"shuffle/run={sw // args.runs / 1e6:.1f} MB "
              f"files={out[f'k{k}_files']}", flush=True)
        shutil.rmtree(path, ignore_errors=True)

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
