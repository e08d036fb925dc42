"""Gold partition-COUNT scale probe (r13 verdict ask #2).

The r13 scale probe (tools/medallion_scale_probe.py) grew ROWS 100x at
a FIXED 80 (year, month) calendar partitions and proved gold's wall is
the per-partition-directory commit term (~12 ms/dir of
FileOutputCommitter v1 task-commit + driver rename), not rows. This
probe runs the COMPLEMENTARY axis: grow the CALENDAR SPAN — the way a
real multi-year corpus grows partition dirs — at fixed rows per dir, by
date-shifting sf0.1 ORDERS replicas in whole 84-month (7-year) strides
so each replica tiles a disjoint calendar range. K in {1, 3, 10} gives
80 / 240 / 800 (year, month) dirs with rows/dir constant (~1.9k).

Per K, after one untimed warm pass, median of --runs for:

- agg_noop     gold rollup aggregate, noop-materialized (no write) —
               the data term alone;
- flat_write   the same result as ONE unpartitioned parquet dir — the
               write term with a single commit;
- part_write   partitionBy(year, month) — D dirs; (part - flat)/D is
               the per-dir commit slope this probe exists to pin;
- year_write   partitionBy(year) — D/12 dirs; the coarser-granularity
               alternative a layout owner would reach for first;
- dyn_month    partitionOverwriteMode=dynamic overwrite of ONE month's
               rows into the existing D-dir dataset — the incremental
               path a production pipeline takes instead of a full
               rewrite (writer-local option, no session conf mutated).

Regime statement this produces: full-rewrite cost grows ~linearly with
calendar span at ~slope ms/dir while dyn_month stays ~flat, so the span
where (slope x D) exceeds dyn_month's fixed cost is where incremental
dynamic overwrite wins; year_write names what coarser granularity buys.

Usage: python tools/medallion_span_probe.py [--ks 1,3,10] [--runs 3]
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STRIDE = 1_000_000_000
SPAN_MONTHS = 84  # the sf corpus' own calendar span: 7 years x 12


def _count_dirs(root: str) -> int:
    n = 0
    for _, dirs, _ in os.walk(root):
        n += sum(1 for d in dirs if "=" in d)
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--ks", default="1,3,10")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    ks = [int(k) for k in args.ks.split(",")]

    from pyspark.sql import functions as F

    from etl_project_gcp_spark import exact as X
    from etl_project_gcp_spark.session import get_spark

    spark = get_spark(app_name="medallion-span-probe")
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(f"{args.base}/orders.parquet")
    root = tempfile.mkdtemp(prefix="medallion_span_")
    out = {"base": args.base, "runs": args.runs, "ks": ks,
           "span_months_per_replica": SPAN_MONTHS,
           "loadavg_start": [round(x, 2) for x in os.getloadavg()]}

    def _gold(silver):
        return (
            silver.groupBy(
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

    def _timed(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    try:
        for k in ks:
            # Silver-shaped input: K date-shifted replicas tiling
            # disjoint 7-year calendar ranges -> 80*K (year,month)
            # groups at the base corpus' rows-per-group.
            path = f"{root}/silver_x{k}"
            reps = [
                orders.select(
                    (F.col("o_orderkey") + F.lit(i * STRIDE)).alias(
                        "o_orderkey"
                    ),
                    "o_custkey",
                    F.col("o_orderstatus").cast("string").alias(
                        "o_orderstatus"
                    ),
                    (
                        F.col("o_totalprice") + F.lit(i) / F.lit(100.0)
                    ).cast("decimal(15,2)").alias("o_totalprice"),
                    F.add_months("o_orderdate", i * SPAN_MONTHS).alias(
                        "o_orderdate"
                    ),
                    "o_orderpriority",
                )
                for i in range(k)
            ]
            corpus = reps[0]
            for r in reps[1:]:
                corpus = corpus.unionByName(r)
            corpus.repartition(32).write.mode("overwrite").parquet(path)
            silver = spark.read.parquet(path)
            gold = _gold(silver)

            one_month = gold.filter(
                (F.col("year") == 1995) & (F.col("month") == 6)
            )
            part_root = f"{root}/gold_part_x{k}"

            variants = {
                "agg_noop": lambda: gold.write.format("noop").mode(
                    "overwrite"
                ).save(),
                "flat_write": lambda: gold.write.mode("overwrite").parquet(
                    f"{root}/gold_flat_x{k}"
                ),
                "part_write": lambda: gold.write.mode("overwrite")
                .partitionBy("year", "month")
                .parquet(part_root),
                "year_write": lambda: gold.write.mode("overwrite")
                .partitionBy("year")
                .parquet(f"{root}/gold_year_x{k}"),
                # one-month incremental overwrite into the EXISTING
                # part_write dataset; writer-local dynamic mode so only
                # the touched partition dir is replaced
                "dyn_month": lambda: one_month.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("year", "month")
                .parquet(part_root),
            }

            walls: dict[str, list[float]] = {}
            for name, fn in variants.items():
                _timed(fn)  # untimed warm (also seeds part_root for dyn)
                walls[name] = [_timed(fn) for _ in range(args.runs)]

            dirs = _count_dirs(part_root)
            med = {n: round(statistics.median(v), 3) for n, v in walls.items()}
            per_dir_ms = round(
                1000.0 * (med["part_write"] - med["flat_write"]) / dirs, 2
            )
            out[f"k{k}"] = {
                "rows": silver.count(),
                "part_dirs": dirs,
                "year_dirs": _count_dirs(f"{root}/gold_year_x{k}"),
                "wall_median": med,
                "wall": {n: [round(x, 3) for x in v] for n, v in walls.items()},
                "per_dir_commit_ms": per_dir_ms,
            }
            print(f"k{k}: dirs={dirs} {med} per_dir={per_dir_ms}ms",
                  flush=True)
            for sub in ("silver", "gold_part", "gold_flat", "gold_year"):
                shutil.rmtree(f"{root}/{sub}_x{k}", ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
