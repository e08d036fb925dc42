"""Bronze ingest-layer probe: full inference vs sampled vs PINNED schema
(r13 verdict ask #4).

The r13 round measured the bronze CSV layer's two inference modes at
100x (15M-row orders CSV): full-scan inference 3.04 s vs
samplingRatio=0.01 at 2.10 s (~31% off the layer). The documented
production recommendation — pass an explicit ``schema=`` so the
inference pass is skipped entirely (silver casts make it equivalent,
SURVEY §4.3.1) — had no measured row. This probe produces all three on
one corpus in one sitting: land a K x replicated sf0.1 ORDERS as header
CSV once, then time ``read_csv_bronze`` + parquet write under
(a) full inference, (b) sampling_ratio, (c) pinned schema, median of
--runs after one untimed warm pass each. Schema equality across the
three reads is asserted, not assumed.

Usage: python tools/ingest_schema_probe.py [--k 100] [--runs 3]
Prints one JSON line; paste the row into NOTES.md and cite the number
in sources/readers.py's docstring.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--sampling", type=float, default=0.01)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_project_gcp_spark.session import get_spark
    from etl_project_gcp_spark.sources.readers import read_csv_bronze

    spark = get_spark(app_name="ingest-schema-probe")
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(f"{args.base}/orders.parquet")
    root = tempfile.mkdtemp(prefix="ingest_schema_")
    out = {"base": args.base, "k": args.k, "runs": args.runs,
           "sampling_ratio": args.sampling,
           "loadavg_start": [round(x, 2) for x in os.getloadavg()]}

    try:
        reps = [
            orders.select(
                (F.col("o_orderkey") + F.lit(i * STRIDE)).alias("o_orderkey"),
                "o_custkey", "o_orderstatus",
                (F.col("o_totalprice") + F.lit(i) / F.lit(100.0)).alias(
                    "o_totalprice"
                ),
                "o_orderdate", "o_orderpriority",
            )
            for i in range(args.k)
        ]
        corpus = reps[0]
        for r in reps[1:]:
            corpus = corpus.unionByName(r)
        csv_path = f"{root}/landing/orders"
        corpus.write.mode("overwrite").options(header=True).csv(csv_path)
        out["rows"] = spark.read.options(header=True).csv(csv_path).count()

        # the pinned schema a production caller would pass: exactly
        # what full inference resolves on this corpus (asserted below)
        pinned = read_csv_bronze(spark, csv_path).schema

        def _bronze(mode: str):
            if mode == "full":
                return read_csv_bronze(spark, csv_path)
            if mode == "sampled":
                return read_csv_bronze(
                    spark, csv_path, sampling_ratio=args.sampling
                )
            return read_csv_bronze(spark, csv_path, schema=pinned)

        for mode in ("full", "sampled", "pinned"):
            assert _bronze(mode).schema == pinned, f"{mode} schema drifted"

        walls: dict[str, list[float]] = {}
        for mode in ("full", "sampled", "pinned"):
            dst = f"{root}/bronze_{mode}"

            def _run() -> float:
                t0 = time.perf_counter()
                _bronze(mode).write.mode("overwrite").parquet(dst)
                return time.perf_counter() - t0

            _run()  # untimed warm
            walls[mode] = [_run() for _ in range(args.runs)]
            shutil.rmtree(dst, ignore_errors=True)

        out["bronze_wall_median"] = {
            m: round(statistics.median(v), 3) for m, v in walls.items()
        }
        out["bronze_wall"] = {
            m: [round(x, 3) for x in v] for m, v in walls.items()
        }
        print(out["bronze_wall_median"], flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
