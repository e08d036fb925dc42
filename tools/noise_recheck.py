"""Bench noise-band attribution (r9 verdict ask #4).

The r8→r9 bench showed three sub-second IO-heavy entries drifting
1.4-1.9x raw (orc_roundtrip, orders_column_profile, silver_lineitem)
on a container whose fixed-workload normalizer ran 1.26x slow. This
probe re-measures them under controlled conditions so each drift is
attributed to page-cache/container noise or to a named regression:

- refuses to run unless 1-min loadavg is below --max-load (an idle
  container is the point; records loadavg before and after);
- one untimed warm pass per entry (page cache + code paths), then
  median of --runs noop-materialized runs (bench.py protocol);
- times the three r8 normalizer pins in the same sitting and reports
  each outlier BOTH raw vs its r8/r9 BENCH_FULL warm medians and
  normalized by this sitting's container ratio.

Usage: python tools/noise_recheck.py [--runs 5] [--max-load 4]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUTLIERS = ("orc_roundtrip", "orders_column_profile", "silver_lineitem")
PINS = ("count_lineitem", "pricing_summary", "doc_token_stats")
SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--max-load", type=float, default=4.0)
    ap.add_argument("--r8-rev", default="3a6e581")
    args = ap.parse_args()

    load0 = os.getloadavg()[0]
    if load0 > args.max_load:
        print(f"container not idle (loadavg {load0:.1f} > {args.max_load}) "
              "— rerun when quiet; this probe exists to EXCLUDE load noise")
        return 1

    os.environ["ETL_GCP_SPARK_DISABLE_PINS"] = "1"
    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.session import get_spark

    spark = get_spark(app_name="noise-recheck")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()

    def run_once(name: str) -> float:
        t0 = time.time()
        registry[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    med = {}
    for name in PINS + OUTLIERS:
        run_once(name)  # untimed warm pass
        med[name] = round(
            statistics.median(run_once(name) for _ in range(args.runs)), 3
        )
        print(f"{name}: {med[name]}s (median of {args.runs})", flush=True)

    cur = json.load(open(os.path.join(REPO, "BENCH_FULL.json")))
    r8 = json.loads(subprocess.run(
        ["git", "-C", REPO, "show", f"{args.r8_rev}:BENCH_FULL.json"],
        capture_output=True, text=True, check=True,
    ).stdout)
    ratio_r8 = statistics.median(
        med[p] / r8["queries_warm"][p] for p in PINS
    )
    ratio_r9 = statistics.median(
        med[p] / cur["queries_warm"][p] for p in PINS
    )
    print(f"\nloadavg start/end: {load0:.2f} / {os.getloadavg()[0]:.2f}")
    print(f"container ratio this sitting vs r8: {ratio_r8:.3f}, "
          f"vs r9: {ratio_r9:.3f}\n")
    print("| entry | r8 warm (s) | r9 warm (s) | idle now (s) "
          "| now/r8 normalized | verdict |")
    print("|---|---|---|---|---|---|")
    for n in OUTLIERS:
        a, b, c = r8["queries_warm"][n], cur["queries_warm"][n], med[n]
        norm = c / ratio_r8 / a
        verdict = "noise" if norm <= 1.25 else "INVESTIGATE"
        print(f"| {n} | {a} | {b} | {c} | {norm:.2f}x | {verdict} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
