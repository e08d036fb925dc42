"""Stateful-drain shuffle-partition knob (r11 verdict ask #3).

The r11 sessionize attribution showed ~2.5 s of state-store
setup+commit across 32 partitions for ~1,500 groups. Question: is the
plumbing term per-PARTITION (store open/commit per partition per
micro-batch — fewer partitions would shrink it, and the knob matters
at redeploy time) or per-ROW (Arrow round trip + per-row inserts —
width-flat)? This names the SECOND scale knob for stateful ops (the
first, the RocksDB provider, was probed in r8/r11).

Per drain (sessionize with sentinels, forward-fill, plus the
state_noop rung that has NO Python fold at all) × width in {8, 32}:

- time REPS fresh availableNow drains at sf0.1 (median) with
  spark.sql.shuffle.partitions bound to the width at query start;
- hash-oracle the registry entry at sf0.01 under the SAME width —
  partition independence is the repo's own invariant, asserted here
  per width, not assumed.

Usage: python tools/drain_partitions_probe.py [--sf-dir ...]
Prints one JSON line; paste the table into NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from drain_attribution import _noop_stateful, _timed_drain  # noqa: E402

REPS = int(os.environ.get("DRAIN_ATTR_REPS", "3"))
WIDTHS = (8, 32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--oracle-sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.session import get_spark
    from etl_project_gcp_spark.streaming.streams import (
        stateful_sessionize,
        streaming_forward_fill,
    )
    from tests.oracle import compare

    spark = get_spark(app_name="drain-partitions-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # the registry entries' exact landed inputs
    ev = Q._events(spark, args.sf_dir)
    gmax = ev.agg(F.max("ts").alias("m")).first().m
    sentinels = (
        ev.select("user_id")
        .distinct()
        .select(
            F.lit(-1).cast("bigint").alias("event_id"),
            (F.lit(gmax).cast("timestamp") + F.expr("INTERVAL 2 HOURS")).alias(
                "ts"
            ),
            "user_id",
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    root = tempfile.mkdtemp(prefix="drain_width_")
    land_sess = root + "/events_sentinel"
    land_raw = root + "/events_raw"
    ev.select(*cols).unionByName(sentinels).coalesce(8).write.mode(
        "overwrite"
    ).parquet(land_sess)
    ev.select(*cols).coalesce(8).write.mode("overwrite").parquet(land_raw)

    plans = {
        "state_noop": (land_raw, _noop_stateful),
        "sessionize": (
            land_sess,
            lambda s: stateful_sessionize(s, gap_seconds=1800),
        ),
        "forward_fill": (
            land_raw,
            lambda s: streaming_forward_fill(s, observe_type="purchase"),
        ),
    }
    out = {"sf_dir": args.sf_dir, "reps": REPS, "widths": list(WIDTHS)}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for width in WIDTHS:
            spark.conf.set("spark.sql.shuffle.partitions", str(width))
            for name, (land, plan) in plans.items():
                runs = _timed_drain(
                    spark, land, plan, f"w{width}_{name}"
                )
                out[f"{name}_w{width}"] = runs
                print(f"{name} @ {width} partitions: {runs}", flush=True)
            # hash-oracle the two registry entries at sf0.01 under this
            # width — the sessionize entry inherits the session conf;
            # the forward-fill entry too (neither overrides)
            for entry in (
                "streaming_sessionize_drain",
                "streaming_forward_fill_drain",
            ):
                compare(
                    Q.queries()[entry](spark, args.oracle_sf_dir),
                    Q.oracle_sql()[entry],
                    args.oracle_sf_dir,
                )
            out[f"oracles_green_w{width}"] = True
            print(f"oracles green @ {width} partitions", flush=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    out["median"] = {
        f"{name}_w{width}": statistics.median(out[f"{name}_w{width}"])
        for name in plans
        for width in WIDTHS
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
