"""Attribute streaming_interval_join_drain's wall time (r11 verdict ask
#2): after the r11 sessionize fix it is the slowest drain (~2.4-3.0 s at
sf0.1). The sessionize attribution (tools/drain_attribution.py) paid for
itself 2x over; this is the same rung method for the dual-source
stream-stream join, which has never had one.

Five rungs on the SAME landed source (sf0.1 events, exactly what the
registry entry drains; inner join needs no sentinels), each a fresh
availableNow streaming query with its own checkpoint, all at the
entry's pinned stream shuffle width (8 — queries.py binds it because a
stream-stream join carries TWO state stores per partition and measured
6.9 -> 2.7 s going 32 -> 8 at gate scale):

  stateless   — readStream -> filter(False) -> memory sink: single-scan
                micro-batch machinery + checkpoint setup
  dual_scan   — error-branch UNION click-branch -> filter(False): the
                join's self-join source shape scans the landing twice;
                this prices the second branch without any state
  join_nomatch— the REAL interval join but with right-side keys offset
                into a disjoint range: every row still enters its
                side's state store and watermark accounting runs, but
                zero pairs match — state plumbing without output
  full        — streaming_interval_join itself: + matching + the
                ~300k-pair output materialization
  full_pruned — inputs hand-projected to the three columns the join
                reads/emits: the column-pruning headroom witness. This
                rung found the r12 fix (the operator now pre-projects,
                so post-fix it should read within noise of `full`).

So (stateless) ~ machinery, (dual_scan - stateless) ~ second source
branch, (join_nomatch - dual_scan) ~ symmetric-hash-join state
plumbing, (full - join_nomatch) ~ match + emit. REPS cold runs each
(fresh checkpoint + sink per rep; median reported) in ONE session,
matching how the bench times the entry.

Usage: python tools/interval_join_attribution.py [--sf-dir ...]
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

from drain_attribution import _timed_drain  # noqa: E402

REPS = int(os.environ.get("DRAIN_ATTR_REPS", "3"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--shuffle-partitions", type=int, default=8,
                    help="stream shuffle width (the registry entry pins 8)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.session import get_spark
    from etl_project_gcp_spark.streaming.streams import (
        streaming_interval_join,
    )

    spark = get_spark(app_name="interval-join-attribution")
    spark.sparkContext.setLogLevel("ERROR")
    # binds into each fresh query's checkpoint at start, like the entry
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
    )

    ev = Q._events(spark, args.sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    land_root = tempfile.mkdtemp(prefix="ij_attr_")
    land = land_root + "/events"
    t0 = time.time()
    ev.coalesce(8).write.mode("overwrite").parquet(land)
    t_land = round(time.time() - t0, 3)

    def _sides(stream):
        return (
            stream.filter(F.col("event_type") == "error"),
            stream.filter(F.col("event_type") == "click"),
        )

    def _dual_scan(stream):
        e, c = _sides(stream)
        return e.unionByName(c).filter(F.lit(False))

    def _join_nomatch(stream):
        e, c = _sides(stream)
        # disjoint key ranges: same operator, same state inserts and
        # watermark accounting, zero matching pairs
        return streaming_interval_join(
            e,
            c.withColumn(
                "user_id", F.col("user_id") + F.lit(10_000_000_000)
            ),
            lookback_seconds=300,
        )

    def _full(stream):
        e, c = _sides(stream)
        return streaming_interval_join(e, c, lookback_seconds=300)

    def _full_pruned(stream):
        # hand-pruned inputs (only the columns the join reads/emits):
        # if this matches `full`, Catalyst's ColumnPruning already
        # projects below the stateful join and the state rows are
        # minimal — the plumbing term is structural. If it is faster,
        # the registry entry is buffering dead `value`/`props` bytes in
        # BOTH state stores and should pre-project.
        e, c = _sides(stream)
        cols = ["event_id", "ts", "user_id"]
        return streaming_interval_join(
            e.select(*cols), c.select(*cols), lookback_seconds=300
        )

    out = {
        "sf_dir": args.sf_dir,
        "reps": REPS,
        "shuffle_partitions": args.shuffle_partitions,
        "land_sec": t_land,
    }
    out["stateless"] = _timed_drain(
        spark, land, lambda s: s.filter(F.lit(False)), "ij_stateless"
    )
    out["dual_scan"] = _timed_drain(spark, land, _dual_scan, "ij_dual")
    out["join_nomatch"] = _timed_drain(
        spark, land, _join_nomatch, "ij_nomatch"
    )
    out["full"] = _timed_drain(spark, land, _full, "ij_full")
    out["full_pruned"] = _timed_drain(
        spark, land, _full_pruned, "ij_full_pruned"
    )
    med = {
        k: statistics.median(out[k])
        for k in ("stateless", "dual_scan", "join_nomatch", "full",
                  "full_pruned")
    }
    out["median"] = med
    out["attribution"] = {
        "machinery_sec": med["stateless"],
        "second_branch_sec": round(med["dual_scan"] - med["stateless"], 3),
        "state_plumbing_sec": round(
            med["join_nomatch"] - med["dual_scan"], 3
        ),
        "match_emit_sec": round(med["full"] - med["join_nomatch"], 3),
    }
    import shutil

    shutil.rmtree(land_root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
