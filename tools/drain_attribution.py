"""Attribute streaming_sessionize_drain's wall time (r10 verdict ask #3):
the entry is the slowest registry row (~5.3 s cold at sf0.1, ~2x the next
drain) — is that the OPERATOR (the applyInPandasWithState session fold)
or the HARNESS (landing rebuild, readStream/checkpoint setup, availableNow
micro-batch machinery)?

Four rungs on the SAME landed source (sf0.1 events + per-user sentinels,
8-file landing, exactly what the registry entry drains), each a fresh
availableNow streaming query with its own checkpoint:

  land       — write the landed parquet (pure harness, already split out
               by DRAIN_TIMING)
  stateless  — readStream -> filter(False) -> memory sink: scan + micro-
               batch machinery + checkpoint setup, no shuffle, no state
  state_noop — applyInPandasWithState with a trivial fn (count rows per
               user, no session logic): + the stateful exchange, state
               store setup/commit, and the Arrow->Python->Arrow round
               trip for every group
  full       — stateful_sessionize itself: + the actual Python fold

So (stateless) ~ machinery, (state_noop - stateless) ~ stateful plumbing,
(full - state_noop) ~ the session fold logic. REPS cold runs each (fresh
checkpoint + sink per rep; median reported) in ONE session, matching how
the bench times the entry.

Usage: python tools/drain_attribution.py [--sf-dir /root/testdata/sf0.1]
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

REPS = int(os.environ.get("DRAIN_ATTR_REPS", "3"))


def _timed_drain(spark, land, plan_fn, name, output_mode="append"):
    from etl_project_gcp_spark.streaming.streams import (
        read_event_stream,
        run_to_memory_sink,
    )

    runs = []
    for i in range(REPS):
        t0 = time.time()
        q = run_to_memory_sink(
            plan_fn(read_event_stream(spark, land)),
            f"{name}_{i}",
            output_mode=output_mode,
        )
        assert q.awaitTermination(300), f"{name} rep {i} did not finish"
        runs.append(round(time.time() - t0, 3))
        spark.catalog.dropTempView(f"{name}_{i}")
    return runs


def _noop_stateful(stream):
    """Same operator shape as stateful_sessionize (group by user_id,
    applyInPandasWithState, event-time timeout) with the cheapest
    possible fn — isolates the stateful machinery from the fold."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        n = sum(len(p) for p in pdfs)
        if not state.hasTimedOut:
            state.update((n,))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 10_000)
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            "user_id bigint, n int",
            "n int",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.session import get_spark
    from etl_project_gcp_spark.streaming.streams import stateful_sessionize

    spark = get_spark(app_name="drain-attribution")
    # the registry entry's exact landed input (sentinels included)
    ev = Q._events(spark, args.sf_dir)
    gmax = ev.agg(F.max("ts").alias("m")).first().m
    sentinels = (
        ev.select("user_id")
        .distinct()
        .select(
            F.lit(-1).cast("bigint").alias("event_id"),
            (F.lit(gmax).cast("timestamp") + F.expr("INTERVAL 2 HOURS")).alias("ts"),
            "user_id",
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    landed = ev.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).unionByName(sentinels)

    land_root = tempfile.mkdtemp(prefix="drain_attr_")
    land = land_root + "/events"
    t0 = time.time()
    landed.coalesce(8).write.mode("overwrite").parquet(land)
    t_land = round(time.time() - t0, 3)

    out = {"sf_dir": args.sf_dir, "reps": REPS, "land_sec": t_land}
    out["stateless"] = _timed_drain(
        spark, land, lambda s: s.filter(F.lit(False)), "attr_stateless"
    )
    out["state_noop"] = _timed_drain(spark, land, _noop_stateful, "attr_noop")
    out["full"] = _timed_drain(
        spark,
        land,
        lambda s: stateful_sessionize(s, gap_seconds=1800),
        "attr_full",
    )
    med = {k: statistics.median(out[k]) for k in ("stateless", "state_noop", "full")}
    out["median"] = med
    out["attribution"] = {
        "machinery_sec": med["stateless"],
        "stateful_plumbing_sec": round(med["state_noop"] - med["stateless"], 3),
        "fold_logic_sec": round(med["full"] - med["state_noop"], 3),
    }
    import shutil

    shutil.rmtree(land_root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
