"""100x stateful-drain probe: sessionize + forward-fill at 100x the
sf0.1 event volume (10M events), default state store vs RocksDB
(r8 verdict ask #5 — the r7 100x ladder's state-growth rows predate
the provider knob; the r8 10x probe had the knob but not the scale).

Per (drain, provider) the probe runs in a FRESH process (subprocess
fan-out from --all): one cold drain + one warm re-drain (new
checkpoint, same JVM), each through a noop sink (the memory sink
would pull the forward-fill's 10M output rows into the driver — the
probe measures the operator, not a collect). Wall time plus the
state operator's own metrics (numRowsTotal, memoryUsedBytes, and the
RocksDB customMetrics when present) come from the query's
lastProgress, so "state-store size" is the engine's number, not a du
over a temp dir.

Usage:
    python tools/drain_state_probe.py --build            # once
    python tools/drain_state_probe.py --all              # both x both
    python tools/drain_state_probe.py --drain sessionize --provider rocksdb
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STRIDE = 1_000_000_000
DEFAULT_DIR = "/tmp/events100"
BASE = "/root/testdata/sf0.1/events.parquet"


def _session(shuffle: int = 32):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32")
        )
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )


def build(out: str, k: int) -> None:
    """Replicate the sf0.1 events k x with per-replica key offsets —
    user_id cardinality grows k x too, so per-key state stores see a
    genuinely wider key space, not k x hotter keys."""
    from pyspark.sql import functions as F

    spark = _session()
    ev = spark.read.parquet(BASE)
    reps = spark.range(k).withColumnRenamed("id", "rep")
    big = (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * STRIDE).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * STRIDE).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
    )
    big.repartition(32).write.mode("overwrite").parquet(out)
    print(f"built {out}: {spark.read.parquet(out).count()} events")
    spark.stop()


def run_one(events_dir: str, drain: str, provider: str) -> None:
    if provider == "rocksdb":
        os.environ["SPARK_GRAFT_STATE_STORE"] = "rocksdb"
    else:
        os.environ.pop("SPARK_GRAFT_STATE_STORE", None)
    from etl_project_gcp_spark.streaming.streams import (
        apply_state_store_conf,
        read_event_stream,
        stateful_sessionize,
        streaming_forward_fill,
    )

    spark = _session()
    apply_state_store_conf(spark)

    def one_drain(tag: str) -> dict:
        stream = read_event_stream(spark, events_dir)
        if drain == "sessionize":
            plan = stateful_sessionize(stream, gap_seconds=1800)
        elif drain == "forward_fill":
            plan = streaming_forward_fill(stream, observe_type="purchase")
        else:
            raise SystemExit(f"unknown drain {drain}")
        ckpt = tempfile.mkdtemp(prefix=f"probe_{drain}_{provider}_{tag}_")
        t0 = time.time()
        q = (
            plan.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(1200):
            q.stop()
            raise SystemExit(f"{drain}/{provider}: drain exceeded 1200 s")
        wall = time.time() - t0
        progress = [p for p in q.recentProgress if p.get("stateOperators")]
        ops = progress[-1]["stateOperators"][0] if progress else {}
        custom = ops.get("customMetrics", {}) or {}
        return {
            "wall_sec": round(wall, 1),
            "state_rows": ops.get("numRowsTotal"),
            "state_memory_bytes": ops.get("memoryUsedBytes"),
            "rocksdb_sst_bytes": custom.get("rocksdbSstFileSize"),
            "rocksdb_total_mem_bytes": custom.get(
                "rocksdbTotalMemoryUsageBytes"
            ),
            "output_rows": progress[-1].get("sink", {}).get("numOutputRows")
            if progress
            else None,
        }

    runs = int(os.environ.get("PROBE_RUNS", "2"))
    cold = one_drain("cold")
    warm = one_drain("warm") if runs > 1 else None
    print(
        "PROBE "
        + json.dumps(
            {"drain": drain, "provider": provider, "cold": cold, "warm": warm}
        )
    )
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--events-dir", default=DEFAULT_DIR)
    ap.add_argument("--drain", choices=["sessionize", "forward_fill"])
    ap.add_argument("--provider", choices=["default", "rocksdb"],
                    default="default")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()
    if args.build:
        build(args.events_dir, args.k)
        return 0
    if args.all:
        for drain in ("sessionize", "forward_fill"):
            for provider in ("default", "rocksdb"):
                try:
                    r = subprocess.run(
                        [
                            sys.executable, os.path.abspath(__file__),
                            "--events-dir", args.events_dir,
                            "--drain", drain, "--provider", provider,
                        ],
                        capture_output=True, text=True, timeout=3600,
                    )
                except subprocess.TimeoutExpired:
                    # one wedged combo must not abort the sweep — the
                    # remaining (drain, provider) results still matter
                    print(f"FAILED {drain}/{provider}: timeout after 3600s")
                    continue
                for line in r.stdout.splitlines():
                    if line.startswith("PROBE "):
                        print(line)
                if r.returncode != 0:
                    print(f"FAILED {drain}/{provider}:", r.stderr[-2000:])
        return 0
    if not args.drain:
        ap.error("--drain required (or --build / --all)")
    run_one(args.events_dir, args.drain, args.provider)
    return 0


if __name__ == "__main__":
    sys.exit(main())
