"""RocksDB vs default state store for the two remaining slow drains
(r12 verdict ask #6): ``streaming_sessionize_drain`` (~3.9 s warm
driver sitting) and ``streaming_interval_join_drain`` (~3.0 s). Their
residual cost is named as per-row state-store plumbing, structural for
the HDFS-backed provider (r11 rung ladder); this A/B quantifies whether
that named term MOVES under RocksDB at driver-gate scale — completing
the provider story whose 10x point (r8: RocksDB 1.2-1.4x slower while
state fits heap) and 100x point (r11: parity-to-13%-faster as state
outgrows heap maintenance) already exist for sessionize/forward-fill
but never covered the interval join or the gate-scale walls the bench
actually records.

Protocol: one session, STRICTLY INTERLEAVED reps (default, rocksdb,
default, rocksdb, ...) so box drift lands on both providers equally —
the paired-ratio discipline of NOTES r12. Each rep is a full entry run
(landing + drain + memory-sink collect — exactly what the bench
times). ``run_to_memory_sink`` re-reads ``$SPARK_GRAFT_STATE_STORE``
at every query start and every drain starts a fresh checkpoint, so
flipping the env between reps is a clean provider flip (asserted: the
provider class is read back from the session conf after each run).

Correctness stays gated under BOTH providers: each provider's first
result is value-compared against the entry's DuckDB oracle
(tests/oracle.py::compare), not just row-counted.

Usage: python tools/drain_provider_ab.py [--sf-dir ...] [--pairs 4]
Prints one JSON line; paste the table into NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("ETL_GCP_SPARK_DISABLE_PINS", "1")

ENTRIES = ("streaming_sessionize_drain", "streaming_interval_join_drain")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--oracle-sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--pairs", type=int, default=4)
    args = ap.parse_args()

    from bench import materialize as _noop
    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.session import get_spark
    from tests.oracle import compare

    spark = get_spark(app_name="drain-provider-ab")
    spark.sparkContext.setLogLevel("ERROR")

    qs = Q.queries()
    oracles = Q.oracle_sql()
    out = {
        "sf_dir": args.sf_dir,
        "pairs": args.pairs,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
    }

    def _run(entry_name: str, provider: str | None) -> float:
        if provider is None:
            os.environ.pop("SPARK_GRAFT_STATE_STORE", None)
            # the conf persists on the session from a prior rocksdb
            # run; reset it to Spark's default explicitly
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            os.environ["SPARK_GRAFT_STATE_STORE"] = provider
        t0 = time.perf_counter()
        _noop(qs[entry_name](spark, args.sf_dir))
        wall = time.perf_counter() - t0
        got = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass",
            "HDFSBackedStateStoreProvider",
        )
        want = "RocksDB" if provider == "rocksdb" else "HDFSBacked"
        assert want in got, f"provider flip failed: wanted {want}, conf={got}"
        return round(wall, 3)

    for entry in ENTRIES:
        # oracle gate under BOTH providers first (at the driver's
        # oracle SF — value compare, the real contract)
        for provider in (None, "rocksdb"):
            if provider is None:
                os.environ.pop("SPARK_GRAFT_STATE_STORE", None)
                spark.conf.unset(
                    "spark.sql.streaming.stateStore.providerClass"
                )
            else:
                os.environ["SPARK_GRAFT_STATE_STORE"] = provider
            compare(
                qs[entry](spark, args.oracle_sf_dir),
                oracles[entry],
                args.oracle_sf_dir,
            )
        out[f"{entry}_oracle_green_both"] = True
        print(f"{entry}: oracle green under default AND rocksdb",
              flush=True)

        # one untimed warm pass per provider, then interleaved pairs
        _run(entry, None)
        _run(entry, "rocksdb")
        default_walls, rocks_walls, ratios = [], [], []
        for _ in range(args.pairs):
            d = _run(entry, None)
            r = _run(entry, "rocksdb")
            default_walls.append(d)
            rocks_walls.append(r)
            ratios.append(round(r / d, 3))
        out[entry] = {
            "default_walls": default_walls,
            "rocksdb_walls": rocks_walls,
            "default_median": round(statistics.median(default_walls), 3),
            "rocksdb_median": round(statistics.median(rocks_walls), 3),
            "paired_ratio_median": round(statistics.median(ratios), 3),
            "paired_ratios": ratios,
        }
        print(f"{entry}: default={out[entry]['default_median']} "
              f"rocksdb={out[entry]['rocksdb_median']} "
              f"paired_ratio={out[entry]['paired_ratio_median']}",
              flush=True)

    os.environ.pop("SPARK_GRAFT_STATE_STORE", None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
