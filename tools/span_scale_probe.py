"""Scale probe for the exact-substring dedup path (r11 verdict ask #5).

``duplicated_spans`` (operators/text.py) is the one [EXT] family whose
100 TB claim was still argued, not measured: the shuffle key is the
span STRING (~120 bytes) so a SQL oracle can replay it, and
``hash_spans=True`` swaps in 8-byte ``xxhash64`` keys for the real
scale path. This probe replicates the sf0.1 documents corpus K x
(K in {1, 10, 100} -> 5k/50k/500k docs) with the scale_probe.py
perturbation discipline — per-replica doc_id offsets plus a replica
suffix token, so middle spans repeat across replicas (boilerplate-heavy
worst case: every interior span's group grows with K) while tail spans
stay distinct — and measures, for BOTH key widths at each K:

- wall time (median of --runs noop-materialized runs after one untimed
  warm pass, the bench.py protocol);
- shuffle write bytes, from the Spark UI REST API (delta of completed
  stages' shuffleWriteBytes around the timed runs, divided by runs).

It also asserts hash-key/string-key result equality at K in {1, 10}
(collected and compared exactly — the hash path's contract), and
prints per-K row counts so a super-linear term cannot hide behind a
truncated corpus.

Usage: python tools/span_scale_probe.py [--ks 1,10,100] [--runs 3]
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
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STRIDE = 1_000_000_000


def _shuffle_write_bytes(spark) -> int:
    """Sum of shuffleWriteBytes over all completed stages so far (REST
    API — the only public surface that exposes task-metric rollups)."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--ks", default="1,10,100")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    ks = [int(k) for k in args.ks.split(",")]

    from pyspark.sql import functions as F

    from etl_project_gcp_spark.operators.text import duplicated_spans
    from etl_project_gcp_spark.session import get_spark

    spark = get_spark(
        app_name="span-scale-probe",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{args.base}/documents.parquet")
    root = tempfile.mkdtemp(prefix="span_scale_")
    out = {"base": args.base, "runs": args.runs, "ks": ks, "rows": {}}

    def _materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for k in ks:
        path = f"{root}/docs_x{k}"
        reps = [
            docs.select(
                (F.col("doc_id") + F.lit(i * STRIDE)).alias("doc_id"),
                # replica suffix token: interior spans repeat across
                # replicas (the boilerplate stress), the last window of
                # each doc stays replica-unique
                F.concat_ws(" ", F.col("text"), F.lit(f"rep{i}")).alias(
                    "text"
                ),
            )
            for i in range(k)
        ]
        corpus = reps[0]
        for r in reps[1:]:
            corpus = corpus.unionByName(r)
        corpus.repartition(32).write.mode("overwrite").parquet(path)
        scaled = spark.read.parquet(path)
        out["rows"][str(k)] = scaled.count()

        for hashed in (False, True):
            key = f"k{k}_{'hash' if hashed else 'str'}"
            plan = lambda: duplicated_spans(scaled, hash_spans=hashed)  # noqa: E731
            _materialize(plan())  # untimed warm pass
            walls = []
            sw0 = _shuffle_write_bytes(spark)
            for _ in range(args.runs):
                t0 = time.time()
                _materialize(plan())
                walls.append(round(time.time() - t0, 3))
            sw = _shuffle_write_bytes(spark) - sw0
            out[key] = {
                "wall": walls,
                "wall_median": round(statistics.median(walls), 3),
                "shuffle_write_bytes_per_run": sw // args.runs,
            }
            print(f"{key}: wall={walls} "
                  f"shuffle/run={sw // args.runs / 1e6:.1f} MB", flush=True)

        if k <= 10:
            a = {
                r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
                for r in duplicated_spans(scaled, hash_spans=False).collect()
            }
            b = {
                r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
                for r in duplicated_spans(scaled, hash_spans=True).collect()
            }
            assert a == b, f"hash/string results diverge at K={k}"
            out[f"k{k}_hash_equals_str"] = True
            print(f"K={k}: hash == string over {len(a)} docs", flush=True)

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
