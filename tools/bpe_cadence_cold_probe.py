"""Driver-protocol (fresh JVM) A/B for the BPE checkpoint cadence
(r15 verdict ask #8): the r15 in-process probe read cadence 4 at 0.86×
cadence 1 on a noisy box but a wash on a quiet one; this probe times
the bpe_merges ENTRY (cold + warm) in a fresh process per invocation,
with the cadence monkeypatched, so the comparison runs under the same
cold-JVM protocol the driver bench pays.

Usage: python tools/bpe_cadence_cold_probe.py <cadence> [warm_runs]
Prints one JSON line. Interleave cadences across reps from a shell loop.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    cadence = int(sys.argv[1])
    warm_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ["ETL_GCP_SPARK_DISABLE_PINS"] = "1"

    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.operators import text as TX
    from etl_project_gcp_spark.session import get_spark

    orig = TX._bpe_distributed_rounds
    TX._bpe_distributed_rounds = functools.partial(
        orig, ckpt_cadence=cadence
    )

    spark = get_spark(app_name=f"bpe_cadence_cold_{cadence}")
    registry = Q.queries()
    registry["count_lineitem"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    t0 = time.time()
    registry["bpe_merges"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    cold = time.time() - t0
    warms = []
    for _ in range(warm_runs):
        t0 = time.time()
        registry["bpe_merges"](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        warms.append(round(time.time() - t0, 3))
    print(json.dumps({
        "cadence": cadence, "cold": round(cold, 3), "warm": warms,
    }))


if __name__ == "__main__":
    main()
