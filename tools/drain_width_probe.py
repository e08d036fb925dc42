"""Fresh-process width probe for the stateful Python drains
(streaming_sessionize_drain / streaming_forward_fill_drain), r16.

Each stateful shuffle partition carries a state store AND, for
applyInPandasWithState, forks a Python worker — so the drain's width
sets its cold worker fan-out exactly like a mapInPandas width does
(tools/cold_fanout_probe.py). The r12 in-process probe measured the
warm store term (~11 ms/partition/batch); this one measures the COLD
path the driver bench actually pays, one fresh process per variant.

Usage: python tools/drain_width_probe.py <entry> <width|base> [warm_runs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    entry = sys.argv[1]
    width = sys.argv[2]
    warm_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    os.environ["ETL_GCP_SPARK_DISABLE_PINS"] = "1"

    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.session import get_spark

    if width != "base":
        w = int(width)
        orig = Q._drain_stream_once

        def patched(spark, landed, plan_fn, sink_name,
                    stream_shuffle_partitions=None, output_mode="append"):
            return orig(
                spark, landed, plan_fn, sink_name,
                stream_shuffle_partitions=(
                    w if stream_shuffle_partitions is None
                    else stream_shuffle_partitions
                ),
                output_mode=output_mode,
            )

        Q._drain_stream_once = patched

    spark = get_spark(app_name=f"drain_width_{entry}_{width}")
    registry = Q.queries()
    registry["count_lineitem"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    # warm the STREAMING engine the way the bench sequence does (the
    # JVM-stateful rollup drain runs before the Python drains there),
    # so the timed cold run isolates the probed entry's own terms
    # (worker fan-out + state stores), not engine first-start
    registry["streaming_rollup_drain"](spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()

    t0 = time.time()
    registry[entry](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    cold = time.time() - t0
    warms = []
    for _ in range(warm_runs):
        t0 = time.time()
        registry[entry](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        warms.append(round(time.time() - t0, 3))
    print(json.dumps({
        "entry": entry, "width": width,
        "cold": round(cold, 3), "warm": warms,
    }))


if __name__ == "__main__":
    main()
