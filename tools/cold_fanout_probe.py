"""Fresh-process probe for the cold Python-worker fan-out storm
(r15 verdict ask #1 / #5): time ONE registry entry cold + warm in a
brand-new JVM + worker pool, under a variant that controls how many
Python workers the entry's first stage forks.

Each invocation is one process = one measurement (the storm only exists
while the worker pool is cold, so in-process interleaved A/B cannot see
it). An outer shell loop interleaves variants across reps.

Variants:
  base        current tree, untouched
  w<N>        cap the _t_wide rebalance width at N (monkeypatched)
  preload     base width + spark.python.daemon.module=etl_project_gcp_spark.pydaemon
  w<N>+preload  both

Usage: python tools/cold_fanout_probe.py <entry> <variant> [warm_runs]
Prints one JSON line: {"entry":..., "variant":..., "cold":s, "warm":[s,...]}
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
    variant = sys.argv[2]
    warm_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    os.environ["ETL_GCP_SPARK_DISABLE_PINS"] = "1"

    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.session import get_spark

    extra = {}
    width_cap = None
    # the preloading daemon AND the background pool prewarm are ON by
    # default in local sessions now; "base" must force both off to
    # stay the A/B control ("preload" re-enables the daemon only,
    # "prewarm" the background pool prewarm only)
    os.environ["SPARK_GRAFT_PYDAEMON"] = "0"
    os.environ["SPARK_GRAFT_PREWARM"] = "0"
    for part in variant.split("+"):
        if part == "base":
            pass
        elif part == "preload":
            os.environ["SPARK_GRAFT_PYDAEMON"] = "1"
        elif part == "prewarm":
            os.environ["SPARK_GRAFT_PREWARM"] = "1"
            os.environ["SPARK_GRAFT_PYDAEMON"] = "1"
        elif part == "warmpool":
            pass  # handled after session build
        elif part.startswith("w"):
            width_cap = int(part[1:])
        else:
            raise SystemExit(f"unknown variant part: {part}")

    if width_cap is not None:
        orig = Q._coarse_rebalance

        def capped(spark, df, sf_dir, name, **kw):
            out = orig(spark, df, sf_dir, name, **kw)
            if out is not df:  # rebalance fired: re-cap its width
                out = df.repartition(width_cap)
            return out

        Q._coarse_rebalance = capped

    spark = get_spark(app_name=f"cold_fanout_{entry}_{variant}",
                      extra_conf=extra or None)
    registry = Q.queries()
    # JVM warmup WITHOUT touching Python workers (pure-JVM entry), so
    # the Python pool is still stone cold when the probed entry runs —
    # same condition as the driver bench hitting its first wide
    # Python stage.
    registry["count_lineitem"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    if "warmpool" in variant.split("+"):
        # fork + import-warm one Python worker per core BEFORE timing:
        # isolates how much of "cold" is worker startup vs query work
        def _noop_batches(batches):
            for b in batches:
                yield b

        width = spark.sparkContext.defaultParallelism
        spark.range(0, width, 1, width).mapInPandas(
            _noop_batches, "id long"
        ).write.format("noop").mode("overwrite").save()

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
        "entry": entry, "variant": variant,
        "cold": round(cold, 3), "warm": warms,
    }))


if __name__ == "__main__":
    main()
