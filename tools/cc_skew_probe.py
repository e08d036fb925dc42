"""Distributed CC under pathological SKEW (r11): every prior CC probe
(ladder, mega) used uniform components, but the operator's shuffles have
two hot-key exposures a real dedup graph hits:

  1. the per-round propagation join keys on the NODE id — a high-degree
     hub (one document near-duplicating millions) puts its id in
     millions of edge rows, so one join partition carries the hub;
  2. the adaptive pointer-shortcut self-join keys on CLUSTER_ID — once
     a giant component converges toward one label, that label is a hot
     key holding the whole component's rows.

Graph (deterministic, closed-form truth, no reference algorithm):
  - a STAR: center 0, spokes 1..S (hub degree S; truth: all label 0)
  - a 121-hop CHAIN hung off the center (diameter >> shortcut_after,
    so the skewed shortcut rounds actually run; truth: label 0)
  - uniform background 4-cliques (the mega-probe construction; truth:
    each group's min node) — keeps the graph from being ONLY the hub

The probe runs the distributed path twice — AQE skew-join ON (the
engine session default) and OFF — and reports wall/rounds for both,
asserting exact labels each time. The ON/OFF delta is the measured
value of the mitigation the session config claims.

Usage:
    python tools/cc_skew_probe.py [--spokes 10000000] [--groups 2500000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHAIN = 121


def build_graph(spark, spokes: int, groups: int, gs: int):
    from pyspark.sql import functions as F

    star = spark.range(1, spokes + 1).select(
        F.lit(0).cast("long").alias("a"), F.col("id").alias("b")
    )
    c0 = spokes + 1
    chain = spark.range(CHAIN).select(
        (F.col("id") + c0 - 1).alias("a"), (F.col("id") + c0).alias("b")
    ).withColumn(
        "a", F.when(F.col("a") == c0 - 1, F.lit(0)).otherwise(F.col("a"))
    )
    base = spokes + CHAIN + 100
    n_spine = groups * (gs - 1)
    cliques = spark.range(n_spine).select(
        (
            (F.col("id") / (gs - 1)).cast("long") * gs
            + F.col("id") % (gs - 1)
            + base
        ).alias("a"),
    ).withColumn("b", F.col("a") + 1)
    return star.unionByName(chain).unionByName(cliques), base


def run_once(spark, pairs, base, gs, skew_on: bool):
    from pyspark.sql import functions as F

    from etl_project_gcp_spark.operators import dedup as DD

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    stats: dict = {}
    t0 = time.time()
    labels = DD.connected_components(pairs, small_graph_threshold=0, stats=stats)
    labels.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    # closed-form truth: nodes < base are the star+chain component
    # (label 0); group nodes label to their group's first node
    n_wrong = labels.filter(
        F.col("cluster_id")
        != F.when(F.col("node") < base, F.lit(0)).otherwise(
            ((F.col("node") - base) / gs).cast("long") * gs + base
        )
    ).count()
    return wall, stats, n_wrong


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spokes", type=int, default=10_000_000)
    ap.add_argument("--groups", type=int, default=2_500_000)
    ap.add_argument("--group-size", type=int, default=4)
    args = ap.parse_args()

    from etl_project_gcp_spark.session import get_spark

    spark = get_spark(app_name="cc-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    pairs, base = build_graph(spark, args.spokes, args.groups, args.group_size)

    print(
        f"\n| variant | hub degree | sym edges | rounds | wall (s) "
        f"| labels exact |"
    )
    print("|---|---|---|---|---|---|")
    rc = 0
    # two reps per variant, interleaved, so neither variant owns the
    # cold-JVM rep (the tiny smoke run showed ~2x first-run warmup)
    for rep in (1, 2):
        for skew_on in (True, False):
            wall, stats, n_wrong = run_once(
                spark, pairs, base, args.group_size, skew_on
            )
            ok = n_wrong == 0
            rc |= 0 if ok else 1
            print(
                f"| AQE skew-join {'ON' if skew_on else 'OFF'} (rep {rep}) "
                f"| {args.spokes:,} | {stats['edges']:,} "
                f"| {stats['rounds']} | {wall:.0f} "
                f"| {'yes' if ok else f'NO (wrong={n_wrong})'} |",
                flush=True,
            )
    return rc


if __name__ == "__main__":
    sys.exit(main())
