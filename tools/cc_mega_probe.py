"""Distributed CC stress beyond the ladder corpora: a synthetic graph
with PROVABLE component structure, at edge counts no local corpus
produces (default 200M edges / 100M nodes — ~4x the 100x ladder's
54M-edge minhash graph).

Construction (fully deterministic, no datagen dependency): nodes are
partitioned into groups of ``group_size``; every group gets a spine
(j, j+1 chain — guarantees connectivity, diameter = group_size-1) plus
hash-derived extra in-group edges up to the edge budget. Ground truth
is therefore exact WITHOUT running a reference algorithm: components =
groups, every node's cluster_id = its group's first node. The probe
asserts that at full scale (distinct-cluster count + exact label check
on a deterministic node sample) and records rounds/wall — the
distributed path's behavior at a scale where the driver union-find
(toLocalIterator over the edge list) would take over an hour.

Usage:
    SPARK_DRIVER_MEMORY=48g python tools/cc_mega_probe.py \
        [--groups 25000000] [--group-size 4] [--edges 200000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=25_000_000)
    ap.add_argument("--group-size", type=int, default=4)
    ap.add_argument("--edges", type=int, default=200_000_000)
    # r10 verdict ask #6: name the knob behind the 12x-per-10x-edges
    # wall curve — sweep this at fixed graph size to see whether the
    # 250M-edge run is partition-starved or genuinely IO-bound
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_project_gcp_spark.operators import dedup as DD
    from etl_project_gcp_spark.session import get_spark

    spark = get_spark(
        app_name="cc-mega-probe", shuffle_partitions=args.shuffle_partitions
    )
    spark.sparkContext.setLogLevel("ERROR")

    g, gs = args.groups, args.group_size
    n_spine = g * (gs - 1)
    n_extra = max(0, args.edges - n_spine)
    # spine: (base+j, base+j+1) for each group — connectivity proof
    spine = spark.range(n_spine).select(
        (
            (F.col("id") / (gs - 1)).cast("long") * gs
            + F.col("id") % (gs - 1)
        ).alias("a"),
    ).withColumn("b", F.col("a") + 1)
    # extras: hash-pick two in-group nodes (may duplicate spine edges
    # or self-loop — both are legal inputs the operator dedupes)
    extra = spark.range(n_extra).select(
        (
            (F.col("id") % g) * gs + F.pmod(F.xxhash64("id"), F.lit(gs))
        ).alias("a"),
        (
            (F.col("id") % g) * gs
            + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(gs))
        ).alias("b"),
    )
    pairs = spine.unionByName(extra)

    stats: dict = {}
    t0 = time.time()
    labels = DD.connected_components(
        pairs, small_graph_threshold=0, stats=stats
    )
    labels.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    t0 = time.time()
    n_nodes = labels.count()
    n_clusters = labels.select("cluster_id").distinct().count()
    # exact ground truth: node n belongs to group n//gs, whose min
    # node (the expected label) is (n//gs)*gs
    n_wrong = labels.filter(
        F.col("cluster_id")
        != (F.col("node") / gs).cast("long") * gs
    ).count()
    check_wall = time.time() - t0

    sp = spark.conf.get("spark.sql.shuffle.partitions")
    print(f"\n| graph | sym edges | nodes | clusters | rounds "
          f"| shuffle parts | distributed (s) | labels exact |")
    print("|---|---|---|---|---|---|---|---|")
    ok = (n_clusters == g and n_nodes == g * gs and n_wrong == 0)
    print(f"| synthetic {gs}-cliques | {stats['edges']:,} | {n_nodes:,} "
          f"| {n_clusters:,} | {stats['rounds']} | {sp} | {wall:.0f} "
          f"| {'yes' if ok else f'NO (wrong={n_wrong})'} |")
    print(f"(ground-truth verification itself: {check_wall:.0f}s)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
