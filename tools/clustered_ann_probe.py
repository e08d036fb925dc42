"""Clustered-corpus ANN at scale (r11): the r11 pytest floors prove
recall on a CLUSTERED distribution at 2k vectors, and the r8 100x probe
proved wall-time at 200k vectors — but on the random near-orthogonal
corpus. This probe measures the combination a real training-data user
brings: a LARGE clustered corpus (mixture of Gaussians, Zipf cluster
sizes — topical web data) through the persisted-index lifecycle.

Corpus: N vectors in R^64 around C unit-sphere centers (C ~ sqrt(N),
the docstring's own n_lists guidance), noise norm 0.8 (the same
cluster-overlap regime the pytest floors pin at 2k — NOT the saturating
0.35), RandomState(11). Generated driver-side in numpy (64-dim doubles:
100k rows ~ 51 MB — fine), shipped once via Arrow.

Measured per quantizer (seed vs kmeans at build time):
  - index build wall (train + partitioned write)
  - search wall for a 20-query batch (fresh session-cache each run)
  - recall@10 vs brute force on the same corpus
at nprobe = 4 and 8 (4% / 8% of the 100 lists).

Usage: python tools/clustered_ann_probe.py [--n 100000] [--centers 100]
Prints a markdown table; paste into NOTES.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--centers", type=int, default=100)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    from pyspark.sql import functions as F

    from etl_project_gcp_spark.operators import vector as VX
    from etl_project_gcp_spark.session import get_spark

    spark = get_spark(app_name="clustered-ann-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.RandomState(11)
    C, d, n = args.centers, args.dim, args.n
    centers = rng.normal(size=(C, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    w = 1.0 / np.arange(1, C + 1)
    assign = rng.choice(C, size=n, p=w / w.sum())
    pts = centers[assign] + rng.normal(size=(n, d)) * (0.8 / np.sqrt(d))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)

    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [pts[i].astype("float32") for i in range(n)],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    root = tempfile.mkdtemp(prefix="clustered_ann_")
    corpus_path = f"{root}/corpus"
    spark.createDataFrame(tbl).repartition(32).write.parquet(corpus_path)
    emb = spark.read.parquet(corpus_path)
    q = emb.filter(F.col("vec_id") < args.queries)

    def recall(T_rows, A_rows):
        T, A = {}, {}
        for r in T_rows:
            T.setdefault(r.query_id, set()).add(r.neighbor_id)
        for r in A_rows:
            A.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(
            len(T[qq] & A.get(qq, set())) / len(T[qq]) for qq in T
        ) / len(T)

    t0 = time.time()
    truth = VX.brute_force_topk(emb, q, k=args.k).collect()
    t_bf = time.time() - t0

    print(
        f"\ncorpus: {n:,} x R^{d}, {C} Zipf clusters, noise 0.8; "
        f"{args.queries} queries, k={args.k}; brute force {t_bf:.1f}s"
    )
    print("\n| quantizer | nprobe | build (s) | search (s) | recall@10 |")
    print("|---|---|---|---|---|")
    for quant in ("seed", "kmeans"):
        path = f"{root}/ivf_{quant}"
        t0 = time.time()
        VX.ivf_build_index(emb, path, n_lists=C, quantizer=quant)
        t_build = time.time() - t0
        for nprobe in (4, 8):
            t0 = time.time()
            got = VX.ivf_search_index(
                spark, path, q, k=args.k, nprobe=nprobe
            ).collect()
            t_search = time.time() - t0
            print(
                f"| {quant} | {nprobe} | {t_build:.1f} | {t_search:.1f} "
                f"| {recall(truth, got):.3f} |",
                flush=True,
            )
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
