"""A/B: does eagerly materializing the shared subtrees of the LSH
candidate/verify pipeline (localCheckpoint) beat recomputing them per
join side at sf0.1?

Variants, interleaved in ONE process (reps alternate order):

  base      DD.lsh_candidate_pairs + DD.jaccard_verify as shipped
            (sized subtree computed twice, shingled thrice)
  ckpt      same logic with sized.localCheckpoint() and
            shingled.localCheckpoint() shared across consumers

Both are materialized through the noop sink; the probe also asserts the
two pair sets are identical (collect + compare) once up front.

Usage: python tools/ckpt_ab_probe.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_project_gcp_spark import queries as Q  # noqa: E402
from etl_project_gcp_spark.operators import dedup as DD  # noqa: E402
from etl_project_gcp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def candidates_ckpt(signatures, id_col="doc_id", bands=16, rows_per_band=4,
                    max_bucket=1000):
    stacked = DD._stack_bands(signatures, id_col, bands, rows_per_band)
    sized = (
        stacked.withColumn(
            "_bsz", F.count(F.lit(1)).over(W.partitionBy("band", "bh"))
        )
        .filter(F.col("_bsz") <= max_bucket)
        .localCheckpoint()
    )
    a = sized.select(F.col("band"), F.col("bh"), F.col(id_col).alias("a"))
    b = sized.select(F.col("band"), F.col("bh"), F.col(id_col).alias("b"))
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def verify_ckpt(candidates, shingled, id_col="doc_id", threshold=0.7):
    shingled = shingled.localCheckpoint()
    return DD.jaccard_verify(candidates, shingled, id_col, threshold)


def minhash_base(docs):
    sh = DD.shingle_arrays(docs, k=5)
    sigs = DD.minhash_signatures(sh)
    cands = DD.lsh_candidate_pairs(sigs)
    return DD.jaccard_verify(cands, DD.shingle_docs(docs, k=5))


def minhash_ckpt(docs):
    sh = DD.shingle_arrays(docs, k=5)
    sigs = DD.minhash_signatures(sh)
    cands = candidates_ckpt(sigs)
    return verify_ckpt(cands, DD.shingle_docs(docs, k=5))


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    os.environ["ETL_GCP_SPARK_DISABLE_PINS"] = "1"
    spark = get_spark(app_name="ckpt_ab_probe")
    docs = Q._t(spark, SF_DIR, "documents")

    # equality gate first
    base_rows = sorted(
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in minhash_base(docs).collect()
    )
    ckpt_rows = sorted(
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in minhash_ckpt(docs).collect()
    )
    assert base_rows == ckpt_rows, "variant changes the pair set!"
    print(f"equality gate: {len(base_rows)} pairs identical", flush=True)

    variants = {"base": minhash_base, "ckpt": minhash_ckpt}
    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(reps):
        names = list(variants) if rep % 2 == 0 else list(variants)[::-1]
        for name in names:
            t0 = time.time()
            materialize(variants[name](docs))
            times[name].append(time.time() - t0)
        print(f"rep {rep} done", flush=True)
    for name, ts in times.items():
        print(
            f"{name}: median {statistics.median(ts):.3f}  "
            f"{[round(t, 2) for t in ts]}"
        )


if __name__ == "__main__":
    main()
