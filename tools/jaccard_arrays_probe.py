"""A/B + equality gate for the array-intersect Jaccard verify
(jaccard_verify_arrays vs the exploded-row jaccard_verify), r15 verdict
ask #6.

Per rep (interleaved, one process): times the exploded and the array
formulation of the two call sites (minhash_near_duplicates /
ngram_jaccard_pairs shapes) noop-materialized, alternating order.
Before any timing, asserts BOTH formulations return the exact same
(a, b, jaccard) set on the probe corpus.

Usage: python tools/jaccard_arrays_probe.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_project_gcp_spark import queries as Q  # noqa: E402
from etl_project_gcp_spark.operators import dedup as DD  # noqa: E402
from etl_project_gcp_spark.session import get_spark  # noqa: E402


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def build(spark, sf_dir, shape, variant):
    docs = Q._t_wide(spark, sf_dir, "documents")
    if shape == "minhash":
        k, n_h, bands, thr = 5, 64, 16, 0.7
    else:  # ngram (k=3, 0.8)
        k, n_h, bands, thr = 3, 64, 16, 0.8
    sh_arrs = DD.shingle_arrays(docs, "doc_id", "text", k)
    sigs = DD.minhash_signatures(sh_arrs, "doc_id", n_h)
    cands = DD.lsh_candidate_pairs(sigs, "doc_id", bands, n_h // bands)
    if variant == "arrays":
        return DD.jaccard_verify_arrays(cands, sh_arrs, "doc_id", thr)
    shingled = sh_arrs.select(
        "doc_id", F.explode_outer(F.col("sh_arr")).alias("sh")
    ).repartition("doc_id")
    return DD.jaccard_verify(cands, shingled, "doc_id", thr)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    os.environ["ETL_GCP_SPARK_DISABLE_PINS"] = "1"
    spark = get_spark(app_name="jaccard_arrays_probe")
    Q.queries()["count_lineitem"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # equality gate first: exact (a, b, jaccard) set per shape
    for shape in ("minhash", "ngram"):
        old = {
            (r.a, r.b, round(r.jaccard, 12))
            for r in build(spark, sf_dir, shape, "rows").collect()
        }
        new = {
            (r.a, r.b, round(r.jaccard, 12))
            for r in build(spark, sf_dir, shape, "arrays").collect()
        }
        assert old == new, (
            f"{shape}: pair sets differ: only-old={old - new} "
            f"only-new={new - old}"
        )
        print(f"equality gate OK: {shape} ({len(old)} pairs)")

    times: dict[tuple[str, str], list[float]] = {}
    for rep in range(reps):
        variants = ["rows", "arrays"] if rep % 2 == 0 else ["arrays", "rows"]
        for shape in ("minhash", "ngram"):
            for variant in variants:
                t0 = time.time()
                materialize(build(spark, sf_dir, shape, variant))
                times.setdefault((shape, variant), []).append(
                    time.time() - t0
                )
    for shape in ("minhash", "ngram"):
        r = statistics.median(times[(shape, "rows")])
        a = statistics.median(times[(shape, "arrays")])
        print(
            f"{shape}: rows {r:.3f}s arrays {a:.3f}s  a/r {a / r:.2f}"
            f"  (n={reps})"
        )


if __name__ == "__main__":
    main()
