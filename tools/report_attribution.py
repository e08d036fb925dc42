"""Attribute the three remaining multi-second warm registry entries that
have never had a rung attribution: ann_recall_report (~3.6 s),
simhash_quality_report (~3.4 s), dedup_pipeline (~3.3 s). The r11/r12
drain attributions both converted a "structural, by design" presumption
into either a real fix (interval-join input pruning, 15%) or a named
structural term with numbers; these three are the last entries above
3 s warm carrying only prose explanations (r5-era measurements, since
re-tuned). The rung method here is per-component timing inside ONE warm
session, matching how bench.py times entries (noop materialization,
ETL_GCP_SPARK_DISABLE_PINS=1, 1 untimed warm pass + median of REPS).

Rung design per entry:

ann_recall_report — the entry is a thread-pool MAX over 7 search paths
  + a pixel gate, so the attribution is each path timed ALONE (warm
  medians), then the threaded ensemble, then the full entry. The
  critical path (the max rung) is where any future optimization must
  land; every other path is hidden behind it.

simhash_quality_report — two pipelines threaded: simhash pair set vs
  minhash (exact-Jaccard) pair set. Rungs: each pipeline alone, the
  threaded pair, the full entry. The max pipeline is the wall.

dedup_pipeline — sequential composition, so cumulative rungs:
  scan (docs noop) -> exact canonicalization -> canon persist+join ->
  LSH candidates over canon -> full pipeline (+verify). Adjacent-rung
  deltas attribute each stage. clearCache() between reps so the
  pipeline's internal persist cannot leak across reps.

Usage: python tools/report_attribution.py [--sf-dir ...] [--entries ...]
Prints one JSON line; paste the tables into NOTES.md.
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

REPS = int(os.environ.get("REPORT_ATTR_REPS", "3"))

# the bench's own materializer, imported so the rungs time the exact
# sink the bench times — a bench-side sink change cannot silently
# desynchronize the attribution method from the numbers it explains
from bench import materialize as _noop  # noqa: E402


def _timed(spark, build, *, reps: int = REPS, warmup: bool = True,
           action=_noop) -> list[float]:
    """1 untimed warm pass + `reps` timed runs of action(build()).
    clearCache between timed reps so operator-internal persists (e.g.
    near_dup_pipeline's canon persist) cannot make rep 2+ a cache read."""
    if warmup:
        action(build())
        spark.catalog.clearCache()
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        action(build())
        out.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    return out


def _attr_ann(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.operators import vector as VX

    emb = Q._t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") < 5)
    # warm the on-disk caches exactly like the entry's steady state
    path = Q._ivf_index_ensure(emb, sf_dir, n_lists=16)
    cents = Q._kmeans_centroids_ensure(spark, emb, sf_dir, n_lists=16)
    emb_c = emb.localCheckpoint()
    qv_c = qv.localCheckpoint()

    paths = {
        "truth": lambda: VX.brute_force_topk(emb_c, qv_c, k=10),
        "lsh": lambda: VX.lsh_topk(emb_c, qv_c, k=10),
        "ivf": lambda: VX.ivf_topk(emb_c, qv_c, k=10),
        "ivf_kmeans": lambda: VX.ivf_topk(
            emb_c, qv_c, k=10, quantizer="kmeans", centroids=cents
        ),
        "int8": lambda: VX.quantized_topk(emb_c, qv_c, k=10),
        "two_stage": lambda: VX.two_stage_topk(emb_c, qv_c, k=10),
        "ivf_index": lambda: VX.ivf_search_index(spark, path, qv_c, k=10),
    }
    res = {}
    collect = lambda df: df.select("query_id", "neighbor_id").collect()  # noqa: E731
    for name, build in paths.items():
        res[name] = _timed(spark, build, action=collect)

    def _ensemble():
        return VX.recall_report(
            emb, qv, k=10, index_path=path, kmeans_centroids=cents
        )
    res["threaded_ensemble"] = _timed(
        spark, _ensemble, action=lambda df: df.collect()
    )
    entry = Q.queries()["ann_recall_report"]
    res["full_entry"] = _timed(
        spark, lambda: entry(spark, sf_dir), action=_noop
    )
    med = {k: statistics.median(v) for k, v in res.items()}
    slowest = max(
        (k for k in paths), key=lambda k: med[k]
    )
    return {
        "runs": res,
        "median": med,
        "critical_path": slowest,
        "interleave_gain_sec": round(
            sum(med[k] for k in paths) - med["threaded_ensemble"], 3
        ),
    }


def _attr_simhash(spark, sf_dir: str) -> dict:
    from concurrent.futures import ThreadPoolExecutor

    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.operators import dedup as DD

    docs = Q._t(spark, sf_dir, "documents")
    collect = lambda df: df.select("a", "b").collect()  # noqa: E731

    res = {
        "simhash_only": _timed(
            spark, lambda: DD.simhash_near_duplicates(docs), action=collect
        ),
        "minhash_only": _timed(
            spark, lambda: DD.minhash_near_duplicates(docs), action=collect
        ),
    }

    def _both():
        with ThreadPoolExecutor(2) as ex:
            fs = [
                ex.submit(collect, DD.simhash_near_duplicates(docs)),
                ex.submit(collect, DD.minhash_near_duplicates(docs)),
            ]
            return [f.result() for f in fs]
    res["threaded_pair"] = _timed(
        spark, _both, action=lambda _: None
    )
    entry = Q.queries()["simhash_quality_report"]
    res["full_entry"] = _timed(
        spark, lambda: entry(spark, sf_dir), action=_noop
    )
    med = {k: statistics.median(v) for k, v in res.items()}
    return {
        "runs": res,
        "median": med,
        "interleave_gain_sec": round(
            med["simhash_only"] + med["minhash_only"] - med["threaded_pair"],
            3,
        ),
    }


def _attr_pipeline(spark, sf_dir: str) -> dict:
    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.operators import dedup as DD

    docs = Q._t(spark, sf_dir, "documents")

    def _canon_docs():
        canon_ids = DD.exact_dedup(docs).select("doc_id")
        return docs.join(canon_ids, "doc_id")

    def _cands():
        canon = _canon_docs().persist()
        canon.count()
        sigs = DD.minhash_signatures(DD.shingle_arrays(canon))
        return DD.lsh_candidate_pairs(sigs)

    res = {
        "scan": _timed(spark, lambda: docs),
        "exact_canon": _timed(spark, lambda: DD.exact_dedup(docs)),
        "canon_join_persist": _timed(
            spark, _canon_docs,
            action=lambda df: (df.persist(), df.count()) and None,
        ),
        "lsh_candidates": _timed(spark, _cands),
        "full_pipeline": _timed(
            spark, lambda: DD.near_dup_pipeline(docs)
        ),
    }
    med = {k: statistics.median(v) for k, v in res.items()}
    return {
        "runs": res,
        "median": med,
        "attribution": {
            "scan_sec": med["scan"],
            "exact_dedup_sec": round(med["exact_canon"] - med["scan"], 3),
            "canon_materialize_sec": round(
                med["canon_join_persist"] - med["exact_canon"], 3
            ),
            "lsh_candidates_sec": round(
                med["lsh_candidates"] - med["canon_join_persist"], 3
            ),
            "jaccard_verify_sec": round(
                med["full_pipeline"] - med["lsh_candidates"], 3
            ),
        },
    }


def _attr_cands(spark, sf_dir: str) -> dict:
    """Sub-attribute the LSH-candidates stage (the 2.85 s hot spot the
    `pipeline` attribution found): tokenize+hash -> shingles -> 64-seed
    minhash folds -> banding -> skew-guard window -> self-join+distinct,
    each rung cumulative over the previous (noop-materialized)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.operators import dedup as DD

    docs = Q._t(spark, sf_dir, "documents")

    def _tok():
        return docs.select(
            "doc_id",
            F.transform(
                DD._clean_tokens("text"), lambda t: F.xxhash64(t)
            ).alias("th"),
        )

    def _sh():
        return DD.shingle_arrays(docs)

    def _sigs():
        return DD.minhash_signatures(DD.shingle_arrays(docs))

    def _banded():
        return DD._stack_bands(
            DD.minhash_signatures(DD.shingle_arrays(docs)), "doc_id", 16, 4
        )

    def _skew():
        return _banded().withColumn(
            "_bsz", F.count(F.lit(1)).over(W.partitionBy("band", "bh"))
        ).filter(F.col("_bsz") <= 1000)

    def _cands():
        return DD.lsh_candidate_pairs(
            DD.minhash_signatures(DD.shingle_arrays(docs))
        )

    res = {
        "tok_hash": _timed(spark, _tok),
        "shingles": _timed(spark, _sh),
        "signatures": _timed(spark, _sigs),
        "banded": _timed(spark, _banded),
        "skew_window": _timed(spark, _skew),
        "cands_join": _timed(spark, _cands),
    }
    med = {k: statistics.median(v) for k, v in res.items()}
    order = ["tok_hash", "shingles", "signatures", "banded",
             "skew_window", "cands_join"]
    deltas = {"tok_hash_sec": med["tok_hash"]}
    for prev, cur in zip(order, order[1:]):
        deltas[f"{cur}_delta_sec"] = round(med[cur] - med[prev], 3)
    return {"runs": res, "median": med, "attribution": deltas}


def _attr_incr(spark, sf_dir: str) -> dict:
    """Rungs for dedup_incremental_near (delta = doc_id%10==3, corpus =
    the rest): delta-side prep, corpus-side prep (expected dominant —
    it's 90% of docs and pays the 64-seed folds), the delta x corpus
    band join, then the full screen (+cross-side verify + summary)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.operators import dedup as DD

    docs = Q._t(spark, sf_dir, "documents")
    delta = docs.filter(F.col("doc_id") % 10 == 3)
    corpus = docs.filter(F.col("doc_id") % 10 != 3)

    def _prep(side):
        return DD._stack_bands(
            DD.minhash_signatures(DD.shingle_arrays(side)), "doc_id", 16, 4
        )

    def _cands():
        d_band = _prep(delta).select(
            F.col("doc_id").alias("a"), "band", "bh"
        )
        c_sized = _prep(corpus).withColumn(
            "_bsz", F.count(F.lit(1)).over(W.partitionBy("band", "bh"))
        ).filter(F.col("_bsz") <= 1000)
        return (
            d_band.join(
                c_sized.select(F.col("doc_id").alias("b"), "band", "bh"),
                ["band", "bh"],
            ).select("a", "b").distinct()
        )

    res = {
        "delta_prep": _timed(spark, lambda: _prep(delta)),
        "corpus_prep": _timed(spark, lambda: _prep(corpus)),
        "cands_join": _timed(spark, _cands),
        "full_screen": _timed(
            spark, lambda: DD.incremental_near_dedup(delta, corpus)
        ),
    }
    med = {k: statistics.median(v) for k, v in res.items()}
    return {
        "runs": res,
        "median": med,
        "attribution": {
            "delta_prep_sec": med["delta_prep"],
            "corpus_prep_sec": med["corpus_prep"],
            # the cands rung's plan CONTAINS both preps (they are its
            # inputs, recomputed in-plan), so the join's own cost is
            # cands minus BOTH — approximate, since the shared docs
            # scan overlaps
            "band_join_delta_sec": round(
                med["cands_join"] - med["corpus_prep"] - med["delta_prep"],
                3,
            ),
            "verify_summary_delta_sec": round(
                med["full_screen"] - med["cands_join"], 3
            ),
        },
    }


def _attr_cluster(spark, sf_dir: str) -> dict:
    """Rungs for dedup_cluster_canonical: near-dup pairs (the measured
    dedup_pipeline cost), + connected components over those pairs,
    + the full entry (CC + keeper window + singleton re-attach)."""
    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.operators import dedup as DD

    docs = Q._t(spark, sf_dir, "documents")

    def _cc():
        pairs = DD.near_dup_pipeline(docs).select("a", "b")
        return DD.connected_components(pairs)

    entry = Q.queries()["dedup_cluster_canonical"]
    res = {
        "pairs": _timed(spark, lambda: DD.near_dup_pipeline(docs)),
        "pairs_cc": _timed(spark, _cc),
        "full_entry": _timed(spark, lambda: entry(spark, sf_dir)),
    }
    med = {k: statistics.median(v) for k, v in res.items()}
    return {
        "runs": res,
        "median": med,
        "attribution": {
            "pairs_sec": med["pairs"],
            "cc_delta_sec": round(med["pairs_cc"] - med["pairs"], 3),
            "canonical_window_delta_sec": round(
                med["full_entry"] - med["pairs_cc"], 3
            ),
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--entries", nargs="*",
        default=["ann", "simhash", "pipeline"],
        choices=["ann", "simhash", "pipeline", "cands", "incr", "cluster"],
    )
    args = ap.parse_args()

    from etl_project_gcp_spark.session import get_spark

    spark = get_spark(app_name="report-attribution")
    spark.sparkContext.setLogLevel("ERROR")

    out = {
        "sf_dir": args.sf_dir,
        "reps": REPS,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
    }
    fns = {"ann": _attr_ann, "simhash": _attr_simhash,
           "pipeline": _attr_pipeline, "cands": _attr_cands,
           "incr": _attr_incr, "cluster": _attr_cluster}
    for key in args.entries:
        out[key] = fns[key](spark, args.sf_dir)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
