"""A/B per-side norm hoisting in the ANN scored paths — measurement only.

The pair-scoring selects call ``cosine(qv, cv)`` (or the int8 twin's
self-dots), whose ``_norm``/self-dot folds are interpreted higher-order
aggregates over the vector. Evaluated inside the per-PAIR projection,
each pair pays three d-length folds (dot + both norms) even though the
norms depend on one side only. The candidates hoist the norms into the
per-SIDE projections: per pair work drops to the single dot fold, and
each side's norm is computed once per row.

Bit-exactness: the hoisted column holds the SAME subexpression
(``_norm(v)`` double, or the exact-integer int8 self-dot) and the final
score expression keeps the IDENTICAL operator tree and association
order — staging a subexpression as a column does not change its value.
Every variant is equality-gated on full collected rows (double bits
included) before any timing is reported.

Usage: python tools/norm_hoist_probe.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window as W, functions as F  # noqa: E402

from etl_project_gcp_spark import queries as Q  # noqa: E402
from etl_project_gcp_spark.operators import vector as VX  # noqa: E402
from etl_project_gcp_spark.operators.vector import (  # noqa: E402
    _as_double,
    _bucket_all_tables,
    _dot,
    _norm,
    quantize_embeddings,
)
from etl_project_gcp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def brute_force_topk_staged(corpus, queries, k=10, id_col="vec_id",
                            vec_col="embedding", round_scores=6):
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    # The null filter moves ABOVE the window: predicates not on the
    # window partition key cannot push through it, so the score is
    # never substituted into the join condition (where the pre-window
    # isNotNull form evaluates the interpreted dot fold twice per
    # pair, and a != form pushes an inferred isnotnull into the scan
    # with the staged expression re-inlined). Under desc NULLS LAST,
    # nulls rank strictly after every non-null, so rank-then-drop
    # emits the identical rows with identical rk values.
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / F.nullif(F.col("qn") * F.col("cn"), F.lit(0.0)),
                round_scores,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .filter(F.col("cosine").isNotNull())
    )


def lsh_topk_staged(corpus, queries, k=10, id_col="vec_id",
                    vec_col="embedding", planes=5, tables=10):
    cb = _bucket_all_tables(corpus, id_col, "neighbor_id", vec_col, planes, tables)
    qb = _bucket_all_tables(queries, id_col, "query_id", vec_col, planes, tables)
    cands = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .select("query_id", "neighbor_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).withColumn("cn", _norm(F.col("cv")))
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / F.nullif(F.col("qn") * F.col("cn"), F.lit(0.0)),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .filter(F.col("cosine").isNotNull())
    )


def ivf_assign_staged(corpus, n_lists=16, id_col="vec_id", vec_col="embedding"):
    centroids = (
        corpus.orderBy(id_col)
        .limit(n_lists)
        .select(
            F.monotonically_increasing_id().alias("_tmp"),
            F.col(id_col).alias("list_id"),
            _as_double(vec_col).alias("centroid"),
        )
        .drop("_tmp")
    ).withColumn("ctn", _norm(F.col("centroid")))
    c = corpus.select(
        F.col(id_col), _as_double(vec_col).alias("v")
    ).withColumn("vn", _norm(F.col("v")))
    scored = c.crossJoin(F.broadcast(centroids)).select(
        id_col,
        "list_id",
        (
            _dot(F.col("v"), F.col("centroid"))
            / F.nullif(F.col("vn") * F.col("ctn"), F.lit(0.0))
        ).alias("sim"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("list_id"))
    assigned = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(id_col, "list_id")
    )
    return centroids.drop("ctn"), corpus.join(assigned, id_col)


def ivf_topk_staged(corpus, queries, k=10, n_lists=16, nprobe=4,
                    id_col="vec_id", vec_col="embedding"):
    centroids, assigned = ivf_assign_staged(corpus, n_lists, id_col, vec_col)
    qv = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    probe_scored = qv.crossJoin(
        F.broadcast(centroids.withColumn("ctn", _norm(F.col("centroid"))))
    ).select(
        "query_id",
        "list_id",
        (
            _dot(F.col("qv"), F.col("centroid"))
            / F.nullif(F.col("qn") * F.col("ctn"), F.lit(0.0))
        ).alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("list_id"))
    probes = (
        probe_scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "list_id")
    )
    cand = probes.join(
        assigned.select(
            F.col(id_col).alias("neighbor_id"),
            "list_id",
            _as_double(vec_col).alias("cv"),
        ).withColumn("cn", _norm(F.col("cv"))),
        "list_id",
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / F.nullif(F.col("qn") * F.col("cn"), F.lit(0.0)),
                6,
            ).alias("cosine"),
        )
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .filter(F.col("cosine").isNotNull())
    )


def quantized_topk_staged(corpus, queries, k=10, id_col="vec_id",
                          vec_col="embedding", corpus_quantized=None):
    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    q = quantize_embeddings(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("q_scale").alias("qs"),
        F.col("q_vec").alias("qv"),
    ).withColumn("q_self", idot(F.col("qv"), F.col("qv")))
    cq = (
        corpus_quantized
        if corpus_quantized is not None
        else quantize_embeddings(corpus, id_col, vec_col)
    )
    c = cq.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("q_scale").alias("cs"),
        F.col("q_vec").alias("cv"),
    ).withColumn("c_self", idot(F.col("cv"), F.col("cv")))
    denom = (
        F.sqrt(F.col("q_self").cast("double")) * F.col("qs")
        * F.sqrt(F.col("c_self").cast("double")) * F.col("cs")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                (idot(F.col("qv"), F.col("cv")) * F.col("qs") * F.col("cs"))
                / F.nullif(denom, F.lit(0.0))
            ).alias("cosine_q"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .filter(F.col("cosine_q").isNotNull())
    )


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def equal_gate(a: DataFrame, b: DataFrame, label: str) -> None:
    ka = sorted(tuple(r) for r in a.collect())
    kb = sorted(tuple(r) for r in b.collect())
    if ka != kb:
        raise SystemExit(
            f"EQUALITY GATE FAILED ({label}): "
            f"{[x for x in ka if x not in kb][:3]} vs "
            f"{[x for x in kb if x not in ka][:3]}"
        )
    print(f"  equality gate PASS ({label}, {len(ka)} rows)", flush=True)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    os.environ["ETL_GCP_SPARK_DISABLE_PINS"] = "1"
    spark = get_spark(app_name="norm_hoist_probe")
    materialize(Q.queries()["count_lineitem"](spark, SF_DIR))  # warmup
    emb = Q._t(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)

    cases = [
        ("brute_force", lambda: VX.brute_force_topk(emb, qs, k=10),
         lambda: brute_force_topk_staged(emb, qs, k=10)),
        ("lsh", lambda: VX.lsh_topk(emb, qs, k=10),
         lambda: lsh_topk_staged(emb, qs, k=10)),
        ("ivf", lambda: VX.ivf_topk(emb, qs, k=10),
         lambda: ivf_topk_staged(emb, qs, k=10)),
        ("quantized", lambda: VX.quantized_topk(emb, qs, k=10),
         lambda: quantized_topk_staged(emb, qs, k=10)),
    ]
    for label, base, staged in cases:
        equal_gate(base(), staged(), label)

    times: dict[tuple[str, str], list[float]] = {}
    for rep in range(reps):
        for label, base, staged in cases:
            pair = (
                [("base", base), ("staged", staged)]
                if rep % 2 == 0
                else [("staged", staged), ("base", base)]
            )
            for vname, fn in pair:
                spark.sparkContext.setJobDescription(f"norm_hoist {label} {vname}")
                t0 = time.time()
                materialize(fn())
                times.setdefault((label, vname), []).append(time.time() - t0)
    for label, _, _ in cases:
        mb = statistics.median(times[(label, "base")])
        ms = statistics.median(times[(label, "staged")])
        print(
            f"{label}: base {mb:.3f}s staged {ms:.3f}s ratio {ms / mb:.3f} "
            f"(base={['%.3f' % t for t in times[(label, 'base')]]}, "
            f"staged={['%.3f' % t for t in times[(label, 'staged')]]})"
        )


if __name__ == "__main__":
    main()
