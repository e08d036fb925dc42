"""Embedding similarity search (SURVEY §2.12 X3 [EXT]).

Three tiers, all DataFrame-native:

- **Brute-force top-k** (the correctness baseline): broadcast the query
  vectors against the corpus, cosine via JVM-side array expressions
  (zip_with + aggregate — sequential accumulation, so scores are
  bit-identical to a single-threaded engine), rank with a per-query
  window. Cost O(|Q|·N) — fine for small |Q|, the oracle path.
- **Random-hyperplane LSH** (scale path): T hash tables × P sign bits;
  vectors sharing a bucket in any table become candidates; exact cosine
  only on candidates. Hyperplane directions are derived from xxhash64
  bits (deterministic, no stored model). Recall tuned by (T, P).
- **IVF** (scale path): coarse quantizer from C deterministic seed
  vectors; vectors assign to nearest seed (one broadcast join against C
  centroids); queries probe the ``nprobe`` nearest lists. At 100 TB the
  corpus is partitioned by list id so a probe touches nprobe/C of data.

References: PAPERS.md — top-k similarity search (EDBT 2020), REPOSE
distributed top-k (ICDE 2021) for the partition-then-merge shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Sequential double dot-product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: F.Column, b: F.Column) -> F.Column:
    """Cosine similarity, computed in double with sequential
    accumulation (matches DuckDB's list_cosine_similarity on DOUBLE[])."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col: str) -> F.Column:
    return F.col(col).cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scores: int = 6,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Output: (query_id, neighbor_id, cosine, rk). Scores are rounded and
    ties broken by neighbor id, so the selected set is a total order.
    Physically: broadcast-nested-loop of |Q| × N with the per-query
    ranking window — the window input is already cut to N·|Q| scored
    rows; no N² blow-up.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_scores).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scores: int = 6,
) -> DataFrame:
    """Arrow-vectorized twin of ``brute_force_topk``: one numpy matmul
    per Arrow batch instead of per-row array expressions.

    Shape (REPOSE/partition-then-merge): the query matrix is tiny by
    contract, so it rides into every task via the closure; each
    partition emits only its local top-k per query (≤ k·|Q| rows), and a
    final window merges the partials — the shuffle carries k·|Q|·
    partitions rows, never N. Same rounding + id tiebreak as the
    expression version, so both return the identical set.
    """
    import numpy as np

    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows])
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    def local_topk(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            cmat = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
            scores = np.round(cn @ qn.T, round_scores)  # |batch| × |Q|
            for j, qid in enumerate(qids):
                mask = ids != qid
                cand_ids, cand_s = ids[mask], scores[mask, j]
                order = np.lexsort((cand_ids, -cand_s))[:k]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(order), qid),
                        "neighbor_id": cand_ids[order],
                        "cosine": cand_s[order],
                    }
                )

    partials = corpus.select(id_col, vec_col).mapInPandas(
        local_topk, "query_id long, neighbor_id long, cosine double"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return partials.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def _sign_projections(df: DataFrame, vec_col: str, planes: int, table: int) -> DataFrame:
    """Per-vector LSH bucket for one hash table: P sign bits of
    hash-derived hyperplane projections, packed into a long."""
    exploded = df.select(
        "*", F.posexplode(_as_double(vec_col)).alias("_pos", "_val")
    )
    # deterministic pseudo-random ±1 per (table, plane, dim) from hash bits
    h = F.xxhash64(F.col("_pos"), F.lit(table))
    projs = [
        F.sum(
            F.when(F.shiftright(h, p).bitwiseAND(F.lit(1)) == 1, F.col("_val")).otherwise(
                -F.col("_val")
            )
        ).alias(f"_proj{p}")
        for p in range(planes)
    ]
    other = [c for c in df.columns]
    grouped = exploded.groupBy(*other).agg(*projs)
    bucket = None
    for p in range(planes):
        bit = F.when(F.col(f"_proj{p}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, p)
        bucket = term if bucket is None else bucket.bitwiseXOR(term)
    return grouped.select(*other, bucket.alias("bucket"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 5,
    tables: int = 10,
) -> DataFrame:
    """Approximate cosine top-k: candidates = bucket collisions across
    ``tables`` hash tables; exact cosine + rank only on candidates."""
    cands = None
    for t in range(tables):
        cb = _sign_projections(
            corpus.select(F.col(id_col).alias("neighbor_id"), vec_col), vec_col, planes, t
        ).select("neighbor_id", "bucket")
        qb = _sign_projections(
            queries.select(F.col(id_col).alias("query_id"), vec_col), vec_col, planes, t
        ).select("query_id", "bucket")
        pair = cb.join(qb, "bucket").select("query_id", "neighbor_id")
        cands = pair if cands is None else cands.unionByName(pair)
    cands = cands.filter(F.col("query_id") != F.col("neighbor_id")).distinct()

    qv = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"))
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def ivf_assign(
    corpus: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Coarse quantizer: centroids = the ``n_lists`` lowest-id vectors
    (deterministic seeds); every vector assigns to its nearest centroid
    by cosine. Returns (centroids, assigned corpus with list_id)."""
    centroids = (
        corpus.orderBy(id_col)
        .limit(n_lists)
        .select(
            F.monotonically_increasing_id().alias("_tmp"),
            F.col(id_col).alias("list_id"),
            _as_double(vec_col).alias("centroid"),
        )
        .drop("_tmp")
    )
    c = corpus.select(F.col(id_col), _as_double(vec_col).alias("v"))
    scored = c.crossJoin(F.broadcast(centroids)).select(
        id_col,
        "list_id",
        cosine(F.col("v"), F.col("centroid")).alias("sim"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("list_id"))
    assigned = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(id_col, "list_id")
    )
    return centroids, corpus.join(assigned, id_col)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the ``nprobe`` nearest lists per query, exact
    cosine within the probed lists only."""
    centroids, assigned = ivf_assign(corpus, n_lists, id_col, vec_col)
    qv = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    probe_scored = qv.crossJoin(F.broadcast(centroids)).select(
        "query_id", "list_id", cosine(F.col("qv"), F.col("centroid")).alias("sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("list_id"))
    probes = (
        probe_scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "list_id")
    )
    cand = probes.join(
        assigned.select(
            F.col(id_col).alias("neighbor_id"), "list_id", _as_double(vec_col).alias("cv")
        ),
        "list_id",
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.join(F.broadcast(qv), "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= k)
