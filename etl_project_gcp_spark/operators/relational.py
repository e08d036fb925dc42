"""Relational operator library (SURVEY §2.2/2.3/2.4/2.6).

Small, composable, *declarative* builders — each returns a lazy
DataFrame so Catalyst sees the whole plan (filter pushdown, column
pruning, join planning, partial aggregation all apply). Nothing here
collects or iterates rows on the driver.

Scale notes per operator class:
- filters/projections: pushed into the Parquet scan by Catalyst
  (`PushedFilters`/`ReadSchema` in .explain) — at 100 TB these gate IO.
- joins: dimension sides are explicitly `broadcast()` when small
  (reference joins are all fact→small-dim, SURVEY §2.3) so no shuffle of
  the fact table is needed; large-large joins fall back to sort-merge
  with AQE skew splitting.
- aggregations: expressed as groupBy().agg() → Catalyst plans partial
  (map-side) + final hash aggregation, so shuffle volume is one row per
  (partition × group), not per input row.
- top-k: orderBy().limit(k) → TakeOrderedAndProject, a per-partition
  heap + driver merge of k rows; never a global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BROADCAST_DIM_MAX_ROWS = 10_000_000  # guidance only; callers decide


def project(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Column projection / rename / computed columns (P1-P3)."""
    return df.select(*cols)


def keep_where(df: DataFrame, *predicates: Column) -> DataFrame:
    """Conjunctive filter (P7-P12): AND of all predicates."""
    out = df
    for p in predicates:
        out = out.filter(p)
    return out


def distinct_over(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Projection + set-dedup (P4/A9 — etl_spark.ipynb cell-11)."""
    return df.select(*cols).distinct()


def with_literal(df: DataFrame, name: str, value) -> DataFrame:
    """Add constant column (P5 — etl_spark.ipynb cell-13)."""
    return df.withColumn(name, F.lit(value))


def drop_columns(df: DataFrame, *names: str) -> DataFrame:
    """Drop columns (P6 — etl_spark.ipynb cell-17)."""
    return df.drop(*names)


def left_join_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: Column | str | list[str],
    broadcast_dim: bool = True,
) -> DataFrame:
    """Left-outer equi-join fact→dim (J1/J2 — etl_medallion.py:176-178).

    ``broadcast_dim=True`` pins a broadcast so the fact side never
    shuffles — correct ONLY for dims bounded independent of data scale
    (nation, region, a config table). For dims that grow with the fact
    (part, customer, supplier) leave it False: Catalyst broadcasts from
    file-size statistics and AQE re-checks at runtime, so small inputs
    still broadcast while 100 TB inputs degrade safely to shuffle joins
    instead of OOMing executors on a forced hint.
    """
    right = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(right, on=on, how="left")


def left_join_keep_unmatched(
    keep: DataFrame,
    other: DataFrame,
    on: Column | str | list[str],
) -> DataFrame:
    """Left-outer join dim→fact preserving zero-match rows (J3 —
    etl_medallion.py:191-192: products LEFT JOIN sales keeps zero-sale
    products; their COUNT is 0 and SUM/AVG are NULL — not coalesced).

    Scale note: an outer join can NEVER broadcast its preserved side
    (unmatched preserved rows must stream), so dim-LEFT-JOIN-fact forces
    a fact shuffle. When the join feeds an aggregation, use
    ``dim_fact_rollup`` instead — it pushes the aggregate below the join
    so the fact reduces map-side and the join sees only |dim| rows.
    """
    return keep.join(other, on=on, how="left")


def dim_fact_rollup(
    dim: DataFrame,
    fact: DataFrame,
    dim_key: str,
    fact_key: str,
    aggs: Sequence[Column],
    zero_fill: Sequence[str] = (),
    broadcast_rolled: bool = True,
) -> DataFrame:
    """Aggregation-below-join rewrite of ``dim LEFT JOIN fact GROUP BY
    dim.*``: pre-aggregate the fact by its join key (map-side partial agg
    reduces |fact| → |distinct keys| before any join), then join the
    rolled-up fact onto the dim. Zero-match dim rows keep NULL aggregates
    except the columns named in ``zero_fill`` (COUNT semantics: BigQuery/
    Spark COUNT over an empty group is 0, not NULL — SURVEY §2.4).

    At 100 TB: the fact is touched once and shuffles only its
    pre-aggregated form (|keys| rows). ``broadcast_rolled`` pins the
    broadcast — right when |dim| fits an executor (post-agg size
    statistics are unreliable, so Catalyst may otherwise plan a
    needless shuffle); pass False when the dim itself is huge, where the
    right plan is a co-partitioned shuffle join (or bucket both sides).
    """
    rolled = fact.groupBy(F.col(fact_key).alias(dim_key)).agg(*aggs)
    right = F.broadcast(rolled) if broadcast_rolled else rolled
    out = dim.join(right, on=dim_key, how="left")
    for c in zero_fill:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out


def anti_join(left: DataFrame, right: DataFrame, on: Column | str | list[str]) -> DataFrame:
    """NOT EXISTS (left-anti) — the Spark-native form of the
    `LEFT JOIN … WHERE right.key IS NULL` idiom (P11/P12)."""
    return left.join(right, on=on, how="left_anti")


def grouped_agg(
    df: DataFrame, keys: Sequence[str | Column], *aggs: Column
) -> DataFrame:
    """Grouped multi-aggregate (A1-A4). Aggs must be pre-aliased so the
    result schema matches the oracle (driver contract)."""
    return df.groupBy(*keys).agg(*aggs)


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k (O3 — ORDER BY … LIMIT k).

    Callers must make ``order`` a total order (append a unique key as
    tiebreak) or the selected rows are nondeterministic under ties.
    Physical plan: TakeOrderedAndProject (no global sort).
    """
    return df.orderBy(*order).limit(k)


def sort_by(df: DataFrame, *order: Column) -> DataFrame:
    """Multi-key sort (O1/O2/O5). Note stored-table ordering is not part
    of table contents (SURVEY §2.6 O1) — use for presentation only."""
    return df.orderBy(*order)


def summary_stats(df: DataFrame, cols: Sequence[str], scale: int = 2) -> DataFrame:
    """describe()-equivalent (A8) as an explicit typed aggregation:
    one row per column with count/mean/stddev/min/max, numerics rounded
    for cross-engine comparability.

    ONE scan for all columns: every per-column aggregate lands in a
    single ``agg`` row which then unpivots via an array-of-structs
    explode. The previous union-of-per-column-aggs formulation scanned
    the table once PER COLUMN — at 100 TB a 5-column describe was 5
    full scans for one pass of arithmetic."""
    aggs: list[Column] = []
    for c in cols:
        # mean via exact decimal sum / count: partition-order-independent,
        # so it matches a single-threaded oracle engine bit-for-bit.
        exact_sum = F.sum(F.col(c).cast("decimal(18,4)")).cast("double")
        aggs += [
            F.count(c).alias(f"__n_{c}"),
            F.round(exact_sum / F.count(c), scale).alias(f"__mean_{c}"),
            F.round(F.stddev_samp(c), scale).alias(f"__sd_{c}"),
            F.round(F.min(c), scale).cast("double").alias(f"__min_{c}"),
            F.round(F.max(c), scale).cast("double").alias(f"__max_{c}"),
        ]
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{c}").alias("n"),
                F.col(f"__mean_{c}").alias("mean"),
                F.col(f"__sd_{c}").alias("stddev"),
                F.col(f"__min_{c}").alias("min"),
                F.col(f"__max_{c}").alias("max"),
            )
            for c in cols
        ]
    )
    return df.agg(*aggs).select(F.explode(rows).alias("r")).select("r.*")


def salted_skew_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
    extra_salt_cols: Sequence[str | Column] = (),
) -> DataFrame:
    """Skew-mitigated equi-join: spray each skewed-side row into one of
    ``salt_buckets`` sub-partitions, replicate the small side across all
    buckets, and join on (key, salt). A hot key's rows then land on
    ``salt_buckets`` reducers instead of one.

    The tool for when AQE's skew-join split can't apply (e.g. the skewed
    side feeds a co-grouped/stateful op, or the join is produced by an
    API that pins the partitioning). Replication costs |small| ×
    salt_buckets — keep the salted side the big one.

    The salt is CONTENT-DERIVED ONLY: pmod of xxhash64 over all columns.
    Any per-row positional source (monotonically_increasing_id,
    spark_partition_id, rand) is nondeterministic under task retries —
    after a fetch failure, a recomputed stage can assign different salts
    to rows whose earlier attempt was already partially consumed, and
    the join double-reads or drops rows. A pure function of row content
    recomputes identically on every attempt, so correctness survives
    retries at cluster scale. Residual: FULLY-identical rows share a
    salt and re-collide on one reducer; if that degenerate shape matters
    (mass-duplicated rows under one hot key), pass ``extra_salt_cols``
    — stable distinguishing expressions (a source line number, a
    pre-assigned row uid) mixed into the hash to restore spread — never
    spark_partition_id()/rand (retry-nondeterministic). For file-backed
    frames the canonical choice is the hidden parquet position column,
    stable under retries because it addresses the FILE, not the task:
    ``extra_salt_cols=[F.col("_metadata.row_index")]`` (verified to
    spread byte-identical rows across all buckets — tests/
    test_relational_queries.py).
    """
    salt = F.pmod(
        F.xxhash64(*skewed.columns, *extra_salt_cols), F.lit(salt_buckets)
    )
    left = skewed.withColumn("_salt", salt)
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return left.join(right, on=[key, "_salt"], how=how).drop("_salt")


def salted_grouped_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt_buckets: int = 16,
    extra_salt_cols: Sequence[str | Column] = (),
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: groupBy(keys + salt)
    computes partials (a hot key spreads over ``salt_buckets`` reducers),
    then groupBy(keys) combines partials (≤ salt_buckets rows per key).

    Only algebraic aggregates decompose this way — callers supply both
    phases explicitly, e.g. partial ``sum(x) AS s`` / final
    ``sum(s) AS total`` or partial ``count(*) AS c`` / final
    ``sum(c) AS n``. (Spark's own HashAggregate already does
    partial→final within a shuffle; salting adds the extra key so the
    *reduce* side also parallelizes per hot key.)

    Salt is content-derived only (retry-deterministic — see
    salted_skew_join for why positional sources are unsafe); fully-
    identical rows share a bucket, so partial groups stay bounded by
    duplicate-row count rather than hot-key count — pass
    ``extra_salt_cols`` (stable row-distinguishing expressions) to
    restore spread for mass-duplicated rows.
    """
    salt = F.pmod(
        F.xxhash64(*df.columns, *extra_salt_cols), F.lit(salt_buckets)
    )
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
