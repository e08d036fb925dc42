"""Edge semantics: empty inputs, empty groups, and ANSI-mode guards.

These are the cases that break quietly at scale — a filter that matches
nothing in one partition of 10 000, a group with no non-null values, a
division whose denominator hits zero on real data.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from etl_project_gcp_spark import exact as X
from etl_project_gcp_spark import queries as Q


def test_queries_on_empty_input_keep_schema(spark, sf01_dir):
    """A query whose filters match nothing must return 0 rows with the
    same schema — not raise, not change column types."""
    full = Q.queries()["pricing_summary"](spark, sf01_dir)
    li = spark.read.parquet(f"{sf01_dir}/lineitem.parquet")
    empty_dir_df = li.filter(F.lit(False))
    # rebuild the same aggregation over an empty frame
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    empty = empty_dir_df.groupBy("l_returnflag", "l_linestatus").agg(
        X.dsum_round(F.col("l_quantity")).alias("sum_qty"),
        X.davg(F.col("l_quantity")).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )
    assert empty.count() == 0
    assert [f.dataType for f in empty.schema.fields[:2]] == [
        f.dataType for f in full.schema.fields[:2]
    ]


def test_davg_on_all_null_group_is_null(spark):
    df = spark.createDataFrame([("a", None), ("a", None), ("b", 2.0)],
                               "k string, v double")
    got = {r.k: r.a for r in df.groupBy("k").agg(X.davg(F.col("v")).alias("a")).collect()}
    assert got["a"] is None  # NULL, never 0 — reference semantics
    assert Decimal(str(got["b"])) == Decimal("2.0")


def test_ddiv_round_zero_denominator_is_null_not_error(spark):
    """ANSI mode errors on x/0 — the exact-division helper must guard."""
    df = spark.createDataFrame([(10, 0), (10, 4)], "num int, den int")
    rows = df.select(X.ddiv_round(F.col("num"), F.col("den")).alias("r")).collect()
    assert rows[0].r is None
    assert Decimal(str(rows[1].r)) == Decimal("2.5")


def test_dsum_round_survives_large_sums(spark):
    """DECIMAL(18,2) inputs widen under sum — a 10^12-scale total must
    not overflow (ANSI would raise, not wrap)."""
    df = spark.range(1000).select((F.lit(999_999_999.99)).alias("v"))
    got = df.agg(X.dsum_round(F.col("v")).alias("s")).collect()[0].s
    assert Decimal(str(got)) == Decimal("999999999990.00")


def test_train_val_test_split_is_total_disjoint_deterministic(spark):
    """The 80/10/10 split must partition the corpus exactly (every doc
    in one split), reproduce bit-identically across runs, and land
    within sane mass of its nominal fractions (md5 buckets are
    near-uniform; sf0.001 has 500 docs, so allow wide tolerance)."""
    from etl_project_gcp_spark.queries import _t, train_val_test_split

    sf = "/root/testdata/sf0.001"
    out = train_val_test_split(spark, sf).collect()
    n_corpus = _t(spark, sf, "documents").count()

    assert sum(r.n_docs for r in out) == n_corpus  # total + disjoint
    by_split = {}
    for r in out:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert set(by_split) == {"train", "val", "test"}
    assert 0.70 <= by_split["train"] / n_corpus <= 0.90
    assert 0.04 <= by_split["val"] / n_corpus <= 0.16
    assert 0.04 <= by_split["test"] / n_corpus <= 0.16

    again = train_val_test_split(spark, sf).collect()
    assert sorted(map(tuple, out), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, again), key=lambda t: (t[0], t[1])
    )
