"""Z-order layout: multi-key clustering must tighten per-file min/max
ranges on EVERY clustered key, where a single-key sort tightens only its
own key (sources/layout.py::write_zordered_parquet).

The metric is what the Parquet reader actually prunes with: for each
output file, the fraction of the key's global range its min/max span
covers. Unclustered data covers ~1.0 on every key; a single-key sort
covers ~1/n_files on the sort key but still ~1.0 on the other; Z-order
covers a small fraction on BOTH.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_project_gcp_spark.sources.layout import (
    write_sorted_parquet,
    write_zordered_parquet,
)

N_FILES = 16


def _avg_range_fraction(path: str, col: str, lo: int, hi: int) -> float:
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for i in range(row_group.num_columns):
                c = row_group.column(i)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        assert fmin is not None, f"no stats for {col} in {f}"
        spans.append((fmax - fmin) / (hi - lo))
    assert len(spans) >= N_FILES // 2
    return sum(spans) / len(spans)


def _two_key_df(spark, n=40_000):
    # Two independent keys: a is sequential, b is a hash-scrambled
    # permutation — no correlation, so clustering one does nothing for
    # the other unless the layout interleaves them.
    return spark.range(n).select(
        F.col("id").alias("a"),
        F.pmod(F.col("id") * 48271 + 11, F.lit(n)).alias("b"),
        F.lit("x").alias("payload"),
    )


def test_zorder_tightens_both_keys(spark, tmp_path):
    n = 40_000
    df = _two_key_df(spark, n)
    single = str(tmp_path / "single")
    zord = str(tmp_path / "zord")
    write_sorted_parquet(df, single, ["a"], n_files=N_FILES)
    write_zordered_parquet(df, zord, ["a", "b"], bits=8, n_files=N_FILES)

    # Single-key sort: a is tight, b stays ~full-range per file.
    assert _avg_range_fraction(single, "a", 0, n - 1) < 0.15
    assert _avg_range_fraction(single, "b", 0, n - 1) > 0.8

    # Z-order: BOTH keys well under full range per file.
    za = _avg_range_fraction(zord, "a", 0, n - 1)
    zb = _avg_range_fraction(zord, "b", 0, n - 1)
    assert za < 0.5, za
    assert zb < 0.5, zb


def test_zorder_preserves_rows_and_schema(spark, tmp_path):
    df = _two_key_df(spark, 5_000)
    path = str(tmp_path / "z")
    write_zordered_parquet(df, path, ["a", "b"], bits=6, n_files=4)
    back = spark.read.parquet(path)
    assert sorted(back.columns) == sorted(df.columns)  # __z dropped
    assert back.count() == 5_000
    assert back.select(F.sum("a"), F.sum("b")).first() == df.select(
        F.sum("a"), F.sum("b")
    ).first()


def test_zorder_rejects_non_numeric_keys(spark, tmp_path):
    df = _two_key_df(spark, 100)
    try:
        write_zordered_parquet(df, str(tmp_path / "z"), ["a", "payload"])
    except TypeError as e:
        assert "payload" in str(e)
    else:
        raise AssertionError("expected TypeError for string z-order key")


def test_zorder_rejects_out_of_range_bits(spark, tmp_path):
    df = _two_key_df(spark, 100)
    try:
        write_zordered_parquet(df, str(tmp_path / "z"), ["a", "b"], bits=16)
    except ValueError as e:
        assert "bits=16" in str(e)
    else:
        raise AssertionError("expected ValueError for bits=16")


def test_table_manifest_is_order_insensitive_and_detects_change(spark, tmp_path):
    from etl_project_gcp_spark.sources.layout import table_manifest

    df = _two_key_df(spark, 2_000)
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    df.repartition(4).write.parquet(p1)
    df.repartition(7, "b").write.parquet(p2)  # same rows, new layout
    m1, m2 = table_manifest(spark, p1), table_manifest(spark, p2)
    assert m1["n_rows"] == m2["n_rows"] == 2_000
    assert m1["content_hash"] == m2["content_hash"]  # layout-independent
    assert m1["schema"] == m2["schema"]

    p3 = str(tmp_path / "v3")
    df.withColumn("a", F.col("a") + 1).write.parquet(p3)
    assert table_manifest(spark, p3)["content_hash"] != m1["content_hash"]


def test_retention_vacuum_drops_only_expired_partitions(spark, tmp_path):
    import os

    from pyspark.sql import Row

    from etl_project_gcp_spark.sources.layout import retention_vacuum

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [Row(id=1, day="2024-01-01"), Row(id=2, day="2024-01-02"),
         Row(id=3, day="2024-01-03")]
    ).write.partitionBy("day").parquet(path)

    would = retention_vacuum(
        spark, path, "day", ["2024-01-02", "2024-01-03"], dry_run=True
    )
    assert would == ["day=2024-01-01"]
    assert os.path.isdir(f"{path}/day=2024-01-01")  # dry run: untouched

    dropped = retention_vacuum(spark, path, "day", ["2024-01-02", "2024-01-03"])
    assert dropped == ["day=2024-01-01"]
    assert not os.path.exists(f"{path}/day=2024-01-01")
    # Partition values read back type-inferred (DATE here) — compare
    # as strings.
    got = {str(r.day) for r in spark.read.parquet(path).collect()}
    assert got == {"2024-01-02", "2024-01-03"}

    try:
        retention_vacuum(spark, path, "day", [])
    except ValueError:
        pass
    else:
        raise AssertionError("empty keep_values must refuse")


def test_retention_vacuum_escapes_values_and_protects_null_partition(
    spark, tmp_path
):
    """ADVICE r5 (medium): keep_values must be compared under Spark's
    partition-path escaping (':' → '%3A' on disk), and the NULL
    partition (__HIVE_DEFAULT_PARTITION__) must survive unless the
    caller opts in."""
    import os

    from pyspark.sql import Row

    from etl_project_gcp_spark.sources.layout import (
        HIVE_DEFAULT_PARTITION,
        escape_partition_value,
        retention_vacuum,
    )

    assert escape_partition_value("2024-01-01 00:00:00") == \
        "2024-01-01 00%3A00%3A00"
    assert escape_partition_value("a/b%c") == "a%2Fb%25c"
    assert escape_partition_value(None) == HIVE_DEFAULT_PARTITION

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [Row(id=1, ts="2024-01-01 00:00:00"),
         Row(id=2, ts="2024-01-02 00:00:00"),
         Row(id=3, ts=None)]
    ).write.partitionBy("ts").parquet(path)
    on_disk = set(os.listdir(path))
    assert "ts=2024-01-01 00%3A00%3A00" in on_disk  # Spark escaped it
    assert f"ts={HIVE_DEFAULT_PARTITION}" in on_disk

    # RAW value in the allowlist matches its escaped directory; NULL
    # partition is skipped by default even though no keep value names it
    dropped = retention_vacuum(
        spark, path, "ts", ["2024-01-01 00:00:00"]
    )
    assert dropped == ["ts=2024-01-02 00%3A00%3A00"]
    assert os.path.isdir(f"{path}/ts=2024-01-01 00%3A00%3A00")
    assert os.path.isdir(f"{path}/ts={HIVE_DEFAULT_PARTITION}")

    # opting in drops the NULL partition
    dropped = retention_vacuum(
        spark, path, "ts", ["2024-01-01 00:00:00"],
        drop_null_partition=True,
    )
    assert dropped == [f"ts={HIVE_DEFAULT_PARTITION}"]
    assert not os.path.exists(f"{path}/ts={HIVE_DEFAULT_PARTITION}")


def test_table_manifest_hash_is_multiset_sensitive(spark, tmp_path):
    """ADVICE r5: an XOR combiner cancels rows occurring an even number
    of times — two equal-count datasets differing by which row is
    duplicated would collide. The SUM-mod-2^64 combiner must not."""
    from pyspark.sql import Row

    from etl_project_gcp_spark.sources.layout import table_manifest

    a = [Row(k="x"), Row(k="x"), Row(k="y")]   # x twice
    b = [Row(k="x"), Row(k="y"), Row(k="y")]   # y twice — same count
    pa_, pb_ = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame(a).write.parquet(pa_)
    spark.createDataFrame(b).write.parquet(pb_)
    ma, mb = table_manifest(spark, pa_), table_manifest(spark, pb_)
    assert ma["n_rows"] == mb["n_rows"] == 3
    assert ma["content_hash"] != mb["content_hash"]


def test_escape_partition_value_matches_spark_on_disk_naming(
    spark, tmp_path
):
    """Pin the Python escape rule to what Spark ACTUALLY writes: land
    one partition per nasty value and assert every directory name is
    exactly ts=<escape_partition_value(value)>."""
    import os

    from pyspark.sql import Row

    from etl_project_gcp_spark.sources.layout import escape_partition_value

    nasty = [
        "plain",
        "with space",
        "colon:colon",
        "slash/slash",
        "pct%pct",
        "eq=eq",
        "hash#quote'q",
        "br[ack]ets^{b}",
        "q?star*back\\slash",
        'dquote"dq',
        "tab\there",
        "",  # empty string: Spark maps it to the default partition
    ]
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [Row(id=i, ts=v) for i, v in enumerate(nasty)]
    ).write.partitionBy("ts").parquet(path)
    on_disk = {
        d for d in os.listdir(path)
        if d.startswith("ts=") and os.path.isdir(f"{path}/{d}")
    }
    expected = {f"ts={escape_partition_value(v)}" for v in nasty}
    assert on_disk == expected
