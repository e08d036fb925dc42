"""Sinks (SURVEY §2.1, S3/S4/S7).

Everything is full-overwrite and idempotent, matching the reference's
``LOAD DATA OVERWRITE`` / ``CREATE OR REPLACE TABLE`` / notebook
``mode('overwrite')`` lifecycle (etl_medallion.py:91,116,...;
etl_spark.ipynb cell-23). No incremental/merge semantics exist in the
reference, so none are promised here.

Scale notes: ``partition_by`` is an engine-side optimization the
reference never declares (SURVEY §1.5) — at 100 TB, gold tables should
be partitioned on their natural pruning keys (e.g. year/month derived in
the sales_summary query) so downstream scans prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_overwrite(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink, overwrite (S4)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV sink with header, UTF-8 (S3 — data_generator.py:293-311)."""
    df.write.mode("overwrite").option("header", header).csv(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """JSON-Lines sink (one object per line, UTF-8, overwrite) — the
    export format downstream tokenizer/training jobs consume. Spark's
    json sink is line-delimited by construction, so the output is
    splittable on re-read.

    ``compression``: at 100 TB the export always compresses — pass
    ``"gzip"`` for maximum-compatibility consumers or ``"lz4"``/
    ``"snappy"`` when re-read speed matters. One caveat that choice
    carries: gzip files are NOT splittable, so a re-read parallelizes
    per FILE — keep per-shard output sizes bounded (the shard_manifest
    / repartition-by-shard discipline already does) or the downstream
    job serializes on one giant member. Uncompressed (None) stays the
    default for the oracle-checked round-trip entries."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink, overwrite — columnar interchange with Hive-standard
    warehouses. Same partition-pruning contract as the Parquet sink:
    ``partition_by`` on natural pruning keys keeps 100 TB scans
    stripe- and partition-local."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_table_overwrite(
    df: DataFrame,
    table: str,
    partition_by: list[str] | None = None,
) -> None:
    """Managed-table CTAS equivalent (S7 — CREATE OR REPLACE TABLE AS SELECT)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(table)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table: rows hash-partitioned into ``num_buckets``
    files by ``bucket_cols`` at write time.

    The co-located-join tool: two tables bucketed identically on their
    join key join with ZERO shuffle — the exchange that dominates big
    fact-fact joins at 100 TB is paid once at write time and amortized
    over every subsequent join/aggregation on that key. ``sort_cols``
    additionally pre-sorts within buckets so sort-merge joins skip their
    sort. Bucket count should be sized so one bucket ≈ one task's worth
    of data at target scale.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
