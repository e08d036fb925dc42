"""Data-layout maintenance for the Parquet lakehouse (engine-side; the
reference declares no physical layout — SURVEY §1.5 — so these are the
100 TB operability pieces a real deployment adds on top).

Two jobs every large Parquet estate runs continuously:

- **Compaction**: streaming/incremental writers leave many small files;
  scans then pay per-file open/footer costs and lose row-group-sized
  IO. ``compact_parquet`` rewrites a directory into ~``target_mb``
  files, preserving partition directories when asked.
- **Sort-ordered rewrite**: Parquet row-group min/max stats only prune
  when values are clustered; ``write_sorted_parquet`` range-partitions
  by the sort key (global order across files) and sorts within
  partitions, so a selective filter on the key touches a contiguous
  file/row-group range instead of every file. This is the
  "zorder-lite" single-key layout; multi-key needs interleaved bits
  (not implemented — single-key covers the corpus's time/key filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the JVM Hadoop FS (works for any
    supported scheme, not just local files)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    return fs.getContentSummary(p).getLength()


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 512,
) -> int:
    """Rewrite the Parquet directory ``src`` into ``dst`` with
    ~``target_mb``-sized files. Returns the file count written.

    Sizing is computed from the source's on-disk bytes (compressed), so
    the output count is right even when the data is heavily encoded.
    Uses ``coalesce`` when shrinking the file count (no shuffle — each
    output task concatenates input splits) and ``repartition`` only
    when growing it (a shuffle is unavoidable to split files).
    """
    total = _dir_bytes(spark, src)
    n_files = max(1, round(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    cur = df.rdd.getNumPartitions()
    out = df.coalesce(n_files) if n_files <= cur else df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst)
    return n_files


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Globally sort-clustered Parquet: ``repartitionByRange`` on the
    sort key (contiguous, non-overlapping key ranges per file) +
    ``sortWithinPartitions`` (clustered row groups inside each file).
    Filters on ``sort_cols`` then prune at BOTH levels: file-level via
    non-overlapping ranges, row-group-level via tight min/max stats."""
    ranged = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    ranged.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)
