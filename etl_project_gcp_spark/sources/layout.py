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
  "zorder-lite" single-key layout.
- **Z-order rewrite**: ``write_zordered_parquet`` interleaves the bit
  codes of several keys' equi-depth bucket indices so each file covers
  a small hypercube of the key space — min/max pruning works on ANY of
  the clustered keys, where a single-key sort helps only its own key
  (measured in tests/test_layout.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite the Parquet directory ``src`` into ``dst`` with
    ~``target_mb``-sized files. Returns the file count written (per
    partition directory when ``partition_by`` is set).

    Sizing is computed from the source's on-disk bytes (compressed), so
    the output count is right even when the data is heavily encoded.
    Unpartitioned: ``coalesce`` when shrinking the file count (no
    shuffle — each output task concatenates input splits),
    ``repartition`` only when growing it (a shuffle is unavoidable to
    split files). With ``partition_by``, rows hash-shuffle on the
    partition keys into ~``n_files`` tasks per directory so each
    partition directory compacts to approximately target-sized files
    instead of every task writing a sliver into every directory.

    Partitioned sizing uses the GLOBAL average (total bytes / distinct
    partition count), so heavily skewed directories land above/below
    ``target_mb`` (a hot dir holding 90% of the bytes compacts into
    ~n_files oversized files); the return value is the per-directory
    TARGET count, and salt-hash collisions can write fewer. Per-dir
    exact sizing needs per-dir byte stats — at that point run
    ``compact_parquet`` per partition directory with its own budget.
    """
    total = _dir_bytes(spark, src)
    df = spark.read.parquet(src)
    if partition_by:
        n_dirs = max(
            1, df.select(*partition_by).distinct().count()
        )  # bounded by partition count, never row count
        n_files = max(1, round(total / n_dirs / (target_mb * 1024 * 1024)))
        # Shuffle on (keys, salt): keys alone would map each directory's
        # rows to ONE task (one file per dir no matter the target);
        # a content-derived salt splits each directory across ~n_files
        # tasks deterministically.
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_files)
        )
        out = df.repartition(n_files * n_dirs, *partition_by, salt)
        out.write.mode("overwrite").partitionBy(*partition_by).parquet(dst)
        return n_files
    n_files = max(1, round(total / (target_mb * 1024 * 1024)))
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


def _zvalue(df: DataFrame, cols: list[str], bits: int) -> DataFrame:
    """Append the Morton (Z-order) code of ``cols`` as ``__z``.

    Per column: one ``approxQuantile`` pass fits 2^bits equi-depth
    bucket boundaries (driver-side list bounded by 2^bits values —
    equi-DEPTH, so skewed keys still spread across codes, unlike
    ``width_bucket``'s uniform widths); each row's bucket index is the
    count of boundaries ≤ value (an ``aggregate`` fold over the literal
    boundary array — O(2^bits) adds/row, a one-time rewrite cost); the
    per-column indices then bit-interleave into one code, so sorting by
    ``__z`` clusters ALL keys at once.
    """
    if not 1 <= bits <= 12:
        raise ValueError(
            f"bits={bits} out of range [1, 12]: each key embeds a "
            f"2^bits-literal boundary array in the plan (4096 at the "
            f"cap) and the bucket fold is O(2^bits)/row — beyond 12 the "
            f"plan bloats for no extra pruning (file count, not code "
            f"granularity, bounds min/max tightness)"
        )
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double",
               "decimal"}
    dtypes = dict(df.dtypes)
    bad = [c for c in cols
           if dtypes.get(c, "?").split("(")[0] not in numeric]
    if bad:
        raise TypeError(
            f"z-order keys must be numeric (approxQuantile boundaries): "
            f"{bad} have types {[dtypes.get(c) for c in bad]}; cast "
            f"dates/timestamps to a numeric epoch and hash or "
            f"dictionary-encode string keys first"
        )
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    all_bounds = df.stat.approxQuantile(cols, probs, 0.001)
    out = df
    idx_cols = []
    for c, bounds in zip(cols, all_bounds):
        # Dedup preserves bucket monotonicity; repeated quantiles on
        # low-cardinality keys would otherwise skip codes.
        uniq = sorted(set(bounds))
        idx = f"__zb_{c}"
        out = out.withColumn(
            idx,
            F.aggregate(
                F.lit(uniq).cast("array<double>"),
                F.lit(0),
                lambda acc, b: acc
                + F.when(F.col(c).cast("double") >= b, 1).otherwise(0),
            ),
        )
        idx_cols.append(idx)
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for ci, idx in enumerate(idx_cols):
            extracted = F.shiftright(F.col(idx), bit).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(
                extracted.cast("long"), bit * len(idx_cols) + ci
            )
    return out.withColumn("__z", z.cast("long")).drop(*idx_cols)


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int | None = None,
) -> None:
    """Multi-key clustered rewrite (Z-order): interleave the bit codes
    of each key's equi-depth bucket index and range-partition + sort by
    the combined code. Each output file/row-group then covers a small
    HYPERCUBE of the key space, so min/max stats prune scans filtered
    on ANY of the keys — the multi-key layout ``write_sorted_parquet``
    can't give (a single-key sort leaves every other key's per-file
    range at ~full width; measured in tests/test_layout.py).
    """
    zdf = _zvalue(df, cols, bits)
    ranged = (
        zdf.repartitionByRange(n_files, "__z")
        if n_files
        else zdf.repartitionByRange("__z")
    )
    (ranged.sortWithinPartitions("__z").drop("__z")
           .write.mode("overwrite").parquet(path))


def table_manifest(spark: SparkSession, path: str) -> dict:
    """Export-consistency manifest for a Parquet directory: schema,
    row count, per-file inventory (name, bytes), and an order-
    insensitive content hash (SUM of per-row xxhash64 mod 2^64 —
    commutative like xor, so partition order can't change it, but
    multiset-sensitive: a row appearing an even number of times still
    contributes, where xor would cancel it out entirely and let two
    datasets differing by a swapped duplicate pair collide).

    A consumer re-computes the same dict to prove a copied/replicated
    dataset is intact; the row hash is one map-side pass (the sum
    aggregates partially per partition, no shuffle of data rows).
    ``hash_algo`` names the combiner so a manifest persisted under an
    older algorithm reads as "different algorithm", never as
    corruption.
    """
    df = spark.read.parquet(path)
    row_hash = df.select(
        F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\0"))
                     for c in df.columns]).alias("h")
    )
    agg = row_hash.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum holds ~1e19 rows of |h|<=2^63 without
        # overflow; reduced mod 2^64 on the driver below.
        F.sum(F.col("h").cast("decimal(38,0)")).alias("hsum"),
    ).first()
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    files = sorted(
        (f.getPath().getName(), f.getLen())
        for f in fs.listStatus(p)
        if f.getPath().getName().endswith(".parquet")
    )
    return {
        "schema": df.schema.simpleString(),
        "hash_algo": "xxhash64-sum-mod64-v2",
        "n_rows": agg["n"],
        "content_hash": int(agg["hsum"] or 0) % (1 << 64),
        "files": [{"name": n, "bytes": b} for n, b in files],
    }


# Characters Spark/Hive escape in partition directory names
# (ExternalCatalogUtils.charToEscape): ASCII control chars 01-1F plus
# the listed specials, written as %XX uppercase hex.
_PATH_ESCAPE_CHARS = frozenset(
    [chr(i) for i in range(0x01, 0x20)]
    + ['"', "#", "%", "'", "*", "/", ":", "=", "?", "\\", "\x7f",
       "{", "[", "]", "^"]
)

#: Directory name Spark writes for a NULL partition value.
HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def escape_partition_value(value) -> str:
    """Python twin of Spark's ``ExternalCatalogUtils.escapePathName``:
    the escaping Spark applies to a partition VALUE when it becomes a
    directory name (``ts=2024-01-01 00:00:00`` on disk is
    ``ts=2024-01-01 00%3A00%3A00``). ``None`` AND the empty string map
    to the ``__HIVE_DEFAULT_PARTITION__`` sentinel directory — Spark's
    ``getPartitionPathString`` treats both as the default partition."""
    if value is None or str(value) == "":
        return HIVE_DEFAULT_PARTITION
    return "".join(
        f"%{ord(c):02X}" if c in _PATH_ESCAPE_CHARS else c
        for c in str(value)
    )


def retention_vacuum(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keep_values: list,
    dry_run: bool = False,
    drop_null_partition: bool = False,
) -> list[str]:
    """Retention enforcement on a partitioned table: drop every
    ``{partition_col}=value`` directory whose value is NOT in
    ``keep_values``. Returns the dropped (or would-drop, when
    ``dry_run``) directory names.

    ``keep_values`` are RAW values — they are escaped here with the
    same rule Spark uses writing partition directories
    (``escapePathName``), so an allowlisted timestamp like
    ``2024-01-01 00:00:00`` matches its on-disk form
    ``2024-01-01 00%3A00%3A00`` instead of being silently deleted.
    The NULL partition (``__HIVE_DEFAULT_PARTITION__``) can never be
    named by a raw value, so it is SKIPPED unless the caller opts in
    with ``drop_null_partition=True`` (a ``None`` in ``keep_values``
    also protects it explicitly).

    Deletion is directory-granular via the Hadoop FS — no data read,
    no rewrite; at 100 TB expiring a day costs one namespace op.
    ``keep_values`` is an explicit allowlist (never a computed cutoff
    inside this helper) so callers can't silently vacuum everything on
    an empty-table edge case."""
    if not keep_values:
        raise ValueError("keep_values is empty — refusing to vacuum all")
    keep = {escape_partition_value(v) for v in keep_values}
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    dropped = []
    prefix = f"{partition_col}="
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(prefix)):
            continue
        disk_value = name[len(prefix):]
        if disk_value == HIVE_DEFAULT_PARTITION and not drop_null_partition:
            continue
        if disk_value not in keep:
            dropped.append(name)
            if not dry_run:
                fs.delete(st.getPath(), True)
    return sorted(dropped)
