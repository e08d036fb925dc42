"""Training-data export pipeline — the LLM-data twin of the medallion
flagship (plans/medallion.py): every stage a production corpus export
runs between "raw documents" and "training shards on disk", composed
from the operators the registry proves individually, and materialized
through a real partitioned JSONL write so the gate covers the export
format itself, not just the logical plan.

Stages (all deterministic, so the whole chain is oracle-checkable):

1. exact dedup  — sha256-keyed survivor selection (operators/dedup.py
   discipline: the groupBy shuffles 32-byte hashes, never text)
2. quality gate — corpus-standard token count (operators/text.py
   ``tokens``), fixed ``min_tokens`` floor
3. split assign — md5 stable-bucket 80/10/10 train/val/test (the
   ``train_val_test_split`` recipe: engine/partitioning/rerun-stable)
4. shard assign — a SECOND md5 window (chars 9-16) so shard is
   independent of the split bucket (chars 1-8)
5. export       — repartition by (split, shard) and write partitioned
   JSONL (one file per partition at gate scale — the layout downstream
   tokenizer jobs consume), then READ BACK from disk
6. manifest     — per (split, shard) doc/token/char totals recomputed
   from the round-tripped text, so a JSON escaping or partition
   encoding bug anywhere in the export surfaces as a value mismatch

At 100 TB each stage keeps its individual operator's scale contract;
the only additions are the final repartition (the export's OWN shuffle,
keyed exactly like its directory layout) and the read-back (a driver
gate concern — production consumers read the shards, they don't
re-verify them per write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_gcp_spark.operators.text import stable_bucket, tokens


def _shard_bucket(col: str, n_shards: int):
    """Deterministic shard id from md5 chars 9-16 — same contract as
    ``stable_bucket`` (chars 1-8) but an independent window, so shard
    assignment does not correlate with the split bucket."""
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 9, 8), 16, 10)
        .cast("long")
        % n_shards
    )


def run_training_export(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    n_shards: int = 4,
    min_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    compression: str | None = None,
) -> DataFrame:
    """Run the full export into ``{root}/shards`` and return the
    read-back per-(split, shard) manifest. See module docstring.

    ``compression`` (e.g. ``"gzip"``/``"lz4"``) compresses the JSONL
    shards — the 100 TB default; the manifest is recomputed from the
    ROUND-TRIPPED text, so it is codec-invariant by construction
    (equality pytest-pinned). Gzip members are not splittable: the
    per-(split, shard) directory layout is what keeps a re-read
    parallel, one task per shard file."""
    w = root.rstrip("/")

    # 1. exact dedup: survivor id per content hash, then an id-keyed
    #    join to recover the surviving rows (hash-only first shuffle)
    surv = (
        docs.select(F.sha2(F.col(text_col), 256).alias("h"), id_col)
        .groupBy("h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    deduped = docs.join(surv, id_col)

    # 2-4. quality floor + split + shard (all map-side expressions)
    bucket = stable_bucket(id_col, 100)
    staged = (
        deduped.withColumn("n_tok", F.size(tokens(text_col)))
        .filter(F.col("n_tok") >= min_tokens)
        .select(
            id_col,
            text_col,
            F.when(bucket < 80, F.lit("train"))
            .when(bucket < 90, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
            _shard_bucket(id_col, n_shards).alias("shard"),
        )
    )

    # 5. the export itself: shuffle once on the directory layout key,
    #    land as partitioned JSONL, then read back under a pinned
    #    schema (inference on 100 TB of shards would be its own scan)
    out = f"{w}/shards"
    writer = (
        staged.repartition("split", "shard")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
    )
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(out)
    back = (
        spark.read.schema(f"{id_col} bigint, {text_col} string")
        .option("basePath", out)
        .json(out)
    )
    if "split" not in back.columns:
        # zero surviving documents -> no partition directories -> the
        # read-back has nothing to discover. Without this guard the
        # manifest select dies with an unrelated "cannot resolve
        # `split`" AnalysisException (found the hard way in pytest) —
        # name the actual cause instead.
        raise ValueError(
            f"training export at {out} produced ZERO surviving "
            f"documents — every row was removed by dedup or the "
            f"min_tokens={min_tokens} quality floor; nothing to "
            f"manifest"
        )

    # 6. manifest recomputed from the round-tripped text
    return (
        back.select(
            F.col("split").cast("string").alias("split"),
            F.col("shard").cast("bigint").alias("shard"),
            F.size(tokens(text_col)).cast("long").alias("tok"),
            F.length(F.col(text_col)).cast("long").alias("chars"),
        )
        .groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("n_tokens"),
            F.sum("chars").alias("n_chars"),
        )
    )
