"""The training export pipeline (plans/export.py) — stage semantics
the registry oracle can't see from the final manifest alone: the
on-disk layout, survivor selection, and the token floor."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from etl_project_gcp_spark.plans.export import run_training_export

DOC = "the quick brown fox jumps over the lazy dog every single day"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_export_dedups_filters_and_lands_partitioned(spark, tmp_path):
    rows = [
        (1, DOC),
        (2, DOC),                      # exact dup of 1 — must not export
        (3, "too short"),              # under the 10-token floor
        (4, DOC + " with an extra tail of tokens appended here"),
    ]
    out = run_training_export(
        spark, _docs(spark, rows), str(tmp_path), n_shards=4
    ).collect()

    # survivors: doc 1 (min id of the dup pair) and doc 4
    assert sum(r.n_docs for r in out) == 2
    # manifest totals recomputed from round-tripped text
    tok = {True: 12, False: 20}  # DOC has 12 tokens; doc 4 has 20
    assert sum(r.n_tokens for r in out) == tok[True] + tok[False]

    # on-disk layout: split=<s>/shard=<n> partition dirs, JSON files
    parts = glob.glob(str(tmp_path / "shards" / "split=*" / "shard=*"))
    assert parts, "export must land partitioned by (split, shard)"
    data = glob.glob(str(tmp_path / "shards" / "split=*" / "shard=*" / "*"))
    assert any(f.endswith(".json") for f in data)


def test_export_assignment_is_deterministic_and_disjoint(spark, tmp_path):
    docs = _docs(
        spark,
        [(i, f"document number {i} padded with enough filler tokens "
              "to clear the quality floor easily") for i in range(200)],
    )
    a = sorted(
        map(tuple, run_training_export(
            spark, docs, str(tmp_path / "a")
        ).collect())
    )
    b = sorted(
        map(tuple, run_training_export(
            spark, docs, str(tmp_path / "b")
        ).collect())
    )
    assert a == b  # same corpus -> identical manifest, any run/dir
    total = sum(t[2] for t in a)
    assert total == 200  # every doc in exactly one (split, shard) cell
    splits = {t[0] for t in a}
    assert splits <= {"train", "val", "test"}
    shards = {t[1] for t in a}
    assert shards <= set(range(4))


def test_training_export_compressed_manifest_equals_plain(spark, tmp_path):
    """compression= changes the shard bytes, never the data: the
    read-back manifest from a gzip export equals the plain export's
    manifest exactly, and the shard files carry the codec suffix."""
    import glob as g

    from etl_project_gcp_spark.plans.export import run_training_export

    docs = spark.range(300).selectExpr(
        "id AS doc_id",
        "concat('document body number ', id, ' with clearly more than ten whitespace tokens of text') AS text",
    )
    plain = sorted(map(tuple, run_training_export(
        spark, docs, str(tmp_path / "plain")).collect()))
    gz = sorted(map(tuple, run_training_export(
        spark, docs, str(tmp_path / "gz"), compression="gzip").collect()))
    assert plain == gz
    parts = g.glob(f"{tmp_path}/gz/shards/*/*/part-*")
    assert parts and all(p.endswith(".gz") for p in parts)


def test_training_export_empty_survivor_set_raises_named_error(
    spark, tmp_path
):
    """A quality floor that removes every document must fail with an
    error naming the cause, not an unresolved-column AnalysisException
    from the manifest's partition discovery."""
    import pytest

    from etl_project_gcp_spark.plans.export import run_training_export

    docs = spark.range(20).selectExpr(
        "id AS doc_id", "'too short' AS text"
    )
    with pytest.raises(ValueError, match="ZERO surviving"):
        run_training_export(spark, docs, str(tmp_path / "empty"))
