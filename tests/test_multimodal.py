"""Multimodal plumbing tests: binary columns, Arrow batch featurize,
frame-sample explode shape. Decode itself is stubbed (no codec libs)."""

from __future__ import annotations

import hashlib

import pytest

from etl_project_gcp_spark.operators import multimodal as MM


def test_extract_media_meta_schema_and_values(spark):
    df = spark.createDataFrame([(1, "hello"), (2, ""), (3, "wörld")], ["id", "txt"])
    out = MM.extract_media_meta(MM.attach_binary(df, "txt"), "id", "content").collect()
    by_id = {r.id: r for r in out}
    assert by_id[1].n_bytes == 5
    assert by_id[1].sha256 == hashlib.sha256(b"hello").hexdigest()
    assert by_id[2].n_bytes == 0 and by_id[2].format == "empty"
    assert by_id[3].n_bytes == len("wörld".encode())  # utf-8 aware
    assert by_id[1].format in ("jpeg", "png", "webp")
    assert by_id[1].width > 0 and by_id[1].height > 0


def test_decode_stub_off_raises(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "txt"])
    meta = MM.extract_media_meta(
        MM.attach_binary(df, "txt"), "id", "content", decode_stub=False
    )
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        meta.collect()


def test_frame_sample_plan_shape(spark):
    df = spark.createDataFrame([(1, "a" * 450)], ["id", "txt"])
    rows = MM.frame_sample_plan(
        MM.attach_binary(df, "txt"), "id", "content", every_n=2
    ).collect()
    # 450 bytes -> 5 fake frames -> sampled indices 0,2,4
    assert [r.frame_index for r in rows] == [0, 2, 4]
    assert all(r.payload_sha256 == hashlib.sha256(b"a" * 450).hexdigest() for r in rows)
