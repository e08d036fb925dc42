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


def test_resize_images_schema_and_determinism(spark):
    df = spark.createDataFrame([(1, "payload-one"), (2, "")], ["id", "txt"])
    out = MM.resize_images(
        MM.attach_binary(df, "txt"), target_w=64, target_h=32
    )
    assert [f.simpleString() for f in out.schema.fields] == [
        "id:bigint", "resized:binary", "width:int", "height:int",
    ]
    rows = {r.id: r for r in out.collect()}
    assert rows[1].width == 64 and rows[1].height == 32
    assert len(bytes(rows[1].resized)) == (64 * 32) // 64
    assert bytes(rows[2].resized) == b""
    # deterministic across runs
    again = {r.id: bytes(r.resized) for r in out.collect()}
    assert again[1] == bytes(rows[1].resized)


def test_extract_features_feeds_vector_topk(spark):
    """The multimodal→similarity handoff: stub embeddings from binary
    payloads flow into the vector operators unchanged."""
    from etl_project_gcp_spark.operators import vector as VX

    docs = spark.createDataFrame(
        [(i, f"payload-{i % 4}") for i in range(20)], ["id", "txt"]
    )
    emb = MM.extract_features(MM.attach_binary(docs, "txt"), dim=16)
    assert dict(emb.dtypes)["embedding"] == "array<float>"
    # unit-norm stub vectors
    import math

    v = emb.filter("id = 0").collect()[0].embedding
    assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-5)
    topk = VX.brute_force_topk(
        emb, emb.filter("id < 2"), k=3, id_col="id", vec_col="embedding"
    ).collect()
    assert len(topk) == 2 * 3
    # id 0 and id 4 share payload "payload-0" -> identical stub vectors,
    # so the top neighbor of query 0 is an exact match at cosine 1.0
    top0 = [r for r in topk if r.query_id == 0 and r.rk == 1][0]
    assert top0.cosine == 1.0 and top0.neighbor_id in (4, 8, 12, 16)
