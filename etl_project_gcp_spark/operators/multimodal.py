"""Multimodal column plumbing (driver mandate — BASELINE.json north_star).

Treats image/audio/video payloads as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` — the real
100 TB pattern: bytes never leave the executor, Python sees columnar
batches, and the output schema is pinned so Catalyst plans around it.

The media codecs (PIL/librosa/av) are NOT in this container, so the
decode step is STUBBED: ``decode_stub=True`` (default) derives
deterministic fake dimensions from the payload bytes; ``False`` raises
NotImplementedError where a real decoder would be called. Everything
around the decode — schema, batch iteration, partitioning, metadata
struct — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "id bigint, n_bytes int, sha256 string, format string, width int, height int"
)


def attach_binary(df: DataFrame, src_col: str, out_col: str = "content") -> DataFrame:
    """Materialize an opaque binary payload column (here from a string
    column; in production from ``spark.read.format('binaryFile')``)."""
    return df.withColumn(out_col, F.col(src_col).cast("binary"))


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Binary file source: (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic FAKE media decode (container has no codec libs).
    Derives a pseudo format/width/height from the payload bytes so tests
    are stable. Replace with PIL/av in a real deployment."""
    if not payload:
        return ("empty", 0, 0)
    fmt = ("jpeg", "png", "webp")[payload[0] % 3]
    width = 16 * (1 + payload[0] % 64)
    height = 16 * (1 + (payload[-1] if len(payload) > 1 else payload[0]) % 64)
    return (fmt, width, height)


def extract_media_meta(
    df: DataFrame,
    id_col: str = "id",
    content_col: str = "content",
    decode_stub: bool = True,
) -> DataFrame:
    """Per-payload metadata via Arrow-batched mapInPandas: byte length,
    sha256, and (stub-)decoded format/dimensions."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[content_col]):
                b = bytes(payload) if payload is not None else b""
                if decode_stub:
                    fmt, w, h = _fake_decode(b)
                else:
                    raise NotImplementedError(
                        "real media decode requires PIL/av — not in this container"
                    )
                rows.append(
                    {
                        "id": int(_id),
                        "n_bytes": len(b),
                        "sha256": hashlib.sha256(b).hexdigest(),
                        "format": fmt,
                        "width": w,
                        "height": h,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "n_bytes", "sha256", "format", "width", "height"],
            )

    return df.select(id_col, content_col).mapInPandas(featurize, MEDIA_META_SCHEMA)


RESIZED_SCHEMA = "id bigint, resized binary, width int, height int"


def resize_images(
    df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    id_col: str = "id",
    content_col: str = "content",
    decode_stub: bool = True,
) -> DataFrame:
    """Image-resize PLUMBING (the preprocessing step in front of every
    vision encoder): Arrow-batched ``mapInPandas``, binary in → binary
    out with pinned (id, resized, width, height) schema, so the rewrite
    runs embarrassingly parallel over the scan with no shuffle. The
    pixel work is STUBBED (no PIL in this container): the fake "resize"
    emits a deterministic digest-derived payload of len ∝ target area;
    a real deployment swaps `_fake_resize` for PIL/cv2 inside the same
    batch loop — the Spark plan does not change."""

    def _fake_resize(b: bytes) -> bytes:
        if not b:
            return b""
        seed = hashlib.sha256(b).digest()
        need = max(1, (target_w * target_h) // 64)
        return (seed * (need // len(seed) + 1))[:need]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[content_col]):
                b = bytes(payload) if payload is not None else b""
                if not decode_stub:
                    raise NotImplementedError(
                        "real image resize requires PIL/cv2 — not in this container"
                    )
                rows.append(
                    {
                        "id": int(_id),
                        "resized": _fake_resize(b),
                        "width": target_w,
                        "height": target_h,
                    }
                )
            yield pd.DataFrame(rows, columns=["id", "resized", "width", "height"])

    return df.select(id_col, content_col).mapInPandas(run, RESIZED_SCHEMA)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "id",
    content_col: str = "content",
    decode_stub: bool = True,
) -> DataFrame:
    """Feature extraction PLUMBING (binary → embedding): emits a pinned
    ``array<float>`` column per payload, the handoff between multimodal
    ingest and the vector operators (operators/vector.py consumes the
    output unchanged — integration-tested). The encoder is STUBBED with
    a deterministic digest-derived unit vector; a real deployment runs
    the model inside the same Arrow batch loop (optionally batching to
    the GPU per pandas batch), same schema, same plan."""

    def _fake_embed(b: bytes) -> list[float]:
        seed = hashlib.sha256(b).digest()
        raw = [(seed[i % len(seed)] - 127.5) / 127.5 for i in range(dim)]
        nrm = sum(x * x for x in raw) ** 0.5 or 1.0
        return [x / nrm for x in raw]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[content_col]):
                b = bytes(payload) if payload is not None else b""
                if not decode_stub:
                    raise NotImplementedError(
                        "real feature extraction requires a vision/audio model"
                    )
                rows.append({"id": int(_id), "embedding": _fake_embed(b)})
            yield pd.DataFrame(rows, columns=["id", "embedding"])

    return df.select(id_col, content_col).mapInPandas(
        run, "id bigint, embedding array<float>"
    )


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "id",
    content_col: str = "content",
    every_n: int = 10,
) -> DataFrame:
    """Video frame-sampling PLUMBING: emits one row per sampled frame
    index with the parent payload hash — the decode itself is stubbed
    (frame count faked from byte length). Shows the explode shape a real
    frame sampler would produce."""
    n_frames = (F.length(F.col(content_col)) / 100).cast("int") + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(
        F.col(id_col),
        F.sha2(F.col(content_col), 256).alias("payload_sha256"),
        F.explode(idx).alias("frame_index"),
    )
