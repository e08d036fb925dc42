"""Stdlib media codecs for the multimodal operators (no PIL/cv2/av in
this container — everything here is ``zlib`` + ``struct`` + ``wave``).

These are REAL decoders, not stubs: the PNG path parses chunks,
inflates IDAT, reverses all five scanline filters, and re-encodes a
spec-valid file; the WAV path reads genuine RIFF headers via the
stdlib ``wave`` module. They exist so the Spark-side multimodal
plumbing (operators/multimodal.py — Arrow batches, pinned schemas,
shuffle-free mapInPandas) can be exercised end-to-end with payloads
that an external tool can independently open.

Scale note: pixel work is pure Python, so it is the slow path by
construction — fine for fixtures and correctness tests. In production
the SAME call sites swap in PIL/cv2 inside the same batch loop; the
Spark plan (scan → mapInPandas, no shuffle) does not change, which is
the part that matters at 100 TB.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# --- PNG ------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode an RGB pixel matrix (rows of (r, g, b)) as an 8-bit
    truecolor PNG: IHDR + one zlib IDAT of filter-0 scanlines + IEND."""
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    for row in pixels:
        raw.append(0)  # filter type 0 (None) per scanline
        for r, g, b in row:
            raw += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode an 8-bit truecolor (color type 2) PNG: walk chunks, read
    IHDR, inflate the concatenated IDAT stream, reverse scanline filters
    0-4. Returns (width, height, pixel rows)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width, height, idat = 8, 0, 0, bytearray()
    bit_depth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", payload[:10]
            )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if bit_depth != 8 or color_type != 2:
        raise NotImplementedError(
            f"only 8-bit truecolor PNG supported (got depth={bit_depth}, "
            f"color_type={color_type})"
        )
    raw = zlib.decompress(bytes(idat))
    stride, bpp = width * 3, 3
    rows: list[list[tuple[int, int, int]]] = []
    prev = bytearray(stride)
    for y in range(height):
        base = y * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        rows.append(
            [tuple(line[x * 3 : x * 3 + 3]) for x in range(width)]
        )
        prev = line
    return width, height, rows


def png_meta(data: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR without inflating pixel data —
    the metadata-only fast path."""
    if data[:8] != _PNG_SIG or data[12:16] != b"IHDR":
        raise ValueError("not a PNG payload")
    return struct.unpack(">II", data[16:24])


def png_resize_nearest(data: bytes, target_w: int, target_h: int) -> bytes:
    """Real resize: decode → nearest-neighbor resample → re-encode."""
    w, h, rows = png_decode(data)
    out = [
        [rows[(y * h) // target_h][(x * w) // target_w] for x in range(target_w)]
        for y in range(target_h)
    ]
    return png_encode(out)


# --- WAV ------------------------------------------------------------------

def wav_encode(
    samples: bytes, n_channels: int = 1, sampwidth: int = 2, framerate: int = 8000
) -> bytes:
    """PCM WAV via the stdlib ``wave`` writer."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(n_channels)
        wv.setsampwidth(sampwidth)
        wv.setframerate(framerate)
        wv.writeframes(samples)
    return buf.getvalue()


def wav_meta(data: bytes) -> tuple[int, int, int, int]:
    """(n_channels, sampwidth_bytes, framerate, n_frames) via the
    stdlib ``wave`` reader — a real RIFF parse, not a sniff."""
    with wave.open(io.BytesIO(data), "rb") as wv:
        return (
            wv.getnchannels(),
            wv.getsampwidth(),
            wv.getframerate(),
            wv.getnframes(),
        )


# --- Sniffing -------------------------------------------------------------

def sniff_format(data: bytes) -> str:
    """Magic-byte format id for the formats this module can decode."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"
