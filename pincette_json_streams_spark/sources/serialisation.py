"""Wire-format serialisation: gzip-compressed CBOR with string fallback
(/root/reference/docs/serialisation.md — messages are RFC-1952-gzipped
RFC-8949 CBOR; the deserialiser falls back to a plain string when the
payload isn't gzip-CBOR; producers can opt into string output with the
stream-part field ``toString``).

The codec is a self-contained RFC 8949 subset covering exactly the JSON
data model (null, bool, int, float, text string, array, map) — nothing
else crosses this engine's wire.  Spark-side, encoding/decoding are Arrow
``pandas_udf``s over binary/string columns so serialisation runs
batch-vectorized in the executors, never on the driver.
"""

from __future__ import annotations

import gzip
import io
import json
import struct
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "cbor_dumps", "cbor_loads", "encode_message", "decode_message",
    "encode_col", "decode_col",
]

_MAJOR_UINT, _MAJOR_NINT, _MAJOR_BYTES, _MAJOR_TEXT = 0, 1, 2, 3
_MAJOR_ARRAY, _MAJOR_MAP, _MAJOR_TAG, _MAJOR_SIMPLE = 4, 5, 6, 7


def _head(out: io.BytesIO, major: int, arg: int) -> None:
    mt = major << 5
    if arg < 24:
        out.write(bytes([mt | arg]))
    elif arg < 0x100:
        out.write(bytes([mt | 24, arg]))
    elif arg < 0x10000:
        out.write(bytes([mt | 25]) + arg.to_bytes(2, "big"))
    elif arg < 0x100000000:
        out.write(bytes([mt | 26]) + arg.to_bytes(4, "big"))
    else:
        out.write(bytes([mt | 27]) + arg.to_bytes(8, "big"))


def _encode(out: io.BytesIO, v: Any) -> None:
    if v is None:
        out.write(b"\xf6")
    elif v is True:
        out.write(b"\xf5")
    elif v is False:
        out.write(b"\xf4")
    elif isinstance(v, int):
        if v >= 0:
            _head(out, _MAJOR_UINT, v)
        else:
            _head(out, _MAJOR_NINT, -1 - v)
    elif isinstance(v, float):
        out.write(b"\xfb" + struct.pack(">d", v))
    elif isinstance(v, str):
        b = v.encode("utf-8")
        _head(out, _MAJOR_TEXT, len(b))
        out.write(b)
    elif isinstance(v, (bytes, bytearray)):
        _head(out, _MAJOR_BYTES, len(v))
        out.write(v)
    elif isinstance(v, (list, tuple)):
        _head(out, _MAJOR_ARRAY, len(v))
        for x in v:
            _encode(out, x)
    elif isinstance(v, dict):
        _head(out, _MAJOR_MAP, len(v))
        for k, x in v.items():
            _encode(out, str(k))
            _encode(out, x)
    else:
        raise TypeError(f"CBOR: unsupported type {type(v).__name__}")


def cbor_dumps(v: Any) -> bytes:
    out = io.BytesIO()
    _encode(out, v)
    return out.getvalue()


def _read_arg(b: memoryview, i: int, info: int) -> tuple[int, int]:
    if info < 24:
        return info, i
    if info == 24:
        return b[i], i + 1
    if info == 25:
        return int.from_bytes(b[i:i + 2], "big"), i + 2
    if info == 26:
        return int.from_bytes(b[i:i + 4], "big"), i + 4
    if info == 27:
        return int.from_bytes(b[i:i + 8], "big"), i + 8
    raise ValueError(f"CBOR: unsupported additional info {info}")


def _decode(b: memoryview, i: int) -> tuple[Any, int]:
    first = b[i]
    i += 1
    major, info = first >> 5, first & 0x1F
    if major == _MAJOR_UINT:
        return _read_arg(b, i, info)
    if major == _MAJOR_NINT:
        n, i = _read_arg(b, i, info)
        return -1 - n, i
    if major == _MAJOR_BYTES:
        n, i = _read_arg(b, i, info)
        return bytes(b[i:i + n]), i + n
    if major == _MAJOR_TEXT:
        n, i = _read_arg(b, i, info)
        return bytes(b[i:i + n]).decode("utf-8"), i + n
    if major == _MAJOR_ARRAY:
        n, i = _read_arg(b, i, info)
        out = []
        for _ in range(n):
            v, i = _decode(b, i)
            out.append(v)
        return out, i
    if major == _MAJOR_MAP:
        n, i = _read_arg(b, i, info)
        m = {}
        for _ in range(n):
            k, i = _decode(b, i)
            v, i = _decode(b, i)
            m[k] = v
        return m, i
    if major == _MAJOR_TAG:  # skip tags, decode the tagged value
        _, i = _read_arg(b, i, info)
        return _decode(b, i)
    # simple / float
    if info == 20:
        return False, i
    if info == 21:
        return True, i
    if info in (22, 23):
        return None, i
    if info == 25:  # half float
        h = int.from_bytes(b[i:i + 2], "big")
        return _half_to_float(h), i + 2
    if info == 26:
        return struct.unpack(">f", b[i:i + 4])[0], i + 4
    if info == 27:
        return struct.unpack(">d", b[i:i + 8])[0], i + 8
    raise ValueError(f"CBOR: unsupported simple value {info}")


def _half_to_float(h: int) -> float:
    sign = -1.0 if h & 0x8000 else 1.0
    exp = (h >> 10) & 0x1F
    frac = h & 0x3FF
    if exp == 0:
        return sign * frac * 2.0 ** -24
    if exp == 31:
        return sign * (float("inf") if frac == 0 else float("nan"))
    return sign * (1 + frac / 1024.0) * 2.0 ** (exp - 15)


def cbor_loads(data: bytes) -> Any:
    v, end = _decode(memoryview(data), 0)
    if end != len(data):
        raise ValueError("CBOR: trailing bytes")
    return v


def encode_message(doc: Any) -> bytes:
    """document -> gzip(CBOR) wire bytes."""
    return gzip.compress(cbor_dumps(doc), mtime=0)


def decode_message(data: bytes) -> Any:
    """Wire bytes -> document; non-gzip-CBOR payloads fall back to the
    string serialisation (docs/serialisation.md: the deserialiser 'will
    fall back to a string serialisation when that fails')."""
    try:
        return cbor_loads(gzip.decompress(data))
    except Exception:
        return data.decode("utf-8", errors="replace")


def encode_col(json_col: Column) -> Column:
    """JSON-string column -> gzip-CBOR binary column (Arrow-batched)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def enc(s):
        return s.map(
            lambda js: None if js is None
            else encode_message(json.loads(js))
        )

    return enc(json_col)


def decode_col(bin_col: Column) -> Column:
    """gzip-CBOR binary column -> JSON-string column, with the string
    fallback for foreign payloads."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def dec(s):
        def one(b):
            if b is None:
                return None
            v = decode_message(bytes(b))
            return v if isinstance(v, str) else json.dumps(v)
        return s.map(one)

    return dec(bin_col)
