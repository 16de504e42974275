"""Worked ``register_codec`` example: uncompressed YUV4MPEG2 (Y4M).

The built-in video decoders cover MJPEG-in-AVI and animated GIF
(``multimodal.sample_frames``).  Real-world codec containers
(H.264/MP4, VP9/WebM) need a real decoder library, which this engine
deliberately does not bundle — instead
``register_codec(name, probe, frames)`` plugs one into
``sample_frames`` / ``video_fingerprint`` / ``video_near_pairs`` /
``$videoNearDups``.  This module is the runnable reference
implementation of that seam for a REAL public format that needs no
external library: ``y4m_probe`` sniffs the container magic,
``y4m_frames`` demuxes every frame and converts its luma plane to a
standalone 24-bit BMP — an image payload the built-in image decoders
read, which is the whole codec contract:

    probe(data: bytes) -> bool          # container sniff, cheap
    frames(data: bytes) -> list[bytes]  # standalone decodable stills

For H.264/MP4, keep this module's shape and swap the body of
``frames`` for a real decoder (e.g. PyAV in your executor image)::

    def mp4_probe(data: bytes) -> bool:
        return len(data) > 11 and data[4:8] == b"ftyp"

    def mp4_frames(data: bytes) -> list[bytes]:
        import io

        import av  # imported INSIDE the callable: it runs on executors

        out = []
        with av.open(io.BytesIO(data)) as c:
            for frame in c.decode(video=0):
                buf = io.BytesIO()
                frame.to_image().save(buf, format="PNG")
                out.append(buf.getvalue())
        return out

    register_codec("mp4", mp4_probe, mp4_frames)

Both callables ship to executors inside the Arrow UDF closure
(cloudpickle), so they must be self-contained: import decoder
libraries inside the function body, carry no driver-only state, and
return [] (not raise) on undecodable payloads — absence is the
honest signal, same as the built-ins.

Y4M spec (public): ``YUV4MPEG2 <params>\\n`` stream header with
``W<width> H<height> ... C<colourspace>`` parameters, then per frame
``FRAME<params>\\n`` followed by the raw planar payload (Y then U
then V; plane sizes from the colourspace).
"""

from __future__ import annotations

import struct

_Y4M_MAGIC = b"YUV4MPEG2 "

# chroma plane size in bytes, by colourspace tag prefix
# (C420jpeg/C420paldv/C420mpeg2 all subsample 2x2).  Subsampled
# dimensions round UP per the Y4M/YUV convention — ceil(w/2)*ceil(h/2)
# for 4:2:0 — so spec-valid odd-dimension streams demux aligned
# (a floor-based w*h*frac undersizes the plane, e.g. W9 H8 C420 is
# 20 bytes/plane, not 18, and truncates every later frame).
_CHROMA_PLANE = {
    b"420": lambda w, h: ((w + 1) // 2) * ((h + 1) // 2),
    b"422": lambda w, h: ((w + 1) // 2) * h,
    b"444": lambda w, h: w * h,
    b"mono": lambda w, h: 0,
}


def y4m_probe(data: bytes) -> bool:
    """Container sniff: the Y4M stream magic."""
    return data.startswith(_Y4M_MAGIC)


def _gray_bmp(y: bytes, w: int, h: int) -> bytes:
    """Wrap a luma plane as a standalone 24-bit BMP (r=g=b=Y) — the
    still-image payload the built-in BMP decoder reads.  Bottom-up
    row order per the BMP spec, rows padded to 4 bytes."""
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    rows = []
    for row in range(h - 1, -1, -1):
        line = y[row * w:(row + 1) * w]
        rows.append(bytes(v for px in line for v in (px, px, px)) + pad)
    body = b"".join(rows)
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    return header + dib + body


def y4m_frames(data: bytes) -> list:
    """Demux an uncompressed Y4M stream into one 24-bit grayscale BMP
    per frame (luma plane only — chroma is skipped, which is exactly
    what the dHash fingerprint would discard anyway).  Returns [] on
    malformed payloads — honest absence, never garbage frames."""
    try:
        nl = data.index(b"\n")
    except ValueError:
        return []
    w = h = None
    plane = _CHROMA_PLANE[b"420"]  # C420 is the Y4M default colourspace
    for param in data[len(_Y4M_MAGIC):nl].split(b" "):
        if param.startswith(b"W"):
            w = int(param[1:])
        elif param.startswith(b"H"):
            h = int(param[1:])
        elif param.startswith(b"C"):
            for tag, fn in _CHROMA_PLANE.items():
                if param[1:].startswith(tag):
                    plane = fn
                    break
    if not w or not h or w * h > 1 << 26:
        return []
    y_size = w * h
    frame_size = y_size + 2 * plane(w, h)
    frames = []
    pos = nl + 1
    while data.startswith(b"FRAME", pos):
        try:
            fnl = data.index(b"\n", pos)
        except ValueError:
            break
        body = fnl + 1
        if body + frame_size > len(data):
            break
        frames.append(_gray_bmp(data[body:body + y_size], w, h))
        pos = body + frame_size
    return frames
