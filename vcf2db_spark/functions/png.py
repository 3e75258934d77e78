"""Pure-numpy PNG codec (8-bit, non-interlaced) — stdlib zlib + numpy.

Closes the PNG entry on the entropy-coded-media boundary the same way
functions/jpeg.py closed baseline JPEG (r6): PNG's entropy layer is
DEFLATE, which the standard library ships, so the remaining work is
chunk framing and the five scanline filters. Supported: bit depth 8,
color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
interlace 0. Honest ``NotImplementedError`` for 1/2/4/16-bit depths and
Adam7 interlace (rare in pipeline data; PIL-class scope).

Decode vectorization: the row loop is irreducible (filters chain rows),
but within a row every filter is lane-vectorized — Sub is an exact
per-lane ``cumsum % 256`` (mod-256 addition is linear, so the serial
recurrence collapses), Up is one vector add, Average/Paeth walk pixels
with all channels as one numpy lane op. Encode uses filter 0 + zlib —
spec-compliant and byte-exact on round trip (PNG is lossless).

The mapInArrow media pipeline (functions/media_codecs.py) dispatches
here on the PNG signature; per-file costs stay inside one Arrow batch.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(blob: bytes):
    pos = 8
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a pixel's byte lanes (int16 in)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(blob: bytes) -> np.ndarray:
    """PNG bytes → (h, w, c) uint8 cube (palette expanded, c ∈ {1,2,3,4})."""
    if blob[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    depth = ctype = interlace = None
    palette = None
    idat = bytearray()
    for tag, data in _chunks(blob):
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif tag == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG not supported (8 only)")
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {ctype} not supported")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    ch = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = 1 + width * ch
    if raw.size != stride * height:
        raise ValueError("PNG IDAT size mismatch")
    rows = raw.reshape(height, stride)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int16)  # headroom for predictor sums
    out = np.zeros((height, width * ch), np.int16)
    prior = np.zeros(width * ch, np.int16)
    for y in range(height):
        f, line = int(filters[y]), data[y]
        if f == 0:  # None
            rec = line.copy()
        elif f == 2:  # Up
            rec = (line + prior) & 0xFF
        elif f == 1:  # Sub: per-lane mod-256 cumsum collapses the chain
            rec = np.cumsum(
                line.reshape(width, ch).astype(np.int64), axis=0
            ) % 256
            rec = rec.reshape(-1).astype(np.int16)
        elif f == 3:  # Average (serial in x; channels vectorized)
            rec = np.empty_like(line)
            pr = prior.reshape(width, ch)
            ln = line.reshape(width, ch)
            rc = rec.reshape(width, ch)
            left = np.zeros(ch, np.int16)
            for x in range(width):
                left = (ln[x] + ((left + pr[x]) >> 1)) & 0xFF
                rc[x] = left
        elif f == 4:  # Paeth (serial in x; channels vectorized)
            rec = np.empty_like(line)
            pr = prior.reshape(width, ch)
            ln = line.reshape(width, ch)
            rc = rec.reshape(width, ch)
            left = np.zeros(ch, np.int16)
            upleft = np.zeros(ch, np.int16)
            for x in range(width):
                left = (ln[x] + _paeth(left, pr[x], upleft)) & 0xFF
                upleft = pr[x]
                rc[x] = left
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prior = rec
    cube = out.astype(np.uint8).reshape(height, width, ch)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        cube = palette[cube[:, :, 0]]
    return cube


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, c) uint8 cube → PNG bytes (filter 0, one IDAT)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    scan = np.zeros((h, 1 + w * c), np.uint8)
    scan[:, 1:] = arr.reshape(h, w * c)
    idat = zlib.compress(scan.tobytes(), 6)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
