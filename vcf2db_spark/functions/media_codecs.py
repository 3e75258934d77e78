"""Pure-numpy media codecs for the multimodal tier (SURVEY.md §2C C6).

The container ships no PIL/ffmpeg, so the decodable surface is the set of
formats a few hundred lines of numpy can parse exactly:

- **PPM/PGM** (netpbm P6/P5, binary, maxval 255): header is ASCII tokens
  (magic, width, height, maxval) with ``#`` comments, then raw samples.
- **BMP** (Windows V3 ``BITMAPINFOHEADER``, uncompressed ``BI_RGB``,
  24-bit or 8-bit grayscale-palette): little-endian header, BGR order,
  rows bottom-up and padded to 4 bytes.
- **WAV** (RIFF PCM, 8-bit unsigned or 16-bit signed, any channel
  count): chunked container; audio surfaces as an (n_samples, 1,
  channels) uint8 cube (16-bit is mapped to its high byte) so every
  downstream stage works on one array shape.
- **FAKE** — this repo's deterministic test container
  (``b"FAKE" | u16 w | u16 h | u8 c | payload``), kept as the
  seed-stable fixture codec.

- **JPEG** (baseline sequential + progressive DCT, 8-bit Huffman,
  JFIF): implemented in-repo (functions/jpeg.py, r6 baseline + r7
  progressive) — grayscale or YCbCr with power-of-two sampling
  factors, restart markers honored, SOF2 spectral selection and
  successive approximation decoded; arithmetic/12-bit still raise.

Anything else (WebP/MP4/AVIF…) raises
``NotImplementedError`` — those genuinely need external libraries, and
pretending otherwise would be a silent-wrong-answer factory.

All functions are plain bytes→numpy (no Spark imports): they run inside
Arrow-batched ``mapInPandas`` stages (functions/multimodal.py) where the
per-row work is pure CPU on in-memory buffers.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "sniff",
    "decode",
    "encode",
    "encode_ppm",
    "encode_bmp",
    "encode_wav",
    "encode_fake",
]


def sniff(blob: bytes) -> str:
    """Return the container format tag for ``blob`` ('' if unknown)."""
    if blob[:4] == b"FAKE":
        return "fake"
    if blob[:2] in (b"P6", b"P5"):
        return "ppm"
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return ""


# ---------------------------------------------------------------------------
# FAKE (test container)
# ---------------------------------------------------------------------------


def encode_fake(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    return b"FAKE" + struct.pack("<HHB", w, h, c) + arr.astype(np.uint8).tobytes()


def _decode_fake(blob: bytes) -> np.ndarray:
    w, h, c = struct.unpack("<HHB", blob[4:9])
    arr = np.frombuffer(blob[9 : 9 + w * h * c], dtype=np.uint8)
    return arr.reshape(h, w, c)


# ---------------------------------------------------------------------------
# PPM / PGM (netpbm binary)
# ---------------------------------------------------------------------------


def _pnm_tokens(blob: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` ASCII integer tokens after the magic, skipping whitespace
    and '#' comments; returns (values, offset_past_single_ws)."""
    vals: list[int] = []
    i = 2  # past magic
    while len(vals) < n:
        ch = blob[i : i + 1]
        if ch.isspace():
            i += 1
        elif ch == b"#":
            while blob[i : i + 1] not in (b"\n", b""):
                i += 1
        elif ch.isdigit():
            j = i
            while blob[j : j + 1].isdigit():
                j += 1
            vals.append(int(blob[i:j]))
            i = j
        else:
            raise ValueError(f"bad PNM header byte {ch!r} at {i}")
    return vals, i + 1  # exactly one whitespace separates header from raster


def encode_ppm(arr: np.ndarray) -> bytes:
    """P6 for 3-channel, P5 (PGM) for 1-channel uint8 cubes."""
    h, w, c = arr.shape
    if c == 3:
        magic = b"P6"
    elif c == 1:
        magic = b"P5"
    else:
        raise ValueError(f"PPM/PGM supports 1 or 3 channels, got {c}")
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def _decode_ppm(blob: bytes) -> np.ndarray:
    c = 3 if blob[:2] == b"P6" else 1
    (w, h, maxval), off = _pnm_tokens(blob, 3)
    if maxval != 255:
        raise NotImplementedError(f"only maxval=255 PNM supported, got {maxval}")
    need = w * h * c
    arr = np.frombuffer(blob[off : off + need], dtype=np.uint8)
    if arr.size != need:
        raise ValueError(f"PNM raster truncated: {arr.size} of {need} bytes")
    return arr.reshape(h, w, c)


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, BI_RGB, 24-bit BGR or 8-bit palette grayscale)
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit BI_RGB for 3-channel input, 8-bit gray-palette for 1-channel."""
    h, w, c = arr.shape
    arr = arr.astype(np.uint8)
    if c == 3:
        bpp, palette = 24, b""
        row = arr[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    elif c == 1:
        bpp = 8
        palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
        row = arr.reshape(h, w)
    else:
        raise ValueError(f"BMP encoder supports 1 or 3 channels, got {c}")
    stride = (row.shape[1] + 3) // 4 * 4
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : row.shape[1]] = row
    raster = padded[::-1].tobytes()  # bottom-up
    data_off = 14 + 40 + len(palette)
    header = struct.pack(
        "<2sIHHI", b"BM", data_off + len(raster), 0, 0, data_off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(raster), 2835, 2835, 0, 0)
    return header + palette + raster


def _decode_bmp(blob: bytes) -> np.ndarray:
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", blob, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    planes, bpp, compression = struct.unpack_from("<HHI", blob, 26)
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (type {compression}) not supported")
    top_down = h < 0
    h = abs(h)
    if bpp == 24:
        stride = (w * 3 + 3) // 4 * 4
        raster = np.frombuffer(blob[data_off : data_off + stride * h], dtype=np.uint8)
        rows = raster.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        out = rows[:, :, ::-1]  # BGR -> RGB
    elif bpp == 8:
        # palette lives between header and raster; map indices through it,
        # then keep a 1-channel cube if the palette is grayscale. Size the
        # palette from biClrUsed (offset 46) — external BMPs with
        # biClrUsed < 256 ship a short palette, and a fixed 1024-byte
        # slice would bleed into raster bytes — and clamp to data_off.
        clr_used = struct.unpack_from("<I", blob, 46)[0] if hdr_size >= 36 else 0
        n_colors = clr_used or 256
        pal_start = 14 + hdr_size
        pal_end = min(pal_start + 4 * n_colors, data_off)
        pal = np.frombuffer(blob[pal_start:pal_end], dtype=np.uint8)
        pal = pal.reshape(-1, 4)[:, :3][:, ::-1]  # BGRA -> RGB
        stride = (w + 3) // 4 * 4
        raster = np.frombuffer(blob[data_off : data_off + stride * h], dtype=np.uint8)
        idx = raster.reshape(h, stride)[:, :w]
        rgb = pal[idx]
        if np.all(rgb[:, :, 0] == rgb[:, :, 1]) and np.all(rgb[:, :, 1] == rgb[:, :, 2]):
            out = rgb[:, :, :1]
        else:
            out = rgb
    else:
        raise NotImplementedError(f"{bpp}-bit BMP not supported")
    return np.ascontiguousarray(out if top_down else out[::-1])


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """``samples``: (n_samples, channels) — int16 when bits=16 (uint8 cubes
    are expanded via ``(x-128)<<8``), uint8 when bits=8."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if bits == 16:
        if samples.dtype == np.uint8:
            samples = ((samples.astype(np.int16) - 128) << 8).astype(np.int16)
        data = samples.astype("<i2").tobytes()
    elif bits == 8:
        data = samples.astype(np.uint8).tobytes()
    else:
        raise ValueError(f"WAV encoder supports 8/16-bit, got {bits}")
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _decode_wav(blob: bytes) -> np.ndarray:
    """Surface PCM audio as an (n_samples, 1, channels) uint8 cube: 8-bit
    passes through; 16-bit keeps its high byte offset to unsigned — a
    lossy-but-monotone view that keeps one array shape for every stage."""
    i = 12
    fmt = data = None
    while i + 8 <= len(blob):
        cid, size = blob[i : i + 4], struct.unpack_from("<I", blob, i + 4)[0]
        body = blob[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, _rate, _bps, _block, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"non-PCM WAV (format {audio_format}) not supported")
    if bits == 16:
        s16 = np.frombuffer(data, dtype="<i2")
        arr = ((s16.astype(np.int32) >> 8) + 128).astype(np.uint8)
    elif bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8)
    else:
        raise NotImplementedError(f"{bits}-bit WAV not supported")
    n = arr.size // ch
    return arr[: n * ch].reshape(n, 1, ch)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def _decode_jpeg(blob: bytes) -> np.ndarray:
    from vcf2db_spark.functions.jpeg import decode_jpeg

    return decode_jpeg(blob)


def _decode_png(blob: bytes) -> np.ndarray:
    from vcf2db_spark.functions.png import decode_png

    return decode_png(blob)


_DECODERS = {
    "fake": _decode_fake,
    "ppm": _decode_ppm,
    "bmp": _decode_bmp,
    "wav": _decode_wav,
    "jpeg": _decode_jpeg,
    "png": _decode_png,
}


def decode(blob: bytes) -> tuple[str, np.ndarray]:
    """Decode any supported container → (format_tag, uint8 cube (h, w, c)).

    Raises NotImplementedError for formats that need external codecs.
    """
    fmt = sniff(blob)
    if not fmt:
        raise NotImplementedError(
            "unsupported media container (MP4/WebP/... need ffmpeg-class "
            "codecs this environment does not ship); supported: "
            "FAKE, PPM/PGM, BMP, WAV, baseline JPEG, 8-bit PNG"
        )
    return fmt, _DECODERS[fmt](blob)


def encode(fmt: str, arr: np.ndarray) -> bytes:
    """Re-encode a (h, w, c) uint8 cube into ``fmt`` (for stage composition).

    WAV flattens the cube back to (n_samples, channels) 8-bit PCM — the
    uint8 view round-trips exactly at 8 bits.
    """
    if fmt == "fake":
        return encode_fake(arr)
    if fmt == "ppm":
        return encode_ppm(arr)
    if fmt == "bmp":
        return encode_bmp(arr)
    if fmt == "wav":
        h, w, c = arr.shape
        return encode_wav(arr.reshape(h * w, c), bits=8)
    if fmt == "jpeg":
        from vcf2db_spark.functions.jpeg import encode_jpeg

        return encode_jpeg(arr)
    if fmt == "png":
        from vcf2db_spark.functions.png import encode_png

        return encode_png(arr)
    raise NotImplementedError(f"no encoder for {fmt!r}")
