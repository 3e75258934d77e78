"""BGZF (blocked gzip) reader/writer — pure Python, stdlib only.

The reference reads bgzip-compressed VCFs through htslib's C BGZF layer
[U vcf2db.py §VCFDB.load ~L640 via cyvcf2]. BGZF is the htslib framing of
gzip: a concatenation of independent gzip members, each ≤ 64 KiB of
uncompressed payload, each carrying its own compressed size (``BSIZE``) in
a gzip extra subfield (``BC``). That independence is exactly what a
distributed engine needs:

- **Splittable scans** — any compressed byte offset that lands on a block
  boundary is a clean decompression start, so a 100 TB ``.vcf.gz`` shards
  into block-aligned byte-range partitions with no coordination.
- **Virtual-offset seeks** — tabix addresses records by
  ``coffset << 16 | uoffset`` (compressed block start, offset within the
  inflated block); ``BGZFReader.seek_virtual`` implements that contract,
  so an index lookup becomes one ``seek`` + one block inflate.

Format spec: the public SAM/BAM specification §4.1 (samtools/hts-specs).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass
from typing import BinaryIO, Iterator

#: fixed gzip member header with one 6-byte extra subfield (SI1='B',
#: SI2='C', SLEN=2) — the layout every htslib-written block uses.
_HEADER_FMT = "<4BI2BH2B2H"  # magic(2)+CM+FLG, MTIME, XFL, OS, XLEN, SI1, SI2, SLEN, BSIZE
_HEADER_LEN = 18
_FOOTER_LEN = 8  # CRC32 + ISIZE
#: max uncompressed payload per block (spec: BSIZE ≤ 65535 ⇒ payload ≤ ~64K)
MAX_BLOCK_DATA = 65280

#: the canonical 28-byte BGZF EOF sentinel block (empty payload)
EOF_BLOCK = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


@dataclass(frozen=True)
class BlockInfo:
    coffset: int  # compressed byte offset of the block's first byte
    csize: int  # compressed size (BSIZE+1): offset of next block = coffset+csize
    usize: int  # uncompressed payload length (ISIZE)


def is_bgzf(path: str) -> bool:
    """True if the file starts with a gzip member carrying the BC extra
    subfield (i.e. was written by bgzip/htslib, not plain gzip)."""
    with open(path, "rb") as fh:
        head = fh.read(_HEADER_LEN)
    return (
        len(head) == _HEADER_LEN
        and head[:4] == b"\x1f\x8b\x08\x04"
        and head[12:14] == b"BC"
    )


def _read_block_at(fh: BinaryIO, coffset: int) -> tuple[bytes, int]:
    """Inflate the block starting at ``coffset``; returns (payload, csize)."""
    fh.seek(coffset)
    head = fh.read(_HEADER_LEN)
    if len(head) < _HEADER_LEN:
        raise EOFError(f"truncated BGZF block header at {coffset}")
    if head[:4] != b"\x1f\x8b\x08\x04":
        raise ValueError(f"not a BGZF block at offset {coffset}")
    xlen = struct.unpack_from("<H", head, 10)[0]
    # scan the extra subfields for BC (htslib always writes it first, but
    # the spec only requires presence)
    extra = head[12:] + fh.read(xlen - (_HEADER_LEN - 12))
    bsize = None
    off = 0
    while off + 4 <= len(extra):
        si1, si2, slen = extra[off], extra[off + 1], struct.unpack_from("<H", extra, off + 2)[0]
        if si1 == 0x42 and si2 == 0x43 and slen == 2:
            bsize = struct.unpack_from("<H", extra, off + 4)[0]
            break
        off += 4 + slen
    if bsize is None:
        raise ValueError(f"BGZF block at {coffset} lacks the BC subfield")
    csize = bsize + 1
    cdata_len = csize - (12 + xlen) - _FOOTER_LEN
    cdata = fh.read(cdata_len)
    crc, isize = struct.unpack("<II", fh.read(_FOOTER_LEN))
    payload = zlib.decompress(cdata, wbits=-15)
    if len(payload) != isize or zlib.crc32(payload) != crc:
        raise ValueError(f"corrupt BGZF block at {coffset}")
    return payload, csize


def enumerate_blocks(path: str) -> Iterator[BlockInfo]:
    """Walk the block chain by header arithmetic (no payload inflation
    except what's needed for validation-free sizing). O(n_blocks) seeks."""
    with open(path, "rb") as fh:
        fh.seek(0, 2)
        end = fh.tell()
        coffset = 0
        while coffset < end:
            fh.seek(coffset)
            head = fh.read(_HEADER_LEN)
            if len(head) < _HEADER_LEN:
                raise EOFError(f"truncated BGZF header at {coffset}")
            xlen = struct.unpack_from("<H", head, 10)[0]
            extra = head[12:] + fh.read(xlen - (_HEADER_LEN - 12))
            bsize = None
            off = 0
            while off + 4 <= len(extra):
                si1, si2, slen = (
                    extra[off],
                    extra[off + 1],
                    struct.unpack_from("<H", extra, off + 2)[0],
                )
                if si1 == 0x42 and si2 == 0x43 and slen == 2:
                    bsize = struct.unpack_from("<H", extra, off + 4)[0]
                    break
                off += 4 + slen
            if bsize is None:
                raise ValueError(f"BGZF block at {coffset} lacks the BC subfield")
            csize = bsize + 1
            fh.seek(coffset + csize - 4)
            isize = struct.unpack("<I", fh.read(4))[0]
            yield BlockInfo(coffset, csize, isize)
            coffset += csize


class BGZFReader:
    """Sequential + virtual-offset-seekable reader over a BGZF file.

    ``tell_virtual()`` / ``seek_virtual()`` speak tabix's
    ``coffset << 16 | uoffset`` coordinates. ``readline()`` returns bytes
    including the trailing newline (empty bytes at EOF)."""

    def __init__(self, path: str):
        self._fh = open(path, "rb")
        self._fh.seek(0, 2)
        self._file_end = self._fh.tell()
        self._block_coffset = 0
        self._block_csize = 0
        self._buf = b""
        self._buf_pos = 0
        self._load_block(0)

    def close(self) -> None:
        self._fh.close()

    def __enter__(self) -> "BGZFReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _load_block(self, coffset: int) -> bool:
        if coffset >= self._file_end:
            self._block_coffset = coffset
            self._buf, self._buf_pos = b"", 0
            return False
        payload, csize = _read_block_at(self._fh, coffset)
        self._block_coffset = coffset
        self._block_csize = csize
        self._buf = payload
        self._buf_pos = 0
        # skip zero-length blocks (EOF sentinel may be mid-file after cat)
        if not payload:
            return self._load_block(coffset + csize)
        return True

    def tell_virtual(self) -> int:
        return (self._block_coffset << 16) | self._buf_pos

    def seek_virtual(self, voffset: int) -> None:
        coffset, uoffset = voffset >> 16, voffset & 0xFFFF
        if coffset != self._block_coffset or not self._buf:
            self._load_block(coffset)
        self._buf_pos = uoffset

    def readline(self) -> bytes:
        chunks: list[bytes] = []
        while True:
            if self._buf_pos >= len(self._buf):
                if not self._load_block(self._block_coffset + self._block_csize):
                    break
            nl = self._buf.find(b"\n", self._buf_pos)
            if nl >= 0:
                chunks.append(self._buf[self._buf_pos : nl + 1])
                self._buf_pos = nl + 1
                break
            chunks.append(self._buf[self._buf_pos :])
            self._buf_pos = len(self._buf)
        return b"".join(chunks)

    def read(self, n: int) -> bytes:
        """Read exactly ``n`` decompressed bytes (fewer only at EOF) —
        the binary-record primitive the BCF container needs (records
        are length-framed, not line-framed)."""
        chunks: list[bytes] = []
        need = n
        while need > 0:
            if self._buf_pos >= len(self._buf):
                if not self._load_block(self._block_coffset + self._block_csize):
                    break
            take = self._buf[self._buf_pos : self._buf_pos + need]
            chunks.append(take)
            self._buf_pos += len(take)
            need -= len(take)
        return b"".join(chunks)

    def __iter__(self) -> Iterator[bytes]:
        while True:
            line = self.readline()
            if not line:
                return
            yield line


class BGZFWriter:
    """Write BGZF: buffers text/bytes into ≤64 KiB-payload gzip members
    and appends the spec EOF block on close. Mirrors ``bgzip`` output
    closely enough that htslib/tabix accept it (same framing; compression
    level is zlib default)."""

    def __init__(self, path: str, level: int = 6):
        self._fh = open(path, "wb")
        self._level = level
        self._buf = bytearray()

    def write(self, data: bytes | str) -> None:
        if isinstance(data, str):
            data = data.encode()
        self._buf += data
        while len(self._buf) >= MAX_BLOCK_DATA:
            self._flush_block(bytes(self._buf[:MAX_BLOCK_DATA]))
            del self._buf[:MAX_BLOCK_DATA]

    def tell_virtual(self) -> int:
        """Virtual offset of the next byte to be written (valid as a
        record start for tabix indexing)."""
        return (self._fh.tell() << 16) | len(self._buf)

    def _flush_block(self, payload: bytes) -> None:
        comp = zlib.compressobj(self._level, zlib.DEFLATED, -15)
        cdata = comp.compress(payload) + comp.flush()
        bsize = _HEADER_LEN + len(cdata) + _FOOTER_LEN - 1
        if bsize > 0xFFFF:
            raise ValueError("incompressible block exceeds BSIZE — lower block size")
        header = struct.pack(
            _HEADER_FMT,
            0x1F, 0x8B, 0x08, 0x04,  # magic, CM=deflate, FLG=FEXTRA
            0,  # MTIME
            0, 0xFF,  # XFL, OS=unknown
            6,  # XLEN
            0x42, 0x43, 2,  # 'B','C', SLEN
            bsize,
        )
        footer = struct.pack("<II", zlib.crc32(payload), len(payload))
        self._fh.write(header + cdata + footer)

    def close(self) -> None:
        if self._buf:
            self._flush_block(bytes(self._buf))
            self._buf.clear()
        self._fh.write(EOF_BLOCK)
        self._fh.close()

    def __enter__(self) -> "BGZFWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def compress_file(src: str, dst: str, level: int = 6) -> None:
    """bgzip a plain file (helper for fixtures and the CLI)."""
    with open(src, "rb") as fh, BGZFWriter(dst, level=level) as out:
        while True:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
