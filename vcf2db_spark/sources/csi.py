"""CSI (coordinate-sorted index) — the .csi sibling of tabix's .tbi
(VERDICT r8 item 8: htslib indexes BCF with CSI natively; ``bcftools
index`` emits one by default, so a migrating user's BCF ships with
``.csi``, not ``.tbi``).

Same R-tree-flattened binning idea as tabix with two generalizations
(hts-specs CSIv1): configurable ``min_shift``/``depth`` (so contigs
longer than 512 Mb index), and the 16 Kb linear index replaced by a
per-bin ``loffset`` (virtual offset of the first overlapping record).
The file is BGZF-compressed like .tbi.

Interface parity: :class:`CSIIndex` exposes the same ``names`` /
``chunks`` / ``contig_range`` / ``partition_chunks`` surface as
``tabix.TabixIndex``, so the Spark VCF/BCF source planner consumes
either index without branching. ``partition_chunks`` cuts only at chunk
starts (record-aligned by construction) — coarser than .tbi's
linear-index cuts but still record-safe; a CSI over a single giant
contiguous run yields fewer intra-contig splits than the .tbi path,
which is the honest fidelity of the format (htslib has the same
granularity from a CSI).

Aux block: htslib writes ``l_aux = 0`` for BCF indices (names come from
the BCF header's contig dictionary — pass them via ``names``); for
text VCFs we write the tabix-style aux (cols + names) so a CSI over
``.vcf.gz`` is self-describing, as tabix's own ``-C`` output is.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from vcf2db_spark.sources.bgzf import BGZFWriter
from vcf2db_spark.sources.tabix import FMT_VCF, _inflate_bgzf_bytes

CSI_MAGIC = b"CSI\x01"


def reg2bin_csi(beg: int, end: int, min_shift: int = 14, depth: int = 5) -> int:
    """Smallest bin fully containing [beg, end) under the generalized
    (min_shift, depth) scheme."""
    end -= 1
    level, s = depth, min_shift
    t = ((1 << (depth * 3)) - 1) // 7
    while level > 0:
        if beg >> s == end >> s:
            return t + (beg >> s)
        level -= 1
        s += 3
        t -= 1 << (level * 3)
    return 0


def reg2bins_csi(
    beg: int, end: int, min_shift: int = 14, depth: int = 5
) -> list[int]:
    """All bins that may hold records overlapping [beg, end)."""
    out = [0]
    end -= 1
    for level in range(1, depth + 1):
        s = min_shift + (depth - level) * 3
        t = ((1 << (level * 3)) - 1) // 7
        out.extend(range(t + (beg >> s), t + (end >> s) + 1))
    return out


@dataclass
class CSIRef:
    bins: dict[int, list[tuple[int, int]]] = field(default_factory=dict)
    loffsets: dict[int, int] = field(default_factory=dict)


@dataclass
class CSIIndex:
    names: list[str]
    refs: list[CSIRef]
    min_shift: int = 14
    depth: int = 5

    def ref_id(self, name: str) -> int | None:
        try:
            return self.names.index(name)
        except ValueError:
            return None

    def chunks(
        self, chrom: str, beg: int = 0, end: int | None = None
    ) -> list[tuple[int, int]]:
        """Merged [vbeg, vend) ranges whose records may overlap
        chrom:[beg, end) — empty list = provably nothing there."""
        if end is None:
            end = 1 << (self.min_shift + 3 * self.depth)
        rid = self.ref_id(chrom)
        if rid is None or rid >= len(self.refs):
            return []
        ref = self.refs[rid]
        cand = [
            ch
            for b in reg2bins_csi(beg, end, self.min_shift, self.depth)
            for ch in ref.bins.get(b, ())
        ]
        cand.sort()
        merged: list[list[int]] = []
        for b, e in cand:
            if merged and (b <= merged[-1][1] or b >> 16 == merged[-1][1] >> 16):
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([b, e])
        return [(b, e) for b, e in merged]

    def contig_range(self, chrom: str) -> tuple[int, int] | None:
        ch = self.chunks(chrom)
        if not ch:
            return None
        return ch[0][0], max(e for _, e in ch)

    def partition_chunks(
        self,
        chrom: str,
        beg: int = 0,
        end: int | None = None,
        target_bytes: int = 64 << 20,
    ) -> list[list[tuple[int, int]]]:
        """Greedy-pack the chunk ranges into ~``target_bytes`` compressed
        groups. Cut points are chunk starts AND per-bin ``loffset``
        values — each loffset is the virtual offset of the first record
        overlapping its bin, i.e. an exact record start (the CSI spec's
        replacement for tabix's linear index; htslib writes it the same
        way). Consecutive groups therefore neither skip nor re-read a
        record: the reader decodes records starting in [vbeg, vend) only.
        Without loffset cuts a position-contiguous contig merges into ONE
        chunk and a whole-contig scan of an expensive-to-decode container
        could never fan out past n_contigs tasks."""
        chunks = self.chunks(chrom, beg, end)
        if not chunks:
            return []

        def vspan(b: int, e: int) -> int:
            cb, ce = b >> 16, e >> 16
            return (ce - cb) if ce > cb else max((e - b) >> 2, 1)

        rid = self.ref_id(chrom)
        loffs = sorted(
            {v for v in self.refs[rid].loffsets.values() if v}
        ) if rid is not None and rid < len(self.refs) else []

        # split oversized merged chunks at interior record-start loffsets
        expanded: list[tuple[int, int]] = []
        for b, e in chunks:
            lo = b
            if vspan(b, e) > target_bytes:
                for v in loffs:
                    if v <= lo or v >= e:
                        continue
                    if vspan(lo, v) >= target_bytes:
                        expanded.append((lo, v))
                        lo = v
            expanded.append((lo, e))

        groups: list[list[tuple[int, int]]] = []
        cur: list[tuple[int, int]] = []
        size = 0
        for b, e in expanded:
            cur.append((b, e))
            size += vspan(b, e)
            if size >= target_bytes:
                groups.append(cur)
                cur, size = [], 0
        if cur:
            groups.append(cur)
        return groups


class CSIBuilder:
    """Accumulate (rid, beg, end, vbeg, vend) records in file order."""

    def __init__(self, min_shift: int = 14, depth: int = 5):
        self.min_shift = min_shift
        self.depth = depth
        self.refs: list[CSIRef] = []

    def add(self, rid: int, beg: int, end: int, vbeg: int, vend: int) -> None:
        while len(self.refs) <= rid:
            self.refs.append(CSIRef())
        ref = self.refs[rid]
        b = reg2bin_csi(beg, max(end, beg + 1), self.min_shift, self.depth)
        chunks = ref.bins.setdefault(b, [])
        if chunks and chunks[-1][1] == vbeg:
            chunks[-1] = (chunks[-1][0], vend)
        else:
            chunks.append((vbeg, vend))
        if b not in ref.loffsets or vbeg < ref.loffsets[b]:
            ref.loffsets[b] = vbeg

    def build(self, names: list[str] | None = None) -> CSIIndex:
        for ref in self.refs:
            for b in list(ref.bins):
                ref.bins[b] = sorted(ref.bins[b])
        return CSIIndex(
            list(names or []), self.refs, self.min_shift, self.depth
        )


def write_csi(index: CSIIndex, path: str) -> None:
    body = bytearray()
    body += CSI_MAGIC
    body += struct.pack("<ii", index.min_shift, index.depth)
    # tabix-style aux (cols + contig names) — self-describing for text
    # VCF consumers; readers of BCF-side indexes may ignore it
    namestr = b"".join(n.encode() + b"\x00" for n in index.names)
    aux = struct.pack("<7i", FMT_VCF, 1, 2, 0, ord("#"), 0, len(namestr)) + namestr
    body += struct.pack("<i", len(aux)) + aux
    body += struct.pack("<i", len(index.refs))
    for ref in index.refs:
        body += struct.pack("<i", len(ref.bins))
        for b in sorted(ref.bins):
            chunks = ref.bins[b]
            body += struct.pack("<IQi", b, ref.loffsets.get(b, 0), len(chunks))
            for cb, ce in chunks:
                body += struct.pack("<QQ", cb, ce)
    with BGZFWriter(path) as out:
        out.write(bytes(body))


def read_csi(path: str, names: list[str] | None = None) -> CSIIndex:
    """Parse a .csi; contig ``names`` come from the aux block when the
    writer recorded them (tabix-style), else from the caller (BCF
    indices: the header's contig dictionary in rid order — htslib
    writes ``l_aux = 0`` there)."""
    data = _inflate_bgzf_bytes(path)
    if data[:4] != CSI_MAGIC:
        raise ValueError(f"{path}: not a CSI index (magic {data[:4]!r})")
    min_shift, depth, l_aux = struct.unpack_from("<iii", data, 4)
    off = 16
    aux = data[off : off + l_aux]
    off += l_aux
    parsed_names: list[str] = []
    if len(aux) >= 28:
        (l_nm,) = struct.unpack_from("<i", aux, 24)
        raw = aux[28 : 28 + l_nm]
        parsed_names = [n.decode() for n in raw.split(b"\x00") if n]
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    refs: list[CSIRef] = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", data, off)
        off += 4
        ref = CSIRef()
        for _ in range(n_bin):
            b, loff, n_chunk = struct.unpack_from("<IQi", data, off)
            off += 16
            chunks = []
            for _ in range(n_chunk):
                cb, ce = struct.unpack_from("<QQ", data, off)
                off += 16
                chunks.append((cb, ce))
            ref.bins[b] = chunks
            ref.loffsets[b] = loff
        refs.append(ref)
    return CSIIndex(parsed_names or list(names or []), refs, min_shift, depth)
