"""BAM reading: BGZF decompression, record decode, region fetch.

Re-provides the htslib capabilities the reference consumes via rust-htslib
(/root/reference/src/main.rs:260-264,822-896): BGZF inflate, BAM record
decode (pos, mapq, flag, CIGAR, packed SEQ, aux tags), and region iteration
with htslib overlap semantics (rec.pos < end and endpos(rec) > start,
endpos = pos + ref-consumed CIGAR length, or pos+1 when nothing is
ref-consuming, e.g. placed-unmapped reads).

This module is the pure-Python implementation; a C++ fast path
(native/genomio) provides batch decode for the performance pipeline and is
validated against this one.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, List, Optional, Tuple

SEQ_NT16 = b"=ACMGRSVTWYHKDBN"

# CIGAR op codes: MIDNSHP=X
CIGAR_OPS = "MIDNSHP=X"
_REF_CONSUMING = (0, 2, 3, 7, 8)  # M D N = X
_QRY_CONSUMING = (0, 1, 4, 7, 8)  # M I S = X

FLAG_UNMAPPED = 0x4
FLAG_SECONDARY = 0x100
FLAG_DUP = 0x400
FLAG_SUPPLEMENTARY = 0x800


def bgzf_decompress(data: bytes, stop_after: int = 0) -> bytes:
    """Inflate a BGZF byte-stream (series of gzip members). With
    stop_after > 0, stop once at least that many decompressed bytes are
    available (header-only reads skip inflating the record stream)."""
    out = []
    got = 0
    pos = 0
    n = len(data)
    while pos < n:
        if stop_after and got >= stop_after:
            break
        if n - pos >= 28 and data[pos : pos + 4] == b"\x1f\x8b\x08\x04":
            xlen = struct.unpack_from("<H", data, pos + 10)[0]
            # scan extra subfields for BC (BGZF block size)
            bsize = None
            xoff = pos + 12
            xend = xoff + xlen
            while xoff + 4 <= xend:
                si1, si2, slen = data[xoff], data[xoff + 1], struct.unpack_from("<H", data, xoff + 2)[0]
                if si1 == 66 and si2 == 67 and slen == 2:
                    bsize = struct.unpack_from("<H", data, xoff + 4)[0] + 1
                xoff += 4 + slen
            if bsize is None:
                raise ValueError("gzip member without BGZF BC subfield")
            cdata = data[xend : pos + bsize - 8]
            out.append(zlib.decompress(cdata, wbits=-15))
            got += len(out[-1])
            pos += bsize
        else:
            # plain gzip fallback
            d = zlib.decompressobj(wbits=31)
            out.append(d.decompress(data[pos:]))
            got += len(out[-1])
            rest = d.unused_data
            pos = n - len(rest)
            if not d.eof:
                break
    return b"".join(out)


class BamRecord:
    __slots__ = (
        "tid", "pos", "mapq", "flag", "cigar", "_buf", "_seq_off", "l_seq",
        "_aux_off", "_name_off", "_name_len",
    )

    def __init__(self, buf: bytes, tid: int, pos: int, mapq: int, flag: int,
                 cigar: List[Tuple[int, int]], seq_off: int, l_seq: int,
                 aux_off: int, name_off: int, name_len: int):
        self._buf = buf
        self.tid = tid
        self.pos = pos
        self.mapq = mapq
        self.flag = flag
        self.cigar = cigar
        self._seq_off = seq_off
        self.l_seq = l_seq
        self._aux_off = aux_off
        self._name_off = name_off
        self._name_len = name_len

    @property
    def qname(self) -> bytes:
        return self._buf[self._name_off : self._name_off + self._name_len]

    def seq_bytes(self) -> bytes:
        """Decoded sequence, uppercase nucleotide characters (like
        rust-htslib rec.seq().as_bytes())."""
        packed = self._buf[self._seq_off : self._seq_off + (self.l_seq + 1) // 2]
        out = bytearray(self.l_seq)
        for i in range(self.l_seq):
            b = packed[i >> 1]
            nib = (b >> 4) if (i & 1) == 0 else (b & 0xF)
            out[i] = SEQ_NT16[nib]
        return bytes(out)

    def is_secondary(self) -> bool:
        return bool(self.flag & FLAG_SECONDARY)

    def is_supplementary(self) -> bool:
        return bool(self.flag & FLAG_SUPPLEMENTARY)

    def is_duplicate(self) -> bool:
        return bool(self.flag & FLAG_DUP)

    def is_unmapped(self) -> bool:
        return bool(self.flag & FLAG_UNMAPPED)

    def aux_string(self, tag: bytes) -> Optional[bytes]:
        """Value of a Z-type aux tag, or None (matches the reference's
        Aux::String-only acceptance, src/main.rs:737-757)."""
        buf, off, end = self._buf, self._aux_off, len(self._buf)
        while off + 3 <= end:
            t = buf[off : off + 2]
            typ = buf[off + 2 : off + 3]
            off += 3
            if typ in (b"Z", b"H"):
                nul = buf.index(b"\x00", off)
                if t == tag and typ == b"Z":
                    return buf[off:nul]
                off = nul + 1
            elif typ == b"A" or typ == b"c" or typ == b"C":
                off += 1
            elif typ == b"s" or typ == b"S":
                off += 2
            elif typ in (b"i", b"I", b"f"):
                off += 4
            elif typ == b"B":
                sub = buf[off : off + 1]
                cnt = struct.unpack_from("<i", buf, off + 1)[0]
                size = {b"c": 1, b"C": 1, b"s": 2, b"S": 2, b"i": 4, b"I": 4, b"f": 4}[sub]
                off += 5 + cnt * size
            else:
                raise ValueError(f"unknown aux type {typ!r}")
        return None

    def ref_len(self) -> int:
        """Reference bases consumed by the alignment."""
        return sum(l for op, l in self.cigar if op in _REF_CONSUMING)

    def endpos(self) -> int:
        """htslib bam_endpos: pos + ref_len, or pos+1 if nothing consumed."""
        rl = self.ref_len()
        return self.pos + rl if rl > 0 else self.pos + 1

    def aligned_ref_intervals(self, include_dels: bool = True):
        """Ref-coordinate intervals covered by aligned bases (M/=/X; D when
        include_dels). N (ref-skip) and soft clips never count — the
        semantics of rust-htslib read_pos(.., false, true) used by the
        reference's useful_alignment (src/main.rs:790-806)."""
        r = self.pos
        for op, l in self.cigar:
            if op in (0, 7, 8):  # M = X
                yield (r, r + l)
                r += l
            elif op == 2:  # D
                if include_dels:
                    yield (r, r + l)
                r += l
            elif op == 3:  # N
                r += l


def _find_cg_cigar(buf: bytes, off: int) -> Optional[List[Tuple[int, int]]]:
    """Real CIGAR from a CG:B,I aux tag (BAM long-CIGAR convention for
    records with > 65535 ops: the in-record cigar is a kSmN placeholder
    and the true ops live in CG)."""
    end = len(buf)
    while off + 3 <= end:
        t = buf[off : off + 2]
        typ = buf[off + 2 : off + 3]
        off += 3
        if typ in (b"Z", b"H"):
            off = buf.index(b"\x00", off) + 1
        elif typ in (b"A", b"c", b"C"):
            off += 1
        elif typ in (b"s", b"S"):
            off += 2
        elif typ in (b"i", b"I", b"f"):
            off += 4
        elif typ == b"B":
            sub = buf[off : off + 1]
            cnt = struct.unpack_from("<i", buf, off + 1)[0]
            size = {b"c": 1, b"C": 1, b"s": 2, b"S": 2,
                    b"i": 4, b"I": 4, b"f": 4}[sub]
            if t == b"CG" and sub == b"I":
                vals = struct.unpack_from(f"<{cnt}I", buf, off + 5)
                return [(v & 0xF, v >> 4) for v in vals]
            off += 5 + cnt * size
        else:
            return None
    return None


def _decode_record(buf: bytes) -> BamRecord:
    (refid, pos, l_read_name, mapq, _bin, n_cigar, flag, l_seq,
     _next_refid, _next_pos, _tlen) = struct.unpack_from("<iiBBHHHiiii", buf, 0)
    off = 32
    name_off, name_len = off, l_read_name - 1  # exclude trailing NUL
    off += l_read_name
    cigar = []
    for k in range(n_cigar):
        v = struct.unpack_from("<I", buf, off + 4 * k)[0]
        cigar.append((v & 0xF, v >> 4))
    off += 4 * n_cigar
    seq_off = off
    off += (l_seq + 1) // 2
    off += l_seq  # qual
    if (n_cigar == 2 and l_seq > 0 and cigar[0] == (4, l_seq)
            and cigar[1][0] == 3):
        # kSmN placeholder: true CIGAR is in the CG:B,I tag (htslib
        # long-CIGAR convention the reference inherits)
        real = _find_cg_cigar(buf, off)
        if real is not None:
            cigar = real
    return BamRecord(buf, refid, pos, mapq, flag, cigar, seq_off, l_seq,
                     off, name_off, name_len)


class BamReader:
    """Whole-file BAM reader (decompresses into memory)."""

    def __init__(self, path: str, header_only: bool = False):
        with open(path, "rb") as f:
            raw = f.read()
        if raw[:4] == b"CRAM":
            # CRAM is supported, but via io.cram / native cramio — the
            # driver routes there (driver.open_reads). Reaching BamReader
            # with a CRAM file means a caller bypassed that routing.
            raise ValueError(
                f"{path}: is a CRAM file; BamReader only decodes BAM. "
                "Use vartrix_tpu.io.cram (or the CLI, which routes by "
                "file magic) instead.")
        if header_only:
            # inflate only until the full header (magic + SAM text + ref
            # list) is in hand: validation paths need names/lengths, not
            # the record stream
            need = 12
            data = bgzf_decompress(raw, stop_after=need)
            while len(data) >= 12:
                l_text = struct.unpack_from("<i", data, 4)[0]
                if l_text >= 0 and len(data) >= 12 + l_text:
                    n_ref = struct.unpack_from("<i", data, 8 + l_text)[0]
                    end = 12 + l_text
                    ok = n_ref >= 0
                    for _ in range(max(n_ref, 0)):
                        if len(data) < end + 8:
                            ok = False
                            break
                        l_name = struct.unpack_from("<i", data, end)[0]
                        end += 8 + l_name
                    if ok and len(data) >= end:
                        break
                need = max(need * 4, len(data) + 1)
                grown = bgzf_decompress(raw, stop_after=need)
                if len(grown) <= len(data):
                    break  # whole file inflated, header never parsed:
                           # fall through to the magic check below
                data = grown
            self._header_only = True
        else:
            data = bgzf_decompress(raw)
            self._header_only = False
        if data[:4] != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM file")
        l_text = struct.unpack_from("<i", data, 4)[0]
        off = 8 + l_text
        n_ref = struct.unpack_from("<i", data, off)[0]
        off += 4
        self.ref_names: List[str] = []
        self.ref_lens: List[int] = []
        for _ in range(n_ref):
            l_name = struct.unpack_from("<i", data, off)[0]
            name = data[off + 4 : off + 4 + l_name - 1].decode()
            l_ref = struct.unpack_from("<i", data, off + 4 + l_name)[0]
            self.ref_names.append(name)
            self.ref_lens.append(l_ref)
            off += 8 + l_name
        self._data = data
        self._records_off = off
        self.tid_by_name = {n: i for i, n in enumerate(self.ref_names)}

    def records(self) -> Iterator[BamRecord]:
        if self._header_only:
            raise RuntimeError("BamReader opened header_only; records "
                               "were not decompressed")
        data = self._data
        off = self._records_off
        n = len(data)
        while off + 4 <= n:
            bs = struct.unpack_from("<i", data, off)[0]
            yield _decode_record(data[off + 4 : off + 4 + bs])
            off += 4 + bs

    def fetch(self, chrom: str, start: int, end: int) -> Iterator[BamRecord]:
        """Records overlapping 0-based half-open [start, end) on chrom, in
        file order (htslib overlap semantics)."""
        tid = self.tid_by_name.get(chrom)
        if tid is None:
            raise KeyError(f"chromosome {chrom} not in BAM header")
        for rec in self.records():
            if rec.tid != tid:
                continue
            if rec.pos < end and rec.endpos() > start:
                yield rec
