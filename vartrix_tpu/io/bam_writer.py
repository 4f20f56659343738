"""BAM writing: BGZF compression + record encoding.

Used by the synthetic-workload generator (benchmarks, large-scale tests)
and for round-trip testing of the reader. Produces standard BGZF/BAM that
htslib-based tools can read, including the BGZF EOF marker block.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterable, List, Optional, Sequence, Tuple

SEQ_NT16_IDX = {c: i for i, c in enumerate(b"=ACMGRSVTWYHKDBN")}
CIGAR_OP_IDX = {c: i for i, c in enumerate("MIDNSHP=X")}

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def bgzf_compress(data: bytes, level: int = 6) -> bytes:
    """Compress into BGZF blocks (<=~64KB payload each) + EOF block."""
    out = []
    step = 0xFF00
    for i in range(0, len(data), step) or [0]:
        chunk = data[i : i + step]
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        bsize = len(cdata) + 25 + 1
        header = (
            b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
            + struct.pack("<H", 6)
            + b"BC"
            + struct.pack("<H", 2)
            + struct.pack("<H", bsize - 1)
        )
        out.append(header + cdata + struct.pack("<II", zlib.crc32(chunk), len(chunk)))
    if not data:
        out = []
    out.append(BGZF_EOF)
    return b"".join(out)


def encode_record(
    qname: bytes,
    flag: int,
    tid: int,
    pos: int,
    mapq: int,
    cigar: Sequence[Tuple[int, int]],
    seq: bytes,
    qual: Optional[bytes] = None,
    tags: Sequence[Tuple[bytes, bytes]] = (),
) -> bytes:
    """Encode one alignment record (without the leading block_size field).
    tags: (2-byte tag, Z-string value) pairs."""
    l_seq = len(seq)
    packed = bytearray((l_seq + 1) // 2)
    for i, c in enumerate(seq):
        nib = SEQ_NT16_IDX.get(c, 15)
        if i % 2 == 0:
            packed[i // 2] |= nib << 4
        else:
            packed[i // 2] |= nib
    if qual is None:
        qual = bytes([30]) * l_seq
    ref_consumed = sum(l for op, l in cigar if op in (0, 2, 3, 7, 8))
    end = pos + max(ref_consumed, 1)
    # reg2bin from the SAM spec
    def reg2bin(b, e):
        e -= 1
        if b >> 14 == e >> 14:
            return ((1 << 15) - 1) // 7 + (b >> 14)
        if b >> 17 == e >> 17:
            return ((1 << 12) - 1) // 7 + (b >> 17)
        if b >> 20 == e >> 20:
            return ((1 << 9) - 1) // 7 + (b >> 20)
        if b >> 23 == e >> 23:
            return ((1 << 6) - 1) // 7 + (b >> 23)
        if b >> 26 == e >> 26:
            return ((1 << 3) - 1) // 7 + (b >> 26)
        return 0

    body = struct.pack(
        "<iiBBHHHiiii",
        tid, pos, len(qname) + 1, mapq, reg2bin(pos, end),
        len(cigar), flag, l_seq, -1, -1, 0,
    )
    body += qname + b"\x00"
    for op, l in cigar:
        body += struct.pack("<I", (l << 4) | op)
    body += bytes(packed) + qual
    for tag, val in tags:
        body += tag + b"Z" + val + b"\x00"
    return struct.pack("<i", len(body)) + body


def write_bam(
    path: str,
    refs: List[Tuple[str, int]],
    records: Iterable[bytes],
    write_fake_bai: bool = True,
) -> None:
    """records: pre-encoded via encode_record, in coordinate order."""
    header_text = (
        b"@HD\tVN:1.6\tSO:coordinate\n"
        + b"".join(f"@SQ\tSN:{n}\tLN:{l}\n".encode() for n, l in refs)
    )
    data = b"BAM\x01" + struct.pack("<i", len(header_text)) + header_text
    data += struct.pack("<i", len(refs))
    for name, length in refs:
        nb = name.encode() + b"\x00"
        data += struct.pack("<i", len(nb)) + nb + struct.pack("<i", length)
    data += b"".join(records)
    with open(path, "wb") as f:
        f.write(bgzf_compress(data))
    if write_fake_bai:
        # minimal structurally-valid BAI (no bins, no intervals per ref);
        # our own reader does sequential scans, the index file just has to
        # exist/parse (reference behavior only checks existence,
        # src/main.rs:520-529)
        with open(path + ".bai", "wb") as f:
            f.write(b"BAI\x01" + struct.pack("<i", len(refs)))
            for _ in refs:
                f.write(struct.pack("<i", 0))  # n_bin
                f.write(struct.pack("<i", 0))  # n_intv
