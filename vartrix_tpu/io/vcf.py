"""VCF parser.

Provides what the reference uses from rust-htslib's bcf reader
(/root/reference/src/main.rs:221-234,615-623): iterate records in file
order, exposing chrom, 0-based pos and the allele list
([REF] when the ALT column is '.', else [REF, ALT1, ...]).

Plain-text .vcf and gzip/bgzip-compressed .vcf.gz are supported.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import Iterator, List


@dataclass
class VcfRecord:
    chrom: str
    pos: int  # 0-based (matches rust-htslib rec.pos())
    ref: bytes
    alts: List[bytes]  # empty when ALT column is '.'

    @property
    def alleles(self) -> List[bytes]:
        return [self.ref] + self.alts


def _open_text(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "rt")


def read_vcf_records(path: str) -> List[VcfRecord]:
    return list(iter_vcf_records(path))


def iter_vcf_records(path: str) -> Iterator[VcfRecord]:
    with _open_text(path) as f:
        for line in f:
            line = line.rstrip("\n").rstrip("\r")
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) < 5:
                raise ValueError(f"malformed VCF line: {line[:200]}")
            chrom, pos_s, _id, ref, alt = parts[:5]
            alts: List[bytes] = []
            if alt != "." and alt != "":
                alts = [a.encode() for a in alt.split(",")]
            yield VcfRecord(
                chrom=chrom,
                pos=int(pos_s) - 1,
                ref=ref.encode(),
                alts=alts,
            )
