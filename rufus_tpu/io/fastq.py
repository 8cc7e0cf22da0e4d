"""FASTQ / FASTQD text I/O and device-batch staging.

FASTQD is the reference's 6-line "FASTQ + depth" record — header, seq, '+',
qual, strand string, per-base depth ints (reference: OverlapSam.cpp:1066-1081,
read back Overlap.cpp:721-762).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass, field

import numpy as np


def _open(path: str, mode: str = "rt"):
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_fastq(path: str):
    """Yield (name, seq, qual); name excludes '@' and anything after space."""
    with _open(path) as f:
        while True:
            h = f.readline()
            if not h:
                return
            seq = f.readline().rstrip("\n")
            f.readline()
            qual = f.readline().rstrip("\n")
            yield h.rstrip("\n")[1:], seq, qual


def write_fastq(path: str, records):
    with _open(path, "wt") as f:
        for name, seq, qual in records:
            f.write(f"@{name}\n{seq}\n+\n{qual}\n")


@dataclass
class FastqdRecord:
    name: str  # without '@'
    seq: str
    qual: str
    strands: str  # per-base strand chars
    depths: list[int] = field(default_factory=list)


def read_fastqd(path: str):
    with _open(path) as f:
        while True:
            h = f.readline()
            if not h:
                return
            seq = f.readline().rstrip("\n")
            f.readline()
            qual = f.readline().rstrip("\n")
            strands = f.readline().rstrip("\n")
            depth_line = f.readline().rstrip("\n")
            depths = [int(x) for x in depth_line.split()] if depth_line.strip() else []
            yield FastqdRecord(h.rstrip("\n")[1:], seq, qual, strands, depths)


def write_fastqd(path: str, records):
    with _open(path, "wt") as f:
        for r in records:
            f.write(f"@{r.name}\n{r.seq}\n+\n{r.qual}\n{r.strands}\n")
            f.write(" ".join(str(d) for d in r.depths))
            f.write("\n")


def batch_reads(seqs, quals=None, pad_to: int | None = None, bucket: int = 32):
    """Pad a list of reads to a device-friendly (B, L) uint8 batch.

    Pads length to a multiple of `bucket` (static-shape buckets keep XLA
    recompiles bounded). Pad base is 'N' (invalid), pad qual '!' (phred 0).
    Returns (reads_u8, quals_u8, lengths_i32) numpy arrays.
    """
    B = len(seqs)
    maxlen = max((len(s) for s in seqs), default=1)
    L = pad_to or ((maxlen + bucket - 1) // bucket) * bucket
    r = np.full((B, L), ord("N"), np.uint8)
    q = np.full((B, L), ord("!"), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        b = s.encode()[:L]
        r[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
        if quals is not None:
            qb = quals[i].encode()[:L]
            q[i, : len(qb)] = np.frombuffer(qb, np.uint8)
    return r, q, lens
