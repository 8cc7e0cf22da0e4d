#!/usr/bin/env python
"""Alignment-at-scale measurement (VERDICT round-2 item 5).

Builds a flat (memmapped) seed index over a synthetic genome whose
in-RAM index would dwarf the stated RAM cap, then aligns a read batch
through the batched device-DP path and reports alignments/s plus the
process RSS ceiling. Scale the genome with --mbp (default 64 Mbp: the
index file holds ~64M seed entries, 12 B each — the same layout that at
3 Gbp human+decoys is ~36 GB on DISK while the resident set stays
bounded by demand paging).

Run: python tools/alignbench.py [--mbp 64] [--reads 2000]
"""

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=int, default=64)
    ap.add_argument("--reads", type=int, default=2000)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import rufus_tpu  # noqa: F401
    from rufus_tpu.align.aligner import (Aligner, build_flat_index,
                                         open_flat_index)

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    G = args.mbp << 20
    genome = rng.choice(bases, size=G).astype(np.uint8)
    path = f"/tmp/alignbench.{args.mbp}mbp.flatidx"

    t0 = time.perf_counter()
    if not os.path.exists(path):
        build_flat_index({"chr1": genome}, path, seed_len=19)
    build_s = time.perf_counter() - t0
    rss_after_build = rss_mb()

    idx = open_flat_index(path)
    al = Aligner(idx)
    # reads: sampled + mutated, mixed strands
    items = []
    for t in range(args.reads):
        start = int(rng.integers(0, G - 200))
        read = genome[start : start + 150].tobytes().decode()
        i = 30 + t % 90
        read = read[:i] + "ACGT"[("ACGT".index(read[i]) + 1) % 4] + read[i + 1:]
        if t % 3 == 0:
            read = read.translate(str.maketrans("ACGT", "TGCA"))[::-1]
        items.append((f"r{t}", read, "I" * len(read)))
    del genome

    al.align_seqs(items[:64])  # warm the device DP compile
    t0 = time.perf_counter()
    out = al.align_seqs(items)
    dt = time.perf_counter() - t0
    mapped = sum(1 for g in out if not g[0].is_unmapped)
    print({
        "genome_mbp": args.mbp,
        "index_file_mb": round(os.path.getsize(path) / 1e6, 1),
        "index_build_s": round(build_s, 1),
        "reads": args.reads,
        "mapped": mapped,
        "alignments_per_s": round(args.reads / dt, 1),
        "rss_mb_peak": round(rss_mb(), 1),
        "rss_mb_after_index_build": round(rss_after_build, 1),
    }, flush=True)
    if not args.keep:
        os.unlink(path)


if __name__ == "__main__":
    main()
