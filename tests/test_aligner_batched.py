"""Batched/device alignment path == sequential host path, field for
field — and the flat memmapped index == the in-RAM index.

The batched path (Aligner.align_seqs) runs candidate DPs through
sw_device.sw_batch; since the device DP is bit-identical to sw_kernel
(test_sw_device.py) and all selection logic is shared, every Alignment
field must match the sequential path exactly."""

import numpy as np
import os
import pytest

from rufus_tpu.align.aligner import (Aligner, RefIndex, build_flat_index,
                                     open_flat_index)

BASES = np.frombuffer(b"ACGT", np.uint8)


@pytest.fixture(scope="module")
def ctx():
    rng = np.random.default_rng(7)
    genome = rng.choice(BASES, size=60_000).astype(np.uint8)
    contigs = {"c1": genome[:40_000], "c2": genome[40_000:]}
    ref = RefIndex(contigs, seed_len=19)
    return ref, contigs, genome, rng


def _mutate(read: str, kind: str, rng) -> str:
    i = int(rng.integers(30, len(read) - 30))
    b = "ACGT"[(("ACGT".index(read[i])) + 1) % 4]
    if kind == "snv":
        return read[:i] + b + read[i + 1:]
    if kind == "ins":
        return read[:i] + "ACGTA" + read[i:]
    return read[:i] + read[i + 8:]  # del


def _aln_tuple(a):
    return (a.qname, a.flag, a.ref_name, a.pos, a.mapq, a.cigar_string(),
            a.seq, a.qual, a.score, a.nm, a.is_supplementary)


def test_batched_equals_sequential(ctx):
    ref, contigs, genome, rng = ctx
    al = Aligner(ref)
    items = []
    for t in range(24):
        start = int(rng.integers(0, len(genome) - 200))
        read = genome[start : start + 150].tobytes().decode()
        kind = ["clean", "snv", "ins", "del"][t % 4]
        if kind != "clean":
            read = _mutate(read, kind, rng)
        if t % 5 == 0:  # reverse-strand reads
            read = read.translate(str.maketrans("ACGT", "TGCA"))[::-1]
        items.append((f"r{t}", read, "I" * len(read)))
    # a chimeric read for the splits path
    a = genome[1_000 : 1_080].tobytes().decode()
    b = genome[45_000 : 45_080].tobytes().decode()
    items.append(("chim", a + b, "I" * 160))

    seq_out = [al.align_seq(n, s, q, splits=True) for n, s, q in items]
    bat_out = al.align_seqs(items, splits=True, batch=7)  # odd chunking
    assert len(seq_out) == len(bat_out)
    for s_alns, b_alns in zip(seq_out, bat_out):
        assert [_aln_tuple(x) for x in s_alns] == [_aln_tuple(x) for x in b_alns]


def test_flat_index_equals_ram_index(ctx, tmp_path):
    ref, contigs, genome, rng = ctx
    path = str(tmp_path / "ref.flatidx")
    build_flat_index(contigs, path, seed_len=19, bucket_bits=4)
    flat = open_flat_index(path)
    np.testing.assert_array_equal(np.asarray(flat.genome),
                                  np.asarray(ref.genome))
    np.testing.assert_array_equal(np.asarray(flat.seed_keys),
                                  np.asarray(ref.seed_keys))
    np.testing.assert_array_equal(np.asarray(flat.seed_pos),
                                  np.asarray(ref.seed_pos))
    assert flat.names == ref.names and flat.starts == ref.starts

    # end-to-end: alignments through the flat index match the RAM index
    al_ram, al_flat = Aligner(ref), Aligner(flat)
    for t in range(6):
        start = int(rng.integers(0, len(genome) - 200))
        read = _mutate(genome[start : start + 150].tobytes().decode(),
                       "snv", rng)
        got = al_flat.align_seq(f"f{t}", read, "I" * len(read))
        want = al_ram.align_seq(f"f{t}", read, "I" * len(read))
        assert [_aln_tuple(x) for x in got] == [_aln_tuple(x) for x in want]


def test_pipeline_flat_index_option(ctx, tmp_path):
    """cfg.flat_index builds the memmapped index on first use and the
    pipeline's ref_index() serves it with RefIndex semantics."""
    from rufus_tpu.pipeline import RufusConfig
    from rufus_tpu.pipeline.driver import RufusPipeline

    ref, contigs, genome, rng = ctx
    # write a small fasta the pipeline can load
    fa = tmp_path / "toy.fa"
    with open(fa, "w") as f:
        for name, arr in contigs.items():
            f.write(f">{name}\n")
            s = arr.tobytes().decode()
            for i in range(0, len(s), 60):
                f.write(s[i : i + 60] + "\n")
    idx_path = str(tmp_path / "toy.flatidx")
    cfg = RufusConfig(subject="x.bam", controls=[], ref=str(fa),
                      workdir=str(tmp_path), flat_index=idx_path)
    pipe = RufusPipeline(cfg)
    flat = pipe.ref_index()
    assert os.path.exists(idx_path)
    np.testing.assert_array_equal(np.asarray(flat.seed_keys),
                                  np.asarray(ref.seed_keys))
    # reopening (resume) memmaps the existing file
    pipe2 = RufusPipeline(cfg)
    assert isinstance(pipe2.ref_index().seed_keys, np.memmap)
