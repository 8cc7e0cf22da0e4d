"""Auxiliary component parity: GenerateProbNotError, the out-of-core flat
table (RUFUS.search.1kg role), and the long-read (Overlap.pacbio.sh) path.
"""

import gzip
import os

import numpy as np

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def test_prob_not_error_golden(tmp_path):
    """Byte parity vs the reference GenerateProbNotError binary compiled
    from scripts/GenerateProbNotError.cpp and run on the golden trio .dist
    (output captured 2026-08-19)."""
    from rufus_tpu.models.modeldist import prob_not_error_text

    dist = tmp_path / "child.dist"
    dist.write_text(
        gzip.open(os.path.join(GOLD, "Child.Jhash.histo.7.7.dist.gz"), "rt").read()
    )
    expected = (
        "1\n0.0116117\n0.136157\n0.441106\n0.722617\n0.871386\n0.937632\n"
        "0.967429\n0.981687\n0.988997\n0.992991\n0.995301\n0.996705\n"
    )
    assert prob_not_error_text(str(dist)) == expected


def test_flat_table_mmap_roundtrip(tmp_path):
    from rufus_tpu.ops import count

    rng = np.random.default_rng(7)
    keys = np.unique(rng.integers(0, 1 << 50, size=5000, dtype=np.uint64))
    cnts = rng.integers(1, 300, size=len(keys)).astype(np.int64)
    t = count.KmerTable(25, keys, cnts)
    p = str(tmp_path / "pop.ktab")
    t.save_flat(p)

    for mmap in (True, False):
        t2 = count.KmerTable.load_flat(p, mmap=mmap)
        assert t2.k == 25 and len(t2) == len(t)
        # point queries page only what binary search touches
        probe = np.concatenate([keys[::7], keys[::11] + 1])
        np.testing.assert_array_equal(t2.query(probe), t.query(probe))
        if mmap:
            assert isinstance(t2.keys, np.memmap)

    # population_filter composes with an mmap table unchanged
    pop = count.KmerTable.load_flat(p)
    mut = count.KmerTable(25, keys[:64], np.full(64, 9, np.int64))
    out = count.population_filter(mut, pop, max_pop_depth=10**9)
    assert len(out) == 64


def test_longread_annotate_stage(tmp_path):
    """stage_assemble_longread: external-assembler fasta -> hashcount fastq
    with mutant-kmer coverage quals (Overlap.pacbio.sh:89 semantics)."""
    from rufus_tpu.pipeline import RufusConfig, RufusPipeline
    from rufus_tpu.ops import count, codec

    k = 25
    rng = np.random.default_rng(3)
    contig = "".join(rng.choice(list("ACGT"), size=220))
    fa = tmp_path / "asm.contigs.fasta"
    fa.write_text(f">tig1 len=220 reads=11\n{contig[:100]}\n{contig[100:]}\n")

    # HashList containing this contig's first k-mers -> nonzero coverage
    kmers = sorted({codec.canonical_str(contig[i:i + k]) for i in range(40)})
    hl = tmp_path / "subj.HashList"
    hl.write_text("".join(f"{s}\t9\n" for s in kmers))

    ref = tmp_path / "ref.fa"
    ref.write_text(f">c1\n{contig}\n")
    cfg = RufusConfig(subject=str(tmp_path / "x.fastq"), controls=[],
                      ref=str(ref), k=k, workdir=str(tmp_path))
    os.makedirs(tmp_path / "TempOverlap", exist_ok=True)
    pipe = RufusPipeline(cfg)
    out = pipe.stage_assemble_longread(str(fa), str(hl))

    lines = open(out).read().splitlines()
    assert len(lines) == 4
    assert lines[0].startswith("@") and "tig1" in lines[0]
    assert lines[1] == contig
    # covered prefix has qual > '!', uncovered tail stays floor
    assert any(q > "#" for q in lines[3][:20])


def test_hash_columns_matches_scalar_get_hash():
    """Vectorized hash_columns must equal per-column get_hash exactly,
    including skipped non-base columns and short tails."""
    from rufus_tpu.interpret.samread import Context, get_hash, hash_columns

    seq = "ACGT-ACN-GTACGTACGTACGTACGTTTT-AC"
    k = 7
    strs, keys, ok = hash_columns(seq, k)
    ctx = Context.__new__(Context)
    for j in range(len(seq)):
        want = get_hash(seq, j, k)
        assert strs[j] == want, j
        assert ok[j] == (want != "")
        if want:
            assert int(keys[j]) == Context.h2l(ctx, want), j


def test_pull_table_matches_dict():
    from rufus_tpu.interpret.samread import PullTable

    d = {5: 7, 123456789012: -2, 0: 3}
    t = PullTable(d)
    q = np.array([5, 6, 0, 123456789012, 99], dtype=np.uint64)
    counts, found = t.get_many(q)
    assert counts.tolist() == [7, 0, 3, -2, 0]
    assert found.tolist() == [True, False, True, True, False]
    empty = PullTable({})
    c, f = empty.get_many(q)
    assert not f.any()
