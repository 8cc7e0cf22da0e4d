import os

import numpy as np
import pytest

from rufus_tpu.io import bam, fastq, fasta, hashlist

TESTRUN = "/root/reference/testRun"
REF_FA = "/root/reference/resources/references/small_test_human_reference_v37_decoys.fa"

needs_data = pytest.mark.skipif(
    not os.path.exists(os.path.join(TESTRUN, "Child.bam")), reason="testRun data absent"
)


@needs_data
def test_read_bam_child():
    refs, records = bam.read_bam(os.path.join(TESTRUN, "Child.bam"))
    recs = list(records)
    assert len(refs) >= 1
    assert len(recs) > 100
    for r in recs[:50]:
        assert set(r.seq) <= set("ACGTN=MRSVWYHKDB")
        assert len(r.seq) == len(r.qual) or r.qual == "*"
        assert 0 <= r.flag < 1 << 12


@needs_data
def test_bam_to_paired_matches_raw_fastqs():
    """Decoded+un-revcomped pairs must equal the raw sequencing fastq pairs.

    testRun/Child.mate{1,2}.fastq are the raw input reads (the fastq-direct
    path input, runTest.fastq.sh); every pair our stranded splitter emits
    from Child.bam must byte-match the corresponding raw pair as a set
    (mate1/mate2 assignment is stream-order-of-appearance, reference:
    PassThroughSamCheck.stranded.cpp:197-279, so sides may swap)."""
    pairs = list(bam.bam_to_paired_fastq(os.path.join(TESTRUN, "Child.bam")))
    assert len(pairs) > 1000
    ours = {n: {(s1, q1), (s2, q2)} for n, s1, q1, s2, q2 in pairs}
    g1 = {n: (s, q) for n, s, q in fastq.read_fastq(os.path.join(TESTRUN, "Child.mate1.fastq"))}
    g2 = {n: (s, q) for n, s, q in fastq.read_fastq(os.path.join(TESTRUN, "Child.mate2.fastq"))}
    assert set(ours) <= set(g1)
    bad = [n for n in ours if ours[n] != {g1[n], g2[n]}]
    assert not bad, f"{len(bad)} pairs mismatch raw fastq, e.g. {bad[:3]}"


@needs_data
def test_bwa_index_reconstruction(tmp_path):
    """The test reference ships only as a BWA index; reconstruct and check
    against perfectly-aligned BAM reads (coordinate-translated to the slice)."""
    from rufus_tpu.io import bwaindex

    contigs = bwaindex.load_pac_reference(REF_FA)
    assert set(contigs) == {"5:177630000", "5:177660000"}
    assert len(contigs["5:177630000"]) == 3285261
    refs, recs = bam.read_bam(os.path.join(TESTRUN, "Child.bam"))
    slice_start = 177630000 - 1
    ok = tot = 0
    arr = contigs["5:177630000"]
    for r in recs:
        if r.flag & 0x4 or refs[r.ref_id][0] != "5":
            continue
        if r.cigar_string() not in ("150M", "151M"):
            continue
        p = r.pos - slice_start
        if p < 0 or p + len(r.seq) > len(arr):
            continue
        sub = arr[p : p + len(r.seq)].tobytes().decode()
        tot += 1
        if sum(1 for a, b in zip(sub, r.seq) if a != b) <= 5:
            ok += 1
    assert tot > 3000 and ok / tot > 0.95

    # FASTA writer round-trips through FastaReference
    p = str(tmp_path / "ref.fa")
    bwaindex.write_fasta(p, {"c1": np.frombuffer(b"ACGTN" * 30, np.uint8)})
    fr = fasta.FastaReference(p)
    assert fr.get("c1", 0, 10) == "ACGTNACGTN"


def test_fastq_roundtrip(tmp_path):
    p = str(tmp_path / "x.fastq")
    recs = [("r1", "ACGT", "IIII"), ("r2 extra", "GGTT", "!!II")]
    fastq.write_fastq(p, recs)
    back = list(fastq.read_fastq(p))
    assert back == recs


def test_fastqd_roundtrip(tmp_path):
    p = str(tmp_path / "x.fastqd")
    recs = [fastq.FastqdRecord("n1", "ACGT", "IIII", "FFRR", [1, 2, 3, 4])]
    fastq.write_fastqd(p, recs)
    back = list(fastq.read_fastqd(p))
    assert back[0] == recs[0]


def test_hashlist_roundtrip(tmp_path):
    p = str(tmp_path / "h.HashList")
    kmers = np.sort(np.array([5, 9, 1002], dtype=np.uint64))
    counts = np.array([7, 8, 9])
    hashlist.write_hashlist(p, kmers, counts, 25)
    strs, cnts = hashlist.read_hashlist(p)
    assert cnts == [7, 8, 9]
    keys = hashlist.hashlist_keys(p, 25, canonical=False)
    assert np.array_equal(keys, kmers)


def test_native_pair_stream_matches_python():
    """The C++ pair decoder must emit the identical (name, m1, q1, m2, q2)
    stream as io.bam.bam_to_paired_fastq (pairing by name, second-seen =
    mate1, 0x10 records un-reverse-complemented) — the filter stage's
    keep set depends on it."""
    import os
    import pytest

    from rufus_tpu.io import bam, native

    path = "/root/reference/testRun/Child.bam"
    if not os.path.exists(path) or not native.available():
        pytest.skip("testRun data or native lib absent")
    want = list(bam.bam_to_paired_fastq(path))
    nb = native.NativeBam(path, threads=2)
    got = []
    while True:
        names, s1, q1, l1, s2, q2, l2 = nb.read_pair_batch(512, 1024)
        if not names:
            break
        for i, nm in enumerate(names):
            a, b = int(l1[i]), int(l2[i])
            got.append((nm, s1[i, :a].tobytes().decode(),
                        q1[i, :a].tobytes().decode(),
                        s2[i, :b].tobytes().decode(),
                        q2[i, :b].tobytes().decode()))
    nb.close()
    assert got == want


@needs_data
def test_bam_writer_roundtrip(tmp_path):
    """write_bam's output re-decodes field-exactly through our own reader
    (VERDICT r3 Next #6: real BAM artifacts, not SAM text named .bam)."""
    refs, records = bam.read_bam(os.path.join(TESTRUN, "Child.bam"))
    recs = list(records)
    out = str(tmp_path / "rt.bam")
    bam.write_bam(out, refs, recs)
    refs2, it = bam.read_bam(out)
    recs2 = list(it)
    assert refs2 == refs
    assert len(recs2) == len(recs)
    for a, b in zip(recs, recs2):
        assert (a.name, a.flag, a.ref_id, a.pos, a.mapq, a.cigar, a.seq,
                a.qual, a.next_ref_id, a.next_pos, a.tlen) == (
            b.name, b.flag, b.ref_id, b.pos, b.mapq, b.cigar, b.seq,
            b.qual, b.next_ref_id, b.next_pos, b.tlen)
    # BAI exists and is structurally sound (magic, n_ref, trailing
    # unplaced count)
    import struct

    bai = open(out + ".bai", "rb").read()
    assert bai[:4] == b"BAI\x01"
    (n_ref,) = struct.unpack_from("<i", bai, 4)
    assert n_ref == len(refs)


def test_bam_writer_spec_fixture(tmp_path):
    """Hand-built records -> BAM -> decode: pins the spec encoding (seq
    nibbles incl. odd length, qual '*', unmapped record, tags)."""
    refs = [("chr1", 10000), ("chr2", 5000)]
    recs = [
        bam.BamRecord("r1", 0, 0, 100, 60, [(5, "M"), (1, "I"), (4, "M")],
                      "ACGTNACGTN", "IIIIIIIIII", -1, -1, 0),
        bam.BamRecord("r2", 16, 0, 200, 13, [(7, "M")], "GATTACA", "*",
                      -1, -1, 0),
        bam.BamRecord("r3", 4, -1, -1, 0, [], "TTT", "III", -1, -1, 0),
    ]
    out = str(tmp_path / "spec.bam")
    bam.write_bam(out, refs, recs,
                  tags_for=lambda r: bam._enc_tags(["NM:i:2", "XX:Z:hi"]))
    refs2, it = bam.read_bam(out)
    got = list(it)
    assert refs2 == refs
    assert [g.name for g in got] == ["r1", "r2", "r3"]
    assert got[0].seq == "ACGTNACGTN" and got[0].cigar == recs[0].cigar
    assert got[1].qual == "*"
    assert got[2].ref_id == -1 and got[2].seq == "TTT"


def test_native_fastq_matches_python(tmp_path):
    """The native chunked fastq scanner decodes byte-identically to the
    python reader (single and paired), incl. short reads, names with
    comments, and a final record without a trailing newline."""
    from rufus_tpu.io import native

    if not native.available():
        pytest.skip("native library not built")
    r1 = str(tmp_path / "a.R1.fastq")
    r2 = str(tmp_path / "a.R2.fastq")
    rng = np.random.default_rng(2)
    bases = "ACGT"
    recs = []
    for i in range(503):
        L = int(rng.integers(30, 151))
        s = "".join(bases[j] for j in rng.integers(0, 4, L))
        q = "".join(chr(33 + int(x)) for x in rng.integers(2, 40, L))
        recs.append((f"read{i} comment/{i}", s, q))
    for path, flip in ((r1, False), (r2, True)):
        with open(path, "w") as f:
            for n, s, q in recs:
                f.write(f"@{n}\n{s[::-1] if flip else s}\n+\n{q}\n")
        # exercise the no-trailing-newline tail
        with open(path, "rb+") as f:
            f.seek(-1, 2)
            f.truncate()

    nf = native.NativeFastq(r1)
    got = []
    while True:
        seq, lens = nf.read_batch(128, 160)
        if len(seq) == 0:
            break
        got.extend(seq[i, : lens[i]].tobytes().decode()
                   for i in range(len(seq)))
    assert got == [s for _, s, _ in recs]

    npz = native.NativeFastqPairs(r1, r2)
    names, allr = [], []
    while True:
        nm, s1, q1, l1, s2, q2, l2 = npz.read_pair_batch(100, 160)
        if not nm:
            break
        names.extend(nm)
        for i in range(len(nm)):
            allr.append((s1[i, : l1[i]].tobytes().decode(),
                         q1[i, : l1[i]].tobytes().decode(),
                         s2[i, : l2[i]].tobytes().decode()))
    assert names == [n.split()[0] for n, _, _ in recs]
    assert allr == [(s, q, s[::-1]) for _, s, q in recs]


def test_native_fastq_pair_names_overflow_lossless(tmp_path):
    """Round-4 advisor medium finding: when a batch's R1 names overflow
    the names buffer, the already-consumed record must NOT be dropped —
    the decoder parks it and returns a short batch (or -2 only when even
    the first record doesn't fit), keeping R1/R2 in perfect sync."""
    from rufus_tpu.io import native

    if not native.available():
        pytest.skip("native library not built")
    r1 = str(tmp_path / "ov.R1.fastq")
    r2 = str(tmp_path / "ov.R2.fastq")
    # names long enough that a 4096-pair batch with the initial 1 MiB cap
    # overflows repeatedly: ~600-byte names x 4096 pairs ~= 2.4 MiB
    n_recs = 4500
    recs = []
    for i in range(n_recs):
        name = f"read{i:05d}_" + "x" * 600
        s = "ACGT" * 10
        q = "I" * 40
        recs.append((name, s, q))
    for path, flip in ((r1, False), (r2, True)):
        with open(path, "w") as f:
            for n, s, q in recs:
                f.write(f"@{n} comment\n{s[::-1] if flip else s}\n+\n{q}\n")

    npz = native.NativeFastqPairs(r1, r2)
    names, seqs2 = [], []
    short_batches = 0
    while True:
        nm, s1, q1, l1, s2, q2, l2 = npz.read_pair_batch(4096, 64)
        if not nm:
            break
        if len(nm) < 4096:
            short_batches += 1
        names.extend(nm)
        seqs2.extend(s2[i, : l2[i]].tobytes().decode()
                     for i in range(len(nm)))
    npz.close()
    assert short_batches >= 1, "fixture must exercise the overflow path"
    assert names == [n for n, _, _ in recs]  # nothing dropped, in order
    assert seqs2 == [s[::-1] for _, s, _ in recs]  # R1/R2 still in sync
