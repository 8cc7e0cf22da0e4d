"""Tumor-normal end-to-end (BASELINE.json config #5; reference flow:
scripts/RunRUFUS.Tumor.sh / RunRUFUS.Trio.sh:37-105 with fixed
MutantMinCov=5).

Fixture: T0 (normal) = the testRun Child reads plus a shared germline-
like read set at a synthetic locus; T1 (tumor) = the same plus a somatic
ALT-carrying read set at that locus. Running subject=T1 vs control=T0
with the --tumor preset (min_cov=5) must

  * call the spiked somatic SNV, and
  * suppress every germline site — in particular the trio's X-DeNovo
    5:177630000:12896 T>G, whose alt reads are present in BOTH samples
    and whose k-mers therefore cancel in the subtract
    (merge_files.cc:147-153 semantics).
"""

import os

import numpy as np
import pytest

TESTRUN = "/root/reference/testRun"
REF = "/root/reference/resources/references/small_test_human_reference_v37_decoys.fa"
MOB = "/root/reference/resources/primate_non-LTR_Retrotransposon.fasta"

needs_data = pytest.mark.skipif(
    not os.path.exists(os.path.join(TESTRUN, "Child.bam")),
    reason="testRun data absent")

SOMA_POS = 30_000  # 0-based position of the somatic SNV; sequence there
# is complexity-rich (100000 sits in a GTTT repeat whose multi-mapping
# contigs fail interpret's MAPQ gate)
N_ALT, N_REF = 12, 15
L = 151


def _revcomp(s: str) -> str:
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def _write_pairs(f1, f2, pairs):
    for name, s1, q1, s2, q2 in pairs:
        f1.write(f"@{name}\n{s1}\n+\n{q1}\n")
        f2.write(f"@{name}\n{s2}\n+\n{q2}\n")


def _locus_pairs(contig: np.ndarray, alt_base: str | None, tag: str, n: int):
    """Proper pairs around SOMA_POS; mate1 spans the site (with the ALT
    substituted when alt_base is given), mate2 sits downstream in
    sequencing orientation (revcomp), the raw-fastq convention of
    runTest.fastq.sh inputs."""
    rng = np.random.default_rng({"germ": 1, "soma": 2}[tag])
    out = []
    q = "I" * L
    for i in range(n):
        off = 20 + int(rng.integers(0, L - 40))  # variant offset in read1
        p0 = SOMA_POS - off
        s1 = contig[p0 : p0 + L].tobytes().decode()
        if alt_base is not None:
            s1 = s1[:off] + alt_base + s1[off + 1 :]
        if i % 2 == 0:
            # site-covering read on the FORWARD strand, mate downstream
            m0 = p0 + L + 40 + int(rng.integers(0, 60))
            s2 = _revcomp(contig[m0 : m0 + L].tobytes().decode())
        else:
            # site-covering read on the REVERSE strand, mate upstream —
            # single-strand support trips interpret's SB filter
            # (RUFUS.interpret.cpp strand_bias > 0.99999)
            m0 = p0 - L - 40 - int(rng.integers(0, 60))
            s1 = _revcomp(s1)
            s2 = contig[m0 : m0 + L].tobytes().decode()
        out.append((f"{tag}:{i}", s1, q, s2, q))
    return out


@needs_data
def test_tumor_normal_somatic_call(tmp_path):
    from rufus_tpu.io import bam, bwaindex
    from rufus_tpu.pipeline import RufusConfig, RufusPipeline

    contigs = bwaindex.load_pac_reference(REF)
    slice5 = contigs["5:177630000"]
    ref_base = chr(slice5[SOMA_POS])
    alt_base = {"A": "G", "C": "T", "G": "A", "T": "C"}[ref_base]

    child_pairs = list(bam.bam_to_paired_fastq(
        os.path.join(TESTRUN, "Child.bam")))
    germline = _locus_pairs(slice5, None, "germ", N_REF)
    somatic = _locus_pairs(slice5, alt_base, "soma", N_ALT)

    t0_1, t0_2 = str(tmp_path / "T0.mate1.fastq"), str(tmp_path / "T0.mate2.fastq")
    t1_1, t1_2 = str(tmp_path / "T1.mate1.fastq"), str(tmp_path / "T1.mate2.fastq")
    with open(t0_1, "w") as f1, open(t0_2, "w") as f2:
        _write_pairs(f1, f2, child_pairs)
        _write_pairs(f1, f2, germline)
    with open(t1_1, "w") as f1, open(t1_2, "w") as f2:
        _write_pairs(f1, f2, child_pairs)
        _write_pairs(f1, f2, germline)
        _write_pairs(f1, f2, somatic)

    cfg = RufusConfig(
        subject=t1_1 + "," + t1_2,
        controls=[t0_1 + "," + t0_2],
        ref=REF, k=25, workdir=str(tmp_path), mob_fasta=MOB,
        fastq_a=t1_1, fastq_b=t1_2,
        min_cov=5,  # the --tumor preset (pipeline/__main__.py:62)
    )
    final = RufusPipeline(cfg).run()
    rows = [l.rstrip("\n").split("\t")
            for l in open(final) if not l.startswith("#")]

    # the somatic site is called with the right alleles and ALT support
    soma = [r for r in rows if r[1] == str(SOMA_POS + 1)]
    assert len(soma) == 1, f"somatic site missing/duplicated: {rows}"
    r = soma[0]
    assert (r[3], r[4]) == (ref_base, alt_base)
    fmt = dict(zip(r[8].split(":"), r[9].split(":")))
    assert "1" in fmt["GT"] and int(fmt["AO"]) >= 5
    norm = dict(zip(r[8].split(":"), r[10].split(":")))
    assert norm["AO"] == "0", "normal sample must show no ALT support"

    # germline suppression: the trio's X-DeNovo site (present in both
    # samples) must NOT be called, nor anything else
    assert not any(r[1] == "12896" for r in rows), "germline site leaked"
    assert len(rows) == 1, f"unexpected extra calls: {rows}"
