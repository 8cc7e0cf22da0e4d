"""Input-modality e2e tests mirroring runDevTest.sh and runTest.fastq.sh.

runDevTest: exclude-table mode (-e Mother.Jhash) with fixed -m 8 on the
resources/testData trio. runTest.fastq: fastq-direct input with -q1/-q2.
Both must recover the X-DeNovo 5:177630000 T>G call.
"""

import os

import pytest

TESTDATA = "/root/reference/resources/testData"
TESTRUN = "/root/reference/testRun"
REF = "/root/reference/resources/references/small_test_human_reference_v37_decoys.fa"
MOB = "/root/reference/resources/primate_non-LTR_Retrotransposon.fasta"

needs_data = pytest.mark.skipif(
    not os.path.exists(os.path.join(TESTDATA, "Child.bam")),
    reason="testData absent",
)


def _assert_golden_call(final):
    rows = [l for l in open(final) if not l.startswith("#")]
    assert len(rows) >= 1
    f = rows[0].rstrip("\n").split("\t")
    assert f[0] == "5:177630000" and f[1] == "12896"
    assert (f[3], f[4]) == ("T", "G")
    fmt = dict(zip(f[8].split(":"), f[9].split(":")))
    assert fmt["GT"] == "0/1"


@needs_data
def test_exclude_mode_devtest(tmp_path):
    """-e exclude table + -m 8 (runDevTest.sh)."""
    import jax.numpy as jnp
    import numpy as np

    from rufus_tpu.io import bam, fastq
    from rufus_tpu.ops import count
    from rufus_tpu.pipeline import RufusConfig, RufusPipeline

    # build the Mother exclude table with our own counter (the reference
    # uses a .Jhash produced by a prior run)
    reads = [s for _, s, _ in bam.bam_to_fastq(os.path.join(TESTDATA, "Mother.bam"))]
    chunks = []
    for i in range(0, len(reads), 512):
        r, _, _ = fastq.batch_reads(reads[i : i + 512], pad_to=160)
        chunks.append(count.count_reads_batch(jnp.asarray(r), 25))
    mother = count.KmerTable.from_rle_chunks(25, chunks, lower_count=2)
    ex_path = str(tmp_path / "mother.exclude.npz")
    mother.save(ex_path)

    cfg = RufusConfig(
        subject=os.path.join(TESTDATA, "Child.bam"),
        controls=[os.path.join(TESTDATA, "Father.bam")],
        ref=REF, k=25, workdir=str(tmp_path), mob_fasta=MOB,
        min_cov=8, exclude_hash=ex_path,
    )
    final = RufusPipeline(cfg).run()
    _assert_golden_call(final)


@needs_data
def test_fastq_input_mode(tmp_path):
    """fastq-direct trio (-q1/-q2 filter path, runTest.fastq.sh)."""
    from rufus_tpu.pipeline import RufusConfig, RufusPipeline

    tr = lambda n: os.path.join(TESTRUN, n)
    cfg = RufusConfig(
        subject=tr("Child.mate1.fastq") + "," + tr("Child.mate2.fastq"),
        controls=[tr("Mother.mate1.fastq") + "," + tr("Mother.mate2.fastq"),
                  tr("Father.mate1.fastq") + "," + tr("Father.mate2.fastq")],
        ref=REF, k=25, workdir=str(tmp_path), mob_fasta=MOB,
        fastq_a=tr("Child.mate1.fastq"), fastq_b=tr("Child.mate2.fastq"),
    )
    final = RufusPipeline(cfg).run()
    _assert_golden_call(final)


@needs_data
def test_veryfast_assembly_mode(tmp_path):
    """-speed veryfast: long-insert pair selection (TLEN filter,
    Overlap.shorter.sh:98) + the two-round assembly; the golden call
    must still come out."""
    from rufus_tpu.pipeline import RufusConfig, RufusPipeline

    cfg = RufusConfig(
        subject=os.path.join(TESTRUN, "Child.bam"),
        controls=[os.path.join(TESTRUN, "Mother.bam"),
                  os.path.join(TESTRUN, "Father.bam")],
        ref=REF, k=25, workdir=str(tmp_path), mob_fasta=MOB,
        assembly_speed="veryfast",
    )
    final = RufusPipeline(cfg).run()
    _assert_golden_call(final)
