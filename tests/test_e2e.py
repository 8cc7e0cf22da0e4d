"""End-to-end golden test: testRun trio BAMs -> FINAL.vcf single call.

The reference's runTest.sh criterion (README.md:60-73). Our target is the
published golden call's variant and sample columns; INFO fields derive
from the current reference source's behavior (the published line predates
several code changes — see tests/test_parity_stage14.py docstring).
"""

import os

import pytest

TESTRUN = "/root/reference/testRun"
REF = "/root/reference/resources/references/small_test_human_reference_v37_decoys.fa"
MOB = "/root/reference/resources/primate_non-LTR_Retrotransposon.fasta"

needs_data = pytest.mark.skipif(
    not os.path.exists(os.path.join(TESTRUN, "Child.bam")), reason="testRun data absent"
)


@needs_data
def test_trio_golden_call(tmp_path):
    from rufus_tpu.pipeline import RufusConfig, RufusPipeline

    cfg = RufusConfig(
        subject=os.path.join(TESTRUN, "Child.bam"),
        controls=[os.path.join(TESTRUN, "Mother.bam"),
                  os.path.join(TESTRUN, "Father.bam")],
        ref=REF, k=25, workdir=str(tmp_path), mob_fasta=MOB,
    )
    final = RufusPipeline(cfg).run()
    rows = [l for l in open(final) if not l.startswith("#")]
    assert len(rows) == 1, f"expected exactly one call, got {rows}"
    # FULL-row pin (every field, not a projection): this is the
    # differential-blessed row — the reference RUFUS.interpret compiled
    # from the current source prints it byte-identically on this
    # pipeline's intermediates (tools/ref_interpret_diff.py), and the
    # whole assembly chain producing RN's contig is byte-identical to the
    # compiled reference assembly tools (tests/test_assembly_differential
    # .py). The PUBLISHED README row (L273/QUAL=25) is unattainable from
    # the current reference source — see PARITY.md "published-row gap".
    assert rows[0].rstrip("\n") == (
        "5:177630000\t12896\tX-DeNovo\tT\tG\t100\tPASS\t"
        "PH=none;CP=283/537;EN=1.82424,3.39908,3.45282,3.4183,3.32193,"
        "TCTGGCTCCTTTCCCTCGCCCACCCTGTCCTCATCCTGCAGGTATCTGAG;FEX=PASS;"
        "FS=25/25;RN=NODE_Child.bam.generator.V2_0_L537_D20:8:11::MH0:SA=0;"
        "MQ=60;cigar=537M;SB=0.421053;AS=2-1;CVT=X;"
        "HD=19_19_19_19_19_19_19_19_21_20_20_20_20_20_20_19_18_18_18_18_"
        "18_18_18_18_18_;AO=19;VT=X\t"
        "GT:DP:RO:AO\t0/1:39:20:19\t0/0:23:23:0\t0/0:23:23:0")
    f = rows[0].rstrip("\n").split("\t")
    assert f[0] == "5:177630000"
    assert f[1] == "12896"
    assert f[2] == "X-DeNovo"
    assert (f[3], f[4]) == ("T", "G")
    # QUAL = supporting/possible*100 (RUFUS.interpret.cpp:2927). The
    # published golden says 25, but that predates the current reference
    # source AND reflects bwa's shorter contig (L273): the reference
    # binary compiled from the current source and fed THIS pipeline's
    # intermediates prints exactly this row with QUAL=100 and FS=25/25
    # (differential: tools/ref_interpret_diff.py, 2026-08-20); the only
    # divergent fields are the parents' DP/RO, where the reference's
    # shadowed-C bug (RUFUS.interpret.cpp:1738) returns uninitialized
    # memory and we resolve the UB to the published golden values.
    assert f[5] == "100"
    info0 = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
    assert info0["FS"] == "25/25"
    assert f[6] == "PASS"
    fmt = dict(zip(f[8].split(":"), f[9].split(":")))
    assert fmt["GT"] == "0/1" and fmt["DP"] == "39"
    assert fmt["RO"] == "20" and fmt["AO"] == "19"
    assert f[10] == "0/0:23:23:0"  # Mother (published golden)
    assert f[11] == "0/0:23:23:0"  # Father (published golden)
    info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
    assert info["MQ"] == "60"
    assert info["AO"] == "19"
    assert info["CVT"] == "X" and info["VT"] == "X"

    # bgzip+tabix outputs (runRufus.sh:1127-1128): the indexed lookup of
    # the call site must return exactly the golden row
    from rufus_tpu.io import bgzf

    assert os.path.exists(final + ".gz") and os.path.exists(final + ".gz.tbi")
    hits = bgzf.tabix_query(final + ".gz", "5:177630000", 12890, 12900)
    assert len(hits) == 1 and hits[0].split("\t")[1] == "12896"
    assert bgzf.tabix_query(final + ".gz", "5:177630000", 0, 1000) == []
