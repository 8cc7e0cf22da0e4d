"""Utils layer: tracing, VCF tools, shims, diagnostics, plots."""

import os

import numpy as np
import pytest

from rufus_tpu.ops.count import KmerTable
from rufus_tpu.utils import StageTimer, Throughput, rss_mb
from rufus_tpu.utils import diagnostics, shims, vcftools
from rufus_tpu.utils.trace import progress_file

VCF = [
    "##fileformat=VCFv4.1",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2",
    "1\t100\tX\tT\tG\t25\tPASS\tAO=19\tGT:DP\t0/1:39\t0/0:23",
    "1\t100\tX\tT\tG\t25\tPASS\tAO=19\tGT:DP\t0/1:39\t0/0:23",
    "chr2\t500\tD\t" + "A" * 80 + "\tA\t12\tPASS\tRN=1\tGT:DP\t0/1:10\t0/0:9",
    "3\t900\tS\tN\t<DEL>\t30\tPASS\tEND=1500;SVLEN=-600\tGT:DP\t0/1:8\t0/0:7",
]


def test_trace_timer_and_throughput(tmp_path):
    log = str(tmp_path / "trace.jsonl")
    st = StageTimer(log_path=log)
    with st.stage("count", sample="child"):
        _ = sum(range(1000))
    assert st.stages[0]["stage"] == "count"
    assert st.stages[0]["wall_s"] >= 0
    assert os.path.exists(log)
    assert rss_mb() > 10  # a python process is bigger than 10MB
    tp = Throughput("reads", report_every=10)
    tp.add(25)
    assert tp.rate() > 0
    assert "count" in st.summary()


def test_progress_file(tmp_path):
    p = str(tmp_path / "chr.progress")
    note, done = progress_file(p)
    note("1"); note("1"); note("2"); done()
    lines = open(p).read().splitlines()
    assert lines == ["1", "2", "booya"]  # RunRUFUS.Trio.sh:83 checks booya


def test_vcf_to_sv_bed():
    rows = list(vcftools.vcf_to_sv_bed(VCF))
    # SNV row excluded; 80bp deletion + symbolic DEL included, chr stripped
    assert rows == ["2\t499\t579\tD-12", "3\t899\t1500\tS-30"]


def test_qual_dist():
    out = vcftools.qual_dist(VCF)
    assert out[25].startswith("25; ++; 2")  # two QUAL=25 rows
    assert "~~~~~~~~~" in out
    assert any(l.startswith("30;") for l in out)


def test_remove_duplicate_calls():
    out = list(vcftools.remove_duplicate_calls(VCF))
    body = [l for l in out if not l.startswith("#")]
    assert len(body) == 3  # adjacent dup collapsed


def test_check_duplicate_calls_bed():
    bed = [
        "1\t100\tT\tG\t.\t.\tS1",
        "1\t100\tT\tG\t.\t.\tS2",
        "1\t100\tT\tG\t.\t.\tS2",
        "2\t200\tA\tC\t.\t.\tS1",
    ]
    out = list(vcftools.check_duplicate_calls_bed(bed))
    assert out[0].endswith("UNIUQE")
    assert out[1].startswith("+++")  # different sample, same key
    # the perl only updates its sample var on NEW keys, so the second S2
    # repeat still compares vs S1 and prints again (reproduced)
    assert out[2].startswith("+++")
    assert len(out) == 4
    assert out[3].endswith("UNIUQE")


def test_convert_vcf_to_r_format():
    out = list(vcftools.convert_vcf_to_r_format(VCF))
    assert out[0].startswith("CHROM\tPOS")
    assert "S1-GT" in out[0] and "S2-DP" in out[0]
    snv = out[1].split("\t")
    assert snv[9] == "snv" and snv[8] == "0"
    deletion = out[3].split("\t")
    assert deletion[9] == "del" and deletion[8] == "79"
    sym = out[4].split("\t")
    assert sym[9] == "del" and sym[8] == "-600"


def test_histo_base_qualities():
    sam = ["r1\t0\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII"]
    vals = list(vcftools.histo_base_qualities(sam))
    assert vals == [40, 40, 40, 40]


def test_mob_to_dist():
    lines = ["h1", "h2", "h3", "h4", "h5", "1 2 3", "4 5"]
    rows, total = vcftools.mob_to_dist(lines)
    assert rows == [6, 9] and total == 15


def test_pull_kmer_counts_from_sequence():
    t = KmerTable.from_strings(5, ["ACGTACGTACGT"])
    hdr, rows = vcftools.pull_kmer_counts_from_sequence(
        "ACGTACG", 5, {"subj": t})
    assert hdr == "sequence\tsubj"
    assert rows[0].split("\t")[0] == "ACGTA"
    assert int(rows[0].split("\t")[1]) > 0


def test_sv_gene_check():
    gff = [
        "##gff-version 3",
        "2\tsrc\tgene\t450\t650\t.\t+\t.\tID=gene:G1;Name=MYGENE",
        "2\tsrc\tgene\t9000\t9500\t.\t+\t.\tID=gene:G2;Name=OTHER",
    ]
    assert vcftools.sv_gene_check(VCF, gff) == ["MYGENE"]


def test_fastq_to_sam_roundtrip():
    fq = ["@r1 extra", "ACGTACGTACGTACGTACGTACGTACGT", "+",
          "IIIIIIIIIIIIIIIIIIIIIIIIIIII"]
    sam = list(shims.fastq_to_sam(fq))
    assert sam[0].split("\t")[0] == "r1"
    back = list(shims.sam_to_fastq(sam))
    assert back == ["@r1", fq[1], "+", fq[3]]
    # sub-25bp reads dropped by sam_to_fastq
    assert list(shims.sam_to_fastq(shims.fastq_to_sam(
        ["@s", "ACGT", "+", "IIII"]))) == []


def test_multiline_fasta_shim():
    fa = [">NODE_1 len=8 reads=3", "ACGT", "ACGT", ">NODE_2 len=4 reads=1",
          "TTTT"]
    out = list(shims.multiline_fasta_to_singleline_fastq(fa))
    assert out[0] == ">NODE_1_L8_D3:5:5"
    assert out[1] == "ACGTACGT"
    assert out[4] == ">NODE_2_L4_D1:5:5"
    assert len(out) == 8


def test_dump_sam_read_kmer_count():
    table = KmerTable.from_strings(5, ["AAAAACCCCC"])
    sam = ["@HD\tVN:1.6",
           "r1\t0\t*\t0\t0\t*\t*\t0\t0\tAAAAACC\tIIIIIII",
           "r2\t0\t*\t0\t0\t*\t*\t0\t0\tGGGGGGG\tIIIIIII"]
    rows = list(diagnostics.dump_sam_read_kmer_count(sam, table, 5))
    assert rows[0] == "r1\t3\t3"
    assert rows[1] == "r2\t3\t3"  # GGGGG canonicalizes to CCCCC


def test_model_plot(tmp_path):
    pytest.importorskip("matplotlib")
    from rufus_tpu.utils import plots
    # minimal .model file shaped like modeldist.write_outputs
    p = str(tmp_path / "x.histo.7.7.model")
    with open(p, "w") as f:
        f.write("3\n7\n12345\n30\n")
        f.write("0.5\t0.5\t\n")
        f.write("K\tRawCount\tErrorModel\tContSubtract\tModelSum\t1x\t2x\t3x\t4x\t5x\t6x\t7x\t8x\t9x\n")
        for k in range(1, 60):
            f.write(f"{k}\t{1000//k}\t{500//k}\t0\t{800//k}" + "\t0.1" * 9 + "\n")
    out = plots.plot_model(p, str(tmp_path / "m.pdf"))
    assert os.path.getsize(out) > 500
