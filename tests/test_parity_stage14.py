"""Golden parity tests for stages 1-4 (count, model, subtract, filter).

Fixtures in tests/golden/ were produced by the REFERENCE toolchain compiled
from /root/reference sources (modified jellyfish count/histo/merge/query,
patched-UB ModelDist, RUFUS.Filter) on the testRun trio; see SURVEY.md
sections 3.1. These tests assert byte/set parity of our device pipeline.
"""

import gzip
import os
import shutil

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "golden")
TESTRUN = "/root/reference/testRun"

needs_data = pytest.mark.skipif(
    not os.path.exists(os.path.join(TESTRUN, "Child.bam")), reason="testRun data absent"
)


def _gunzip(path, tmp_path):
    out = str(tmp_path / os.path.basename(path)[:-3])
    with gzip.open(path, "rb") as f, open(out, "wb") as o:
        shutil.copyfileobj(f, o)
    return out


@pytest.fixture(scope="module")
def tables(tmp_path_factory):
    """Count tables for the trio built by the device pipeline."""
    import jax.numpy as jnp
    from rufus_tpu.io import bam, fastq
    from rufus_tpu.ops import count

    out = {}
    for name in ("Child", "Mother", "Father"):
        reads = [s for _, s, _ in bam.bam_to_fastq(os.path.join(TESTRUN, f"{name}.bam"))]
        chunks = []
        for i in range(0, len(reads), 512):
            r, q, lens = fastq.batch_reads(reads[i : i + 512], pad_to=160)
            chunks.append(count.count_reads_batch(jnp.asarray(r), 25))
        out[name] = count.KmerTable.from_rle_chunks(25, chunks, lower_count=2)
    return out


@needs_data
def test_histo_byte_parity(tables, tmp_path):
    from rufus_tpu.models import modeldist

    for name in ("Child", "Mother", "Father"):
        golden = _gunzip(os.path.join(GOLD, f"{name}.Jhash.histo.gz"), tmp_path)
        mine = str(tmp_path / f"my.{name}.histo")
        modeldist.write_histo(mine, tables[name].histo())
        assert open(mine).read() == open(golden).read(), f"{name} histo differs"


@needs_data
def test_modeldist_byte_parity(tmp_path):
    from rufus_tpu.models import modeldist

    golden_histo = _gunzip(os.path.join(GOLD, "Child.Jhash.histo.gz"), tmp_path)
    fit = modeldist.fit_model(golden_histo, 25, 150)
    assert fit.kcutoff == 4 and fit.raw_sc == 25
    stub = str(tmp_path / "out.histo")
    modeldist.write_outputs(fit, stub)
    for ext in (".7.7.dist", ".7.7.model"):
        golden = gzip.open(os.path.join(GOLD, f"Child.Jhash.histo{ext}.gz"), "rt").read()
        assert open(stub + ext).read() == golden, f"{ext} differs from reference output"


def test_modeldist_haploid_byte_parity(tmp_path):
    """Byte parity vs the prebuilt reference ModelDist.haploid binary
    (reference src/ModelDist.haploid — checked-in ELF, not in CMake) run on
    the golden Child histo: `ModelDist.haploid Child.histo 25 150 2`."""
    from rufus_tpu.models import modeldist

    golden_histo = _gunzip(os.path.join(GOLD, "Child.Jhash.histo.gz"), tmp_path)
    fit = modeldist.fit_model(golden_histo, 25, 150, haploid=True)
    assert fit.kcutoff == 5 and fit.raw_sc == 25
    stub = str(tmp_path / "hap.histo")
    modeldist.write_outputs(fit, stub, haploid=True)
    for ext in (".7.7.dist", ".7.7.model"):
        golden = gzip.open(os.path.join(GOLD, f"Child.haploid{ext}.gz"), "rt").read()
        assert open(stub + ext).read() == golden, f"haploid {ext} differs"
    assert os.path.exists(stub + ".7.7boom.prob")  # created empty (:388)
    assert os.path.getsize(stub + ".7.7boom.prob") == 0


@needs_data
def test_merge_and_hashlist_parity(tables):
    from rufus_tpu.ops import codec, count

    mut = count.subtract_unique([tables[n] for n in ("Child", "Mother", "Father")], merge_min=5)
    golden_merge = sorted(l.split()[0] for l in open(os.path.join(GOLD, "merge.temp")))
    assert codec.kmers_to_strs(mut, 25) == golden_merge

    subj = tables["Child"].query(mut)
    keep = (subj >= 4) & (subj <= 125)
    mine = sorted((s, int(c)) for s, c in zip(codec.kmers_to_strs(mut[keep], 25), subj[keep]))
    gold = sorted(
        (l.split()[0], int(l.split()[1]))
        for l in open(os.path.join(GOLD, "Child.k25_c4.HashList"))
    )
    assert mine == gold


@needs_data
def test_filter_parity():
    import jax.numpy as jnp
    from rufus_tpu.io import bam, fastq, hashlist
    from rufus_tpu.ops import filter as rfilter

    keys = hashlist.hashlist_keys(os.path.join(GOLD, "Child.k25_c4.HashList"), 25)
    pairs = list(bam.bam_to_paired_fastq(os.path.join(TESTRUN, "Child.bam")))
    names = [p[0] for p in pairs]
    r1, q1, l1 = fastq.batch_reads([p[1] for p in pairs], [p[2] for p in pairs], pad_to=160)
    r2, q2, l2 = fastq.batch_reads([p[3] for p in pairs], [p[4] for p in pairs], pad_to=160)
    keep, _, _ = rfilter.filter_pairs(
        jnp.asarray(r1), jnp.asarray(q1), jnp.asarray(l1),
        jnp.asarray(r2), jnp.asarray(q2), jnp.asarray(l2),
        jnp.asarray(keys), 25, 15, 1,
    )
    mine = {n for n, m in zip(names, np.asarray(keep)) if m}
    golden = {l.strip() for l in open(os.path.join(GOLD, "Child.Mutations.names.txt"))}
    assert mine == golden
