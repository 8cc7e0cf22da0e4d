#!/usr/bin/env python
"""At-scale end-to-end run (VERDICT r3 next #5): synthetic >=50 Mbp
genome, >=5M read pairs per sample, 3 samples (trio), spiked de novo +
mosaic SNVs, full pipeline with --flat-index and the on-device count
path. Records per-stage wall-clock, peak RSS and recovered variants in
SCALE_r{N}.json.

This is the first full-pipeline evidence above the 5MB testRun slice:
it exercises the O(batch) host-memory claim, the per-batch route-cap
retry, the flat (memmapped) seed index, the device-resident tables and
the routed genotype pulls at a scale where they matter.

Run on the TPU host:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/scale_run.py [tag]
Optional env: SCALE_GENOME (bp), SCALE_PAIRS (pairs/sample), SCALE_WORK.
"""

import json
import os
import resource
import sys
import time

import numpy as np

GENOME = int(os.environ.get("SCALE_GENOME", 50_000_000))
PAIRS = int(os.environ.get("SCALE_PAIRS", 5_000_000))
L = 150
INSERT = 400
ERR = 0.001
N_DENOVO = 12
N_MOSAIC = 4
SEED = 4242

WORK = os.environ.get("SCALE_WORK", "/tmp/rufus_scale")

_COMP = np.zeros(256, np.uint8)
for _a, _b in zip(b"ACGTN", b"TGCAN"):
    _COMP[_a] = _b


def gen_sample(sample, genome, rng, spikes=()):
    """Write {sample}.R1/.R2 paired coverage fastqs plus {sample}.all
    (R1+R2 concatenated, the counting modality). `spikes` is a list of
    (pos, alt_byte, vaf) applied per covering read."""
    bases = np.frombuffer(b"ACGT", np.uint8)
    r1p = os.path.join(WORK, f"{sample}.R1.fastq")
    r2p = os.path.join(WORK, f"{sample}.R2.fastq")
    allp = os.path.join(WORK, f"{sample}.all.fastq")
    if os.path.exists(allp):
        return r1p, r2p, allp
    t0 = time.time()
    n = PAIRS
    chunk = 1 << 19
    qual = "I" * L
    with open(r1p + ".tmp", "w") as f1, open(r2p + ".tmp", "w") as f2:
        done = 0
        while done < n:
            m = min(chunk, n - done)
            starts = rng.integers(0, GENOME - INSERT, size=m)
            st2 = starts + INSERT - L
            a1 = genome[starts[:, None] + np.arange(L)[None, :]].copy()
            a2 = genome[st2[:, None] + np.arange(L)[None, :]].copy()
            for pos, alt, vaf in spikes:
                for r, st in ((a1, starts), (a2, st2)):
                    cover = (st <= pos) & (pos < st + L)
                    take = cover & (rng.random(m) < vaf)
                    rows = np.nonzero(take)[0]
                    if len(rows):
                        r[rows, pos - st[rows]] = alt
            for r in (a1, a2):
                em = rng.random(r.shape) < ERR
                r[em] = bases[rng.integers(0, 4, size=int(em.sum()))]
            a2 = _COMP[a2][:, ::-1]  # reverse strand mate
            b1, b2 = [], []
            for i in range(m):
                nm = done + i
                b1.append(f"@p{nm}\n{a1[i].tobytes().decode()}\n+\n{qual}\n")
                b2.append(f"@p{nm}\n{a2[i].tobytes().decode()}\n+\n{qual}\n")
            f1.write("".join(b1))
            f2.write("".join(b2))
            done += m
    os.rename(r1p + ".tmp", r1p)
    os.rename(r2p + ".tmp", r2p)
    with open(allp + ".tmp", "wb") as out:
        for p in (r1p, r2p):
            with open(p, "rb") as f:
                while True:
                    buf = f.read(1 << 24)
                    if not buf:
                        break
                    out.write(buf)
    os.rename(allp + ".tmp", allp)
    print(f"  {sample}: {n} pairs in {time.time()-t0:.0f}s", flush=True)
    return r1p, r2p, allp


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r04"
    os.makedirs(WORK, exist_ok=True)
    rng = np.random.default_rng(SEED)
    bases = np.frombuffer(b"ACGT", np.uint8)
    t_all = time.time()

    ref_fa = os.path.join(WORK, "ref.fa")
    gpath = os.path.join(WORK, "genome.npy")
    if not os.path.exists(gpath):
        genome = rng.choice(bases, size=GENOME)
        np.save(gpath, genome)
        with open(ref_fa, "w") as f:
            f.write(">21\n")
            g = genome.tobytes().decode()
            for i in range(0, len(g), 10000):
                f.write(g[i : i + 10000] + "\n")
    else:
        genome = np.load(gpath)

    # spiked truth: de novo (subject-only, VAF .5) + mosaic (VAF .25)
    site_rng = np.random.default_rng(SEED + 1)
    sites = np.sort(site_rng.choice(
        np.arange(1000, GENOME - 1000, dtype=np.int64),
        size=N_DENOVO + N_MOSAIC, replace=False))
    truth = []
    for i, pos in enumerate(sites):
        ref_b = genome[pos]
        alt = bases[(int(np.nonzero(bases == ref_b)[0][0]) + 1) % 4]
        kind = "denovo" if i < N_DENOVO else "mosaic"
        truth.append({"pos": int(pos), "ref": chr(ref_b),
                      "alt": chr(int(alt)), "kind": kind})
    child_spikes = [(t["pos"], ord(t["alt"]),
                     0.5 if t["kind"] == "denovo" else 0.25) for t in truth]
    with open(os.path.join(WORK, "truth.json"), "w") as f:
        json.dump(truth, f, indent=1)

    print("generating samples...", flush=True)
    c_r1, c_r2, c_all = gen_sample(
        "child", genome, np.random.default_rng(SEED + 11), child_spikes)
    m_all = gen_sample("mother", genome,
                       np.random.default_rng(SEED + 12))[2]
    f_all = gen_sample("father", genome,
                       np.random.default_rng(SEED + 13))[2]
    del genome

    # ---- run the pipeline ----
    import rufus_tpu  # noqa: F401
    from rufus_tpu.pipeline import RufusConfig, RufusPipeline

    workdir = os.path.join(WORK, "run")
    cfg = RufusConfig(
        subject=c_all, fastq_a=c_r1, fastq_b=c_r2,
        controls=[m_all, f_all],
        ref=ref_fa, k=25, workdir=workdir,
        flat_index=os.path.join(WORK, "ref.flat"),
        batch_size=65536, mosaic=True,
        min_cov=int(os.environ.get("SCALE_MIN_COV", "0")) or None,
        table_cap0=int(os.environ.get("SCALE_TABLE_CAP0", str(1 << 27))),
    )
    t0 = time.time()
    pipe = RufusPipeline(cfg)
    final = pipe.run()
    wall = time.time() - t0
    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    rows = [l for l in open(final) if not l.startswith("#")]
    called = set()
    for l in rows:
        f = l.split("\t")
        called.add((int(f[1]), f[3], f[4]))
    recovered = []
    for t in truth:
        hit = any(abs(p - (t["pos"] + 1)) <= 2 and a == t["alt"]
                  for (p, r, a) in called)
        recovered.append({**t, "recovered": bool(hit)})

    stages = []
    trace = os.path.join(workdir, "Intermediates", "trace.jsonl")
    if os.path.exists(trace):
        stages = [json.loads(l) for l in open(trace)]

    n_dn = sum(1 for r in recovered
               if r["kind"] == "denovo" and r["recovered"])
    n_mo = sum(1 for r in recovered
               if r["kind"] == "mosaic" and r["recovered"])
    import jax

    out = {
        "genome_bp": GENOME,
        "pairs_per_sample": PAIRS,
        "samples": 3,
        "coverage_x": round(2 * PAIRS * L / GENOME, 1),
        "spiked": {"denovo": N_DENOVO, "mosaic": N_MOSAIC},
        "recovered_denovo": n_dn,
        "recovered_mosaic": n_mo,
        "recovered": recovered,
        "vcf_rows": len(rows),
        "pipeline_wall_s": round(wall, 1),
        "total_wall_s": round(time.time() - t_all, 1),
        "peak_rss_mb": round(peak_rss_mb, 1),
        "stages": stages,
        "device": str(jax.devices()[0]),
    }
    with open(f"SCALE_{tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("recovered", "stages")}, indent=1))
    print(f"recovered: de novo {n_dn}/{N_DENOVO}, mosaic {n_mo}/{N_MOSAIC}")


if __name__ == "__main__":
    main()
