#!/usr/bin/env python
"""Differential harness: run the REFERENCE RUFUS.interpret binary on OUR
pipeline's intermediate files and diff the VCF rows against our interpret.

Usage:
  python tools/ref_interpret_diff.py <workdir> <ref_interpret_binary>

<workdir> must contain the stage outputs of a pipeline run up to
stage_contig_align (interpret.stdin + inputs.json as written by the e2e
dump, see tools/dump_interpret_inputs.py) — then this script invokes:

  RUFUS.interpret -mob MOB.sam -mod subj.dist -mQ 10 -r ref.fa -hf HashList
      -o contigs.bam -m 1000 (-c par.tab -cR par.ref.tab)xN
      -sR subj.ref.tab -s subj.tab -e RepRefHash   < interpret.stdin

(the exact flag layout of Overlap.shorter.sh:346) and prints both VCFs'
data rows for eyeball/automated comparison.
"""

import json
import os
import shutil
import subprocess
import sys

REF_FA = ("/root/reference/resources/references/"
          "small_test_human_reference_v37_decoys.fa")


def main(workdir: str, binary: str):
    inputs = json.load(open(os.path.join(workdir, "inputs.json")))
    stdin_path = os.path.join(workdir, "interpret.stdin")
    # fastahack writes ref.fa.fai next to the fasta; /root/reference ships
    # only the BWA index (no plain .fa) and is read-only — reconstruct the
    # fasta from the .pac (same loader the pipeline uses)
    fa = os.path.join(workdir, "ref.fa")
    if not os.path.exists(fa):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from rufus_tpu.io import bwaindex

        contigs = bwaindex.load_pac_reference(REF_FA)
        with open(fa, "w") as f:
            for name, arr in contigs.items():
                f.write(f">{name}\n")
                s = arr.tobytes().decode()
                for i in range(0, len(s), 60):
                    f.write(s[i : i + 60] + "\n")
    hl = [p for p in os.listdir(workdir)
          if ".HashList" in p and p.endswith(".HashList")]
    hl_path = os.path.join(workdir, sorted(hl)[0])
    dist = [p for p in os.listdir(workdir) if p.endswith(".7.7.dist")]
    dist_path = os.path.join(workdir, sorted(dist)[0])
    out_stub = os.path.join(workdir, "REF.contigs.bam")
    cmd = [binary, "-mob", inputs["mob_sam"], "-mod", dist_path,
           "-mQ", "10", "-r", fa, "-hf", hl_path, "-o", out_stub,
           "-m", "1000"]
    for pa, pr in zip(inputs["par_alt"], inputs["par_ref"]):
        cmd += ["-c", pa, "-cR", pr]
    cmd += ["-sR", inputs["subj_ref"], "-s", inputs["subj_alt"],
            "-e", inputs["rep_ref"]]
    print("+", " ".join(cmd), flush=True)
    with open(stdin_path) as f:
        r = subprocess.run(cmd, stdin=f, capture_output=True, text=True,
                           timeout=600)
    log = os.path.join(workdir, "REF.interpret.log")
    with open(log, "w") as f:
        f.write(r.stdout + "\n=== STDERR ===\n" + r.stderr)
    print(f"reference interpret exit={r.returncode}, log: {log}")
    ref_vcf = out_stub + ".vcf"
    print("\n=== REFERENCE VCF rows ===")
    for l in open(ref_vcf):
        if not l.startswith("#"):
            print(l.rstrip())
    ours = [p for p in os.listdir(workdir)
            if p.endswith(".bam.vcf") and not p.startswith("REF.")]
    if ours:
        print("\n=== OUR VCF rows ===")
        for l in open(os.path.join(workdir, sorted(ours)[0])):
            if not l.startswith("#"):
                print(l.rstrip())


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2
         else "/tmp/refbuild/RUFUS.interpret")
