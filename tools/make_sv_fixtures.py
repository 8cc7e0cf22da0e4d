#!/usr/bin/env python
"""Generate SV-call golden fixtures by running the REFERENCE
RUFUS.interpret binary on the synthetic scenarios in tests/sv_scenarios.py.

Usage: python tools/make_sv_fixtures.py <ref_interpret_binary> [kind ...]

For each kind it writes tests/golden/sv_<kind>.call containing the
reference binary's VCF data rows, and prints our interpret's rows next to
them for eyeball comparison. Run `pytest tests/test_sv_parity.py` after to
confirm parity.

Build the reference binary (fastahack operator<< needs its missing-return
UB patched or it aborts with std::bad_cast — see tools/ref_interpret_diff.py
provenance):

  g++ -O2 -fopenmp -std=c++11 -I src -I src/externals -I src/externals/fastahack \
      RUFUS.interpret.cpp Util.cpp Fasta.patched.cpp split.cpp -o RUFUS.interpret
"""

import os
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
REF_FA_CACHE = "/tmp/rufus_sv_synth_ref.fa"


def ensure_ref_fa():
    if os.path.exists(REF_FA_CACHE):
        return REF_FA_CACHE
    from sv_scenarios import synthetic_reference

    contigs = synthetic_reference()
    with open(REF_FA_CACHE, "w") as f:
        for name, arr in contigs.items():
            f.write(f">{name}\n")
            s = arr.tobytes().decode()
            for i in range(0, len(s), 60):
                f.write(s[i : i + 60] + "\n")
    return REF_FA_CACHE


def run_reference(binary, w, lines, par_alt, par_ref, dist):
    fa = ensure_ref_fa()
    stdin_path = w("stdin.sam")
    with open(stdin_path, "w") as f:
        f.writelines(lines)
    out_stub = w("REF.out.bam")
    cmd = [binary, "-mob", w("MOB.sam"), "-mod", dist, "-mQ", "10",
           "-r", fa, "-hf", w("t.HashList"), "-o", out_stub, "-m", "1000"]
    for pa, pr in zip(par_alt, par_ref):
        cmd += ["-c", pa, "-cR", pr]
    cmd += ["-sR", w("ref.sample.tab"), "-s", w("sample.tab"),
            "-e", w("RepRefHash")]
    with open(stdin_path) as f:
        r = subprocess.run(cmd, stdin=f, capture_output=True, text=True,
                           timeout=600, env={**os.environ,
                                             "OMP_NUM_THREADS": "1"})
    with open(w("REF.log"), "w") as f:
        f.write(r.stdout + "\n==STDERR==\n" + r.stderr)
    vcf = out_stub + ".vcf"
    if not os.path.exists(vcf):
        print(f"  reference produced no VCF (exit {r.returncode}); "
              f"log: {w('REF.log')}")
        return None
    return [l for l in open(vcf) if not l.startswith("#")]


def run_ours(w, lines, par_alt, par_ref, dist, contigs):
    from rufus_tpu.interpret import run_interpret

    class RefWrap:
        def __init__(self, c):
            self.seqs = c

        def contig_array(self, n):
            return self.seqs[n]

    out = run_interpret(lines, RefWrap(contigs), dist, w("t.HashList"),
                        w("ours.generator.V2.bam"), par_alt, par_ref,
                        w("sample.tab"), w("ref.sample.tab"),
                        w("RepRefHash"), w("MOB.sam"))
    return [l for l in open(out) if not l.startswith("#")]


def main():
    import gzip
    import shutil

    from sv_scenarios import build_scenario

    binary = sys.argv[1]
    kinds = sys.argv[2:] or ["trans", "inv", "mob", "lastditch"]
    distgz = os.path.join(GOLD, "Child.Jhash.histo.7.7.dist.gz")
    for kind in kinds:
        print(f"=== {kind} ===")
        tmp = Path(tempfile.mkdtemp(prefix=f"sv_{kind}_"))
        dist = str(tmp / "child.dist")
        with gzip.open(distgz, "rb") as f, open(dist, "wb") as o:
            shutil.copyfileobj(f, o)
        contigs, lines, w, par_alt, par_ref = build_scenario(tmp, kind)
        ref_rows = run_reference(binary, w, lines, par_alt, par_ref, dist)
        if ref_rows is not None:
            print("".join("  REF: " + l for l in ref_rows) or "  REF: (none)")
            if ref_rows:
                with open(os.path.join(GOLD, f"sv_{kind}.call"), "w") as f:
                    f.writelines(ref_rows)
                print(f"  wrote tests/golden/sv_{kind}.call")
        our_rows = run_ours(w, lines, par_alt, par_ref, dist, contigs)
        print("".join("  OURS: " + l for l in our_rows) or "  OURS: (none)")
        print(f"  scenario dir: {tmp}")


if __name__ == "__main__":
    main()
