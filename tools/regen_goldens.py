#!/usr/bin/env python
"""Regenerate the compiled-reference golden fixtures from one command.

Usage:
  python tools/regen_goldens.py [--bindir /tmp/refbuild] [assembly] [veryfast] [sv]

* assembly: runs the reference OverlapSam -> Overlap x3 -> OverlapRegion ->
  ReplaceQwithDinFASTQD -> ConvertFASTqD -> AnnotateOverlap chain on
  tests/golden/assembly/input.sam with the EXACT Overlap.shorter.sh:119-196
  argv (Threads=2), writing the round-by-round fixtures consumed by
  tests/test_assembly_differential.py.
* sv: delegates to tools/make_sv_fixtures.py (reference RUFUS.interpret on
  the synthetic SV scenarios) for every kind.

Binaries come from tools/build_reference_tools.sh (run automatically when
the bindir is missing).
"""

import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLD = os.path.join(REPO, "tests", "golden", "assembly")
NS = "Child.bam.generator.V2"


def ensure_bins(bindir: str):
    needed = ["OverlapSam", "Overlap", "OverlapRegion",
              "ReplaceQwithDinFASTQD", "ConvertFASTqD.to.FASTQ",
              "AnnotateOverlap", "RUFUS.interpret"]
    if all(os.path.exists(os.path.join(bindir, b)) for b in needed):
        return
    subprocess.run(["bash", os.path.join(HERE, "build_reference_tools.sh"),
                    bindir], check=True)


def regen_assembly(bindir: str, workdir: str):
    os.makedirs(os.path.join(workdir, "TempOverlap"), exist_ok=True)
    hashlist = os.path.join(GOLD, "Child.bam.generator.k25_c4.HashList")
    input_sam = os.path.join(GOLD, "input.sam")
    if not os.path.exists(input_sam):
        raise SystemExit("tests/golden/assembly/input.sam is missing — it is "
                         "the committed chain input and cannot be regenerated")
    T = "2"  # fixture provenance: Threads=2 (PARITY.md)

    def b(name):
        return os.path.join(bindir, name)

    def run(cmd, stdout=None, stdin=None):
        print("+", " ".join(cmd))
        kw = {}
        if stdout:
            kw["stdout"] = open(stdout, "w")
        if stdin:
            kw["stdin"] = open(stdin)
        subprocess.run(cmd, check=True, cwd=workdir, **kw)

    to = os.path.join(workdir, "TempOverlap")
    # Overlap.shorter.sh:127 — OverlapSam reads SAM on a path argument
    # (process substitution in the script); a regular file behaves the same
    run([b("OverlapSam"), input_sam, ".95", "20", "1",
         f"TempOverlap/{NS}.sam", NS, "1", hashlist, T])
    run([b("Overlap"), f"TempOverlap/{NS}.sam.fastqd", ".98", "100", "1",
         "FP", "20", "1", f"TempOverlap/{NS}.1", "0", T])   # sh:141
    run([b("Overlap"), f"TempOverlap/{NS}.1.fastqd", ".98", "75", "2",
         "FP", "20", "1", f"TempOverlap/{NS}.2", "1", T])   # sh:153
    run([b("Overlap"), f"TempOverlap/{NS}.2.fastqd", ".98", "50", "2",
         NS, "20", "1", f"TempOverlap/{NS}.3", "1", T])     # sh:165
    run([b("OverlapRegion"), f"TempOverlap/{NS}.3.fastqd", ".98", "50", "5",
         f"TempOverlap/{NS}.4", NS, "1", T])                # sh:176
    run([b("ReplaceQwithDinFASTQD"), f"TempOverlap/{NS}.4.fastqd"],
        stdout=os.path.join(workdir, f"{NS}.overlap.fastqd"))  # sh:190
    run([b("ConvertFASTqD.to.FASTQ"), f"{NS}.overlap.fastqd"],
        stdout=os.path.join(workdir, f"{NS}.overlap.fastq"))   # sh:191
    run([b("AnnotateOverlap"), hashlist, f"{NS}.overlap.fastq",
         f"TempOverlap/{NS}.overlap.asembly.hash.fastq"],
        stdout=os.path.join(workdir, f"{NS}.overlap.hashcount.fastq"))  # sh:194

    produced = {
        f"{NS}.sam.fastqd": os.path.join(to, f"{NS}.sam.fastqd"),
        f"{NS}.1.fastqd": os.path.join(to, f"{NS}.1.fastqd"),
        f"{NS}.2.fastqd": os.path.join(to, f"{NS}.2.fastqd"),
        f"{NS}.3.fastqd": os.path.join(to, f"{NS}.3.fastqd"),
        f"{NS}.4.fastqd": os.path.join(to, f"{NS}.4.fastqd"),
        f"{NS}.overlap.asembly.hash.fastq":
            os.path.join(to, f"{NS}.overlap.asembly.hash.fastq"),
        f"{NS}.overlap.fastqd": os.path.join(workdir, f"{NS}.overlap.fastqd"),
        f"{NS}.overlap.fastq": os.path.join(workdir, f"{NS}.overlap.fastq"),
        f"{NS}.overlap.hashcount.fastq":
            os.path.join(workdir, f"{NS}.overlap.hashcount.fastq"),
    }
    for name, src in produced.items():
        dst = os.path.join(GOLD, name)
        changed = (not os.path.exists(dst)
                   or open(src, "rb").read() != open(dst, "rb").read())
        shutil.copyfile(src, dst)
        print(f"{'UPDATED' if changed else 'unchanged'}: {name}")


def regen_veryfast(bindir: str, workdir: str):
    """Veryfast-path fixtures (Overlap.shorter.sh:90-117): OverlapSam on
    the |TLEN|>150 pairs with .99/25/3, ONE Overlap round .99/75/5/15,
    then Replace/Convert/Annotate. Pins the paired veryfast divergence
    question from VERDICT r3 weak #7."""
    os.makedirs(os.path.join(workdir, "TempOverlap"), exist_ok=True)
    hashlist = os.path.join(GOLD, "Child.bam.generator.k25_c4.HashList")
    input_sam = os.path.join(GOLD, "input.sam")
    vf_sam = os.path.join(workdir, "input.vf.sam")
    with open(input_sam) as f, open(vf_sam, "w") as out:
        for line in f:  # the reference's awk '$9 > 150 || $9 < -150'
            t = line.split("\t")
            if len(t) > 8 and abs(int(t[8])) > 150:
                out.write(line)
    T = "2"

    def b(name):
        return os.path.join(bindir, name)

    def run(cmd, stdout=None):
        print("+", " ".join(cmd))
        kw = {"stdout": open(stdout, "w")} if stdout else {}
        subprocess.run(cmd, check=True, cwd=workdir, **kw)

    run([b("OverlapSam"), vf_sam, ".99", "25", "3",
         f"TempOverlap/{NS}.sam", NS, "1", hashlist, T])     # sh:97
    run([b("Overlap"), f"TempOverlap/{NS}.sam.fastqd", ".99", "75", "5",
         NS, "15", "1", f"TempOverlap/{NS}.final", "1", T])  # sh:104
    run([b("ReplaceQwithDinFASTQD"), f"TempOverlap/{NS}.final.fastqd"],
        stdout=os.path.join(workdir, f"{NS}.overlap.fastqd"))
    run([b("ConvertFASTqD.to.FASTQ"), f"{NS}.overlap.fastqd"],
        stdout=os.path.join(workdir, f"{NS}.overlap.fastq"))
    run([b("AnnotateOverlap"), hashlist, f"{NS}.overlap.fastq",
         f"TempOverlap/{NS}.overlap.asembly.hash.fastq"],
        stdout=os.path.join(workdir, f"{NS}.overlap.hashcount.fastq"))
    produced = {
        f"vf.{NS}.sam.fastqd":
            os.path.join(workdir, "TempOverlap", f"{NS}.sam.fastqd"),
        f"vf.{NS}.final.fastqd":
            os.path.join(workdir, "TempOverlap", f"{NS}.final.fastqd"),
        f"vf.{NS}.overlap.hashcount.fastq":
            os.path.join(workdir, f"{NS}.overlap.hashcount.fastq"),
    }
    for name, src in produced.items():
        dst = os.path.join(GOLD, name)
        changed = (not os.path.exists(dst)
                   or open(src, "rb").read() != open(dst, "rb").read())
        shutil.copyfile(src, dst)
        print(f"{'UPDATED' if changed else 'unchanged'}: {name}")


def regen_sv(bindir: str):
    subprocess.run([sys.executable, os.path.join(HERE, "make_sv_fixtures.py"),
                    os.path.join(bindir, "RUFUS.interpret")], check=True)


def main():
    args = sys.argv[1:]
    bindir = "/tmp/refbuild"
    if "--bindir" in args:
        i = args.index("--bindir")
        bindir = args[i + 1]
        del args[i : i + 2]
    kinds = args or ["assembly", "veryfast", "sv"]
    ensure_bins(bindir)
    import tempfile

    if "assembly" in kinds:
        with tempfile.TemporaryDirectory() as wd:
            regen_assembly(bindir, wd)
    if "veryfast" in kinds:
        with tempfile.TemporaryDirectory() as wd:
            regen_veryfast(bindir, wd)
    if "sv" in kinds:
        regen_sv(bindir)


if __name__ == "__main__":
    main()
