#!/bin/bash
# Build the reference C++ tools used by the golden-fixture differential
# harnesses (PARITY.md "compiled-reference differential harness").
#
# Usage: tools/build_reference_tools.sh [outdir]     (default /tmp/refbuild)
#
# Builds: OverlapSam, Overlap, OverlapRegion, ReplaceQwithDinFASTQD,
# ConvertFASTqD.to.FASTQ, AnnotateOverlap, RUFUS.interpret, ModelDist.
#
# The vendored fastahack's operator<<(ostream&, FastaIndex&)
# (externals/fastahack/Fasta.cpp:80-90) is missing its return statement —
# UB that manifests as std::bad_cast when interpret generates a .fai — so
# a patched copy is compiled instead (build fix only, no behavior choice).
set -euo pipefail

REF=${REF:-/root/reference}
OUT=${1:-/tmp/refbuild}
SRC="$REF/src"
mkdir -p "$OUT"

# --- patch fastahack (append the missing `return output;`) ---------------
python3 - "$SRC/externals/fastahack/Fasta.cpp" "$OUT/Fasta.patched.cpp" <<'EOF'
import sys
src, dst = sys.argv[1], sys.argv[2]
lines = open(src).read().splitlines(keepends=True)
out, infn = [], False
for i, ln in enumerate(lines):
    if ln.startswith("ostream& operator<<(ostream& output, FastaIndex& "):
        infn = True
    if infn and ln.rstrip() == "}":
        out.append("    return output;\n")
        infn = False
    out.append(ln)
open(dst, "w").writelines(out)
EOF

CXX="g++ -O2 -fopenmp -std=c++11 -I $SRC -I $SRC/externals -I $SRC/externals/fastahack"

build() {  # build <exe-name> <main.cpp> [extra sources...]
    local exe="$1"; shift
    if [ -x "$OUT/$exe" ] && [ "$OUT/$exe" -nt "$SRC/$1" ]; then
        echo "up-to-date: $exe"; return
    fi
    echo "building $exe"
    (cd "$SRC" && $CXX "$@" -o "$OUT/$exe")
}

build OverlapSam OverlapSam.cpp Util.cpp
build Overlap Overlap.cpp Util.cpp
build OverlapRegion OverlapRegion.cpp Util.cpp
build ReplaceQwithDinFASTQD ReplaceQwithDinFASTQD.cpp Util.cpp
build ConvertFASTqD.to.FASTQ ConvertFASTqD.to.FASTQ.cpp Util.cpp
build AnnotateOverlap AnnotateOverlap.cpp Util.cpp
build ModelDist ModelDist.cpp Util.cpp

if [ -x "$OUT/RUFUS.interpret" ] && [ "$OUT/RUFUS.interpret" -nt "$SRC/RUFUS.interpret.cpp" ]; then
    echo "up-to-date: RUFUS.interpret"
else
    echo "building RUFUS.interpret"
    (cd "$SRC" && $CXX RUFUS.interpret.cpp Util.cpp "$OUT/Fasta.patched.cpp" \
        externals/fastahack/split.cpp -o "$OUT/RUFUS.interpret")
fi

echo "reference tools built in $OUT"
