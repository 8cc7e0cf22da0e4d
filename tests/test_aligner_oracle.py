"""Differential validation of the seed-and-extend aligner.

The reference pipeline uses `bwa mem` for mutant reads (runRufus.sh:1000),
contigs (Overlap.shorter.sh:209) and MOB elements (:225); we replaced it
with rufus_tpu.align.aligner. Real BWA cannot run here (it is fetched from
GitHub at reference build time — externals/bwa.cmake — and this image has
no network), so the differential oracle is an INDEPENDENT textbook Gotoh
local aligner with bwa-mem scoring (match 1, mismatch 4, gapo 6, gape 1):
a scalar three-matrix DP with none of the production aligner's shortcuts
(no seeding, no banding, no windowing, no closed-form gap scan, no clip
extension).

What is asserted, chosen by what RUFUS.interpret actually consumes:
  * optimality: end-to-end score == oracle optimal local score, and the
    reported CIGAR re-scores to exactly that score at the reported
    position (so seeding/banding/windowing lose nothing on SNV/indel
    reads) — interpret's parseMutations walks the CIGAR literally
    (RUFUS.interpret.cpp:3016-3166);
  * placement: pos is the oracle's optimal placement;
  * MAPQ binning: unique placements clear interpret's mapQual > 10 gate
    (RUFUS.interpret.cpp:6403), exact-repeat placements get MAPQ 0;
  * split behavior: chimeric contigs yield primary+supplementary with
    complementary query intervals and the m/c clip patterns the SV passes
    key on (ClipPattern, RUFUS.interpret.cpp:713).
"""

import numpy as np
import pytest

from rufus_tpu.align.aligner import (Aligner, Alignment, RefIndex, encode,
                                     GAP_EXT, GAP_OPEN, MATCH, MISMATCH)

BASES = np.frombuffer(b"ACGT", np.uint8)


def oracle_local(q: np.ndarray, r: np.ndarray):
    """Scalar Gotoh local alignment: returns (best score, ref end pos).

    Three explicit matrices, plain O(nm) loops (numpy row ops only for
    speed, but the recurrence is the standard one — E and F each track
    their own open/extend chain, unlike the production kernel's
    prefix-max closed form)."""
    n, m = len(q), len(r)
    NEG = -(10 ** 6)
    H = np.zeros(m + 1, dtype=np.int32)
    E = np.full(m + 1, NEG, dtype=np.int32)  # gap in query (consumes ref)
    F = np.full(m + 1, NEG, dtype=np.int32)  # gap in ref (consumes query)
    best, best_j = 0, 0
    sub_row = np.where(r[None, :] == q[:, None], MATCH, MISMATCH)
    for i in range(1, n + 1):
        prevH = H.copy()
        H = np.zeros(m + 1, dtype=np.int32)
        for j in range(1, m + 1):
            E[j] = max(E[j - 1] - GAP_EXT, H[j - 1] - GAP_OPEN - GAP_EXT)
            F[j] = max(F[j] - GAP_EXT, prevH[j] - GAP_OPEN - GAP_EXT)
            h = max(0, prevH[j - 1] + sub_row[i - 1, j - 1], E[j], F[j])
            H[j] = h
            if h > best:
                best, best_j = int(h), j
    return best, best_j


def rescore_cigar(aln: Alignment, genome: str) -> int:
    """Re-derive the local alignment score from (pos, CIGAR, seq) alone."""
    qi, rj = 0, aln.pos
    score = 0
    for n, op in aln.cigar:
        if op in "SH":
            qi += n if op == "S" else 0
        elif op == "M":
            for t in range(n):
                score += MATCH if aln.seq[qi + t] == genome[rj + t] else MISMATCH
            qi += n
            rj += n
        elif op == "I":
            score -= GAP_OPEN + GAP_EXT * n
            qi += n
        elif op == "D":
            score -= GAP_OPEN + GAP_EXT * n
            rj += n
    return score


def make_ref(n=4000, seed=1):
    rng = np.random.default_rng(seed)
    return rng.choice(BASES, size=n)


def revcomp(s: str) -> str:
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


@pytest.fixture(scope="module")
def ctx():
    ref = make_ref()
    idx = RefIndex({"chr": ref})
    return Aligner(idx), ref, ref.tobytes().decode()


def _mutate(seq: str, kind: str, rng) -> str:
    L = len(seq)
    p = int(rng.integers(30, L - 30))
    if kind == "snv":
        alt = "ACGT"[(("ACGT".index(seq[p])) + 1) % 4]
        return seq[:p] + alt + seq[p + 1:]
    if kind == "ins":
        ins = "".join(rng.choice(list("ACGT"), size=4))
        return seq[:p] + ins + seq[p:]
    if kind == "del":
        return seq[:p] + seq[p + 5:]
    return seq


@pytest.mark.parametrize("kind", ["clean", "snv", "ins", "del"])
def test_score_and_placement_match_oracle(ctx, kind):
    """End-to-end aligner score == independent-DP optimal score, and the
    reported CIGAR re-scores to it at the reported position."""
    al, ref, genome = ctx
    # fixed per-kind seed: Python str hash is randomized per process, so a
    # hash()-derived seed would make CI failures unreproducible locally
    rng = np.random.default_rng(
        {"clean": 0, "snv": 1, "ins": 2, "del": 3}[kind])
    n_checked = 0
    for t in range(8):
        start = int(rng.integers(0, len(ref) - 160))
        read = genome[start : start + 150]
        read = _mutate(read, kind, rng) if kind != "clean" else read
        q = encode(np.frombuffer(read.encode(), np.uint8))
        r = encode(ref)
        opt, _ = oracle_local(q, r)
        res = al.align_seq(f"r{t}", read, "I" * len(read))
        a = res[0]
        assert not a.is_unmapped, f"{kind} read {t} unmapped"
        assert a.score == opt, (
            f"{kind} read {t}: aligner score {a.score} != oracle {opt}")
        assert rescore_cigar(a, genome) == opt, (
            f"{kind} read {t}: CIGAR at pos {a.pos} rescores to "
            f"{rescore_cigar(a, genome)}, oracle {opt}")
        n_checked += 1
    assert n_checked == 8


def test_reverse_strand_matches_oracle(ctx):
    al, ref, genome = ctx
    rng = np.random.default_rng(7)
    for t in range(5):
        start = int(rng.integers(0, len(ref) - 160))
        fwd = _mutate(genome[start : start + 150], "snv", rng)
        read = revcomp(fwd)
        q = encode(np.frombuffer(fwd.encode(), np.uint8))
        opt, _ = oracle_local(q, encode(ref))
        a = al.align_seq(f"rc{t}", read, "I" * len(read))[0]
        assert a.is_reverse
        assert a.score == opt
        assert rescore_cigar(a, genome) == opt


def test_mapq_unique_clears_interpret_gate(ctx):
    """Unique 150bp placements must clear mapQual > 10
    (RUFUS.interpret.cpp:6403) or every call would be dropped."""
    al, ref, genome = ctx
    rng = np.random.default_rng(11)
    for t in range(10):
        start = int(rng.integers(0, len(ref) - 160))
        read = genome[start : start + 150]
        a = al.align_seq(f"u{t}", read, "I" * 150)[0]
        assert a.mapq > 10
        assert a.pos == start


def test_mapq_zero_on_exact_repeat():
    """A read from a duplicated segment has two equal-score placements —
    MAPQ must be 0 (bwa-mem convention), which interpret uses to skip
    ambiguous contigs."""
    rng = np.random.default_rng(3)
    seg = rng.choice(BASES, size=400)
    spacer = rng.choice(BASES, size=1000)
    ref = np.concatenate([spacer, seg, spacer[::-1], seg, spacer])
    idx = RefIndex({"chr": ref})
    al = Aligner(idx)
    genome = ref.tobytes().decode()
    read = genome[1100:1250]  # inside the first copy of seg
    a = al.align_seq("rep", read, "I" * 150)[0]
    assert a.mapq == 0


def test_chimeric_split_clip_patterns():
    """A two-locus junction contig must produce primary+supplementary
    whose clip patterns are complementary (one m..c, one c..m) — the SV
    DEL/DUP pass's mc/cm test (RUFUS.interpret.cpp:6090-6327) depends on
    exactly this shape."""
    ref = make_ref(20000, seed=5)
    idx = RefIndex({"chr": ref})
    al = Aligner(idx)
    genome = ref.tobytes().decode()
    contig = genome[3000:3300] + genome[9000:9300]
    res = al.align_seq("chim", contig, "I" * len(contig), splits=True)
    assert len(res) >= 2, "no supplementary for chimeric contig"
    prim, supp = res[0], res[1]
    spans = sorted([(a.query_start(),
                     a.query_start() + a.query_aligned_len()) for a in res[:2]])
    # complementary halves covering the whole contig with small overlap
    assert spans[0][0] <= 10
    assert spans[1][1] >= len(contig) - 10
    assert spans[1][0] - spans[0][1] <= 40
    positions = sorted(a.pos for a in (prim, supp))
    assert abs(positions[0] - 3000) <= 5
    assert abs(positions[1] - 9000) <= 5
    # clip patterns: the half matching first must END in a clip; the half
    # matching second must START with a clip
    def pattern(a):
        first = a.cigar[0][1] if a.cigar else "?"
        last = a.cigar[-1][1] if a.cigar else "?"
        return ("c" if first in "SH" else "m") + ("c" if last in "SH" else "m")
    pats = {pattern(prim), pattern(supp)}
    assert pats == {"mc", "cm"}, pats


def test_indel_cigar_shape(ctx):
    """Planted 5bp deletion / 4bp insertion must surface as a D/I op of
    exactly that length (parseMutations reads the op run lengths as the
    allele, RUFUS.interpret.cpp:2594-2657)."""
    al, ref, genome = ctx
    rng = np.random.default_rng(13)
    for _ in range(5):
        start = int(rng.integers(0, len(ref) - 200))
        clean = genome[start : start + 150]
        del_read = _mutate(clean, "del", rng)
        a = al.align_seq("d", del_read, "I" * len(del_read))[0]
        ops = [op for _, op in a.cigar]
        dels = [n for n, op in a.cigar if op == "D"]
        assert dels == [5], (a.cigar_string(), "expected one 5D")
        ins_read = _mutate(clean, "ins", rng)
        a = al.align_seq("i", ins_read, "I" * len(ins_read))[0]
        inss = [n for n, op in a.cigar if op == "I"]
        assert inss == [4], (a.cigar_string(), "expected one 4I")
