"""Synthetic SV scenario builder shared by the parity tests and the
reference-differential fixture generator (tools/make_sv_fixtures.py).

Each scenario fabricates the junction contigs a real RUFUS run would
assemble for one SV type, pushes them through OUR aligner + annotate
stack, and materializes every interpret input (SAM lines with SA tags,
HashList, per-sample genotyping pulls, MOB sam) in a directory — a file
set both our `run_interpret` and the reference RUFUS.interpret binary
accept, so the two can be diffed on identical inputs.

Junction structure per kind (reference pass that must fire):
  del       g[P-300:P] + g[P+D:P+D+300]           (DEL pass, 6090-6327)
  dup       g[P+D-300:P+D] + g[P:P+300]           (DUP pass)
  trans     two contigs joining chrA:P to chrB:Q  (BND TRANS pair, 6416+)
  inv       the two breakpoint contigs of an inversion (INV pass)
  mob       split contig into a mobile element + polyA partner
            (<INS:ME:MOB> pass, 5896-6089)
  lastditch one lone cross-chr junction contig    (LastDitch, 4963-5116)
"""

import os

REF = "/root/reference/resources/references/small_test_human_reference_v37_decoys.fa"
K = 25


def _revcomp(s: str) -> str:
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def synthetic_reference():
    """Two genuinely distinct chromosomes. The shipped test reference's two
    contigs are the SAME 3.2MB region offset by 30kb (5:177660000 is a
    suffix of 5:177630000), so any cross-contig junction is interpretable
    as an intra-chromosomal event with MAPQ 0 — useless for BND/TRANS
    fixtures. Deterministic seed keeps fixtures reproducible."""
    import numpy as np

    rng = np.random.default_rng(1234)
    bases = np.frombuffer(b"ACGT", np.uint8)
    return {"1": rng.choice(bases, size=60000),
            "2": rng.choice(bases, size=60000)}


def mob_library():
    """Synthetic mobile-element library (the primate_non-LTR fasta role).
    Seeded distinct from the genome so MOB hits come only from planted
    content."""
    import numpy as np

    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACGT", np.uint8)
    return {"L1HS": rng.choice(bases, size=6000)}


def build_scenario(tmp_path, kind: str):
    """Returns (contigs_dict, stdin_lines, wpath, par_alt, par_ref)."""
    from rufus_tpu.assembly import annotate
    from rufus_tpu.align import Aligner, RefIndex
    from rufus_tpu.align import sam as rsam
    from rufus_tpu.ops import codec, count

    contigs = synthetic_reference()
    gA = contigs["1"].tobytes().decode()
    gB = contigs["2"].tobytes().decode()
    P, Q, D = 15000, 24000, 2000
    mob_lines = []

    def node(i, seq):
        return (f"NODE_SV{kind}.V2_{i}_L{len(seq)}_D20:10:10:", seq)

    if kind == "del":
        specs = [node(0, gA[P - 300 : P] + gA[P + D : P + D + 300])]
    elif kind == "dup":
        specs = [node(0, gA[P + D - 300 : P + D] + gA[P : P + 300])]
    elif kind == "trans":
        # both breakpoint contigs join chrA:P to chrB:Q
        specs = [node(0, gA[P - 300 : P] + gB[Q : Q + 300]),
                 node(1, gA[P - 280 : P] + gB[Q : Q + 320])]
    elif kind == "inv":
        # left junction: gA up to P, then reverse strand from the inverted
        # segment's far end; right junction mirrors it
        E = P + 4000
        specs = [node(0, gA[P - 300 : P] + _revcomp(gA[E - 300 : E])),
                 node(1, _revcomp(gA[P : P + 300]) + gA[E : E + 300])]
    elif kind == "mob":
        # "mobile element" = a sequence that also exists on the second
        # synthetic chromosome, so the MOB half split-aligns there (standing
        # in for an L1 with genomic copies); partner contig carries the
        # polyA tail of the insertion. mob_lines marks which contig gets a
        # MOB.sam alignment (name resolved to the full in-SAM qname below —
        # checkMob matches the literal stdin name, RUFUS.interpret.cpp:1414)
        mob_seq = gB[Q : Q + 300]
        specs = [node(0, gA[P - 300 : P] + mob_seq),
                 node(1, "A" * 30 + gA[P : P + 300])]
        mob_lines = [(specs[0][0], "L1HS", 100)]
    elif kind == "lastditch":
        specs = [node(0, gA[P - 300 : P] + gB[Q : Q + 300])]
    elif kind == "copypaste":
        # same-chr distant junction pair -> SVTYPE=COPY:PASTE branch of the
        # pair pass (same shape as trans but r.chr == ra1.chr)
        S = 35000
        specs = [node(0, gA[P - 300 : P] + gA[S : S + 300]),
                 node(1, gA[P - 280 : P] + gA[S : S + 320])]
    elif kind == "largeins":
        # mob-shaped junction pair with NO MOB.sam entry -> falls through
        # to the LargeInsert branch
        specs = [node(0, gA[P - 300 : P] + gB[Q : Q + 300]),
                 node(1, "A" * 30 + gA[P : P + 300])]
    elif kind == "mobglocal":
        # MOB insert whose element content is two SHORT (25bp) L1HS
        # segments eliding 400bp of the element: only the reference's MOB
        # scoring profile (bwa mem -E 0,0 -O 6,6 -w 500 -L 0,0,
        # Overlap.shorter.sh:225 — free gap extension, wide band) bridges
        # the 400bp deletion for score 2*25-6=44; under bwa-mem DEFAULTS
        # the gap costs 406 and the best local hit is a single 25bp
        # segment scoring 25 < min_score 30 -> NO MOB alignment at all.
        # MOB.sam is generated by OUR aligner (below), not hand-written,
        # so this fixture probes the scoring preset itself.
        l1 = mob_library()["L1HS"].tobytes().decode()
        insert = l1[1000:1025] + l1[1425:1450]
        specs = [node(0, gA[P - 300 : P] + insert),
                 node(1, "A" * 30 + gA[P : P + 300])]
        mob_lines = [("ALIGN", specs[0][0], 0)]
    elif kind == "orphanmob":
        # single MOB-aligned split contig with no polyA partner -> orphan
        # single-contig MOB branch
        specs = [node(0, gA[P - 300 : P] + gB[Q : Q + 300])]
        mob_lines = [(specs[0][0], "L1HS", 100)]
    else:
        raise ValueError(kind)

    # HashList: canonical k-mers crossing each contig's junction(s)
    hl = set()
    for _, seq in specs:
        for junc in (300, len(seq) - 300):
            lo = max(0, junc - K + 1)
            hi = min(len(seq) - K + 1, junc + K - 1)
            for i in range(lo, hi):
                w = seq[i : i + K]
                if len(w) == K:
                    hl.add(codec.canonical_str(w))
    hl = sorted(hl)
    w = lambda n: str(tmp_path / n)
    with open(w("t.HashList"), "w") as f:
        for s in hl:
            f.write(f"{s} 18\n")

    idx = RefIndex(contigs)
    al = Aligner(idx)
    annotated = []
    for name, seq in specs:
        ann, _ = annotate.annotate_overlap(
            [(s, 18) for s in hl], [(name, seq, chr(53) * len(seq))], K)
        annotated.append(ann[0])

    alns = []
    for cname, cseq, cqual in annotated:
        alns.extend(al.align_seq(cname, cseq, cqual, splits=True))
    alns = rsam.sort_alignments(alns)
    by_name = {}
    for a in alns:
        by_name.setdefault(a.qname, []).append(a)
    lines = []
    for a in alns:
        others = [x for x in by_name[a.qname] if x is not a and not x.is_unmapped]
        sa, nsa = "", 0
        if others and not a.is_unmapped:
            entries = "".join(
                f"{o.ref_name},{o.pos + 1},{'-' if o.is_reverse else '+'},"
                f"{o.cigar_string()},{o.mapq},{o.nm};" for o in others)
            sa, nsa = f"\tSA:Z:{entries}", len(others)
        line = rsam.to_sam_line(a, tags=f"NM:i:{a.nm}\tAS:i:{a.score}" + sa)
        fld = line.split("\t")
        fld[0] = f"{fld[0]}:SA={nsa}"
        lines.append("\t".join(fld) + "\n")

    # genotyping pulls: junction kmers subject-only (18), everything else
    # shared (30/28); reference context covered at normal depth
    ck = count.KmerTable.from_strings(
        K, [seq for _, seq in specs], canonical=False)
    ctg_kmers = codec.kmers_to_strs(ck.keys, K)
    canon = [codec.canonical_str(s) for s in ctg_kmers]
    jset = set(hl)
    with open(w("sample.tab"), "w") as f:
        for s, c in zip(ctg_kmers, canon):
            f.write(f"{s} {18 if c in jset else 30}\n")
    par_alt, par_ref = [], []
    for par in ("Mother", "Father"):
        pa = w(f"x.overlap.asembly.hash.fastq.{par}.bam.generator.Jhash")
        with open(pa, "w") as f:
            for s, c in zip(ctg_kmers, canon):
                f.write(f"{s} {0 if c in jset else 28}\n")
        par_alt.append(pa)
    refseqs = []
    for a in alns:
        if a.is_unmapped:
            continue
        g = contigs[a.ref_name].tobytes().decode()
        refseqs.append(g[max(0, a.pos - 100) : a.pos + a.ref_span() + 100])
    rk = count.KmerTable.from_strings(K, refseqs, canonical=False)
    ref_kmers = codec.kmers_to_strs(rk.keys, K)
    with open(w("ref.sample.tab"), "w") as f:
        for s in ref_kmers:
            f.write(f"{s} 30\n")
    for par in ("Mother", "Father"):
        pr = w(f"x.overlap.asembly.hash.fastq.Ref.{par}.bam.generator.Jhash")
        with open(pr, "w") as f:
            for s in ref_kmers:
                f.write(f"{s} 28\n")
        par_ref.append(pr)
    open(w("RepRefHash"), "w").close()
    with open(w("MOB.sam"), "w") as f:
        f.write("@HD\tVN:1.6\tSO:coordinate\n")
        f.write("@SQ\tSN:L1HS\tLN:6000\n")
        for base_name, rname, pos in mob_lines:
            if base_name == "ALIGN":
                # mobglocal: MOB.sam comes from OUR aligner with the MOB
                # glocal scoring preset (driver.py stage_contig_align path)
                from rufus_tpu.align.aligner import MOB_SCORING

                full = next(l.split("\t")[0] for l in lines
                            if l.startswith(rname))
                seq = dict(specs)[rname]
                mal = Aligner(RefIndex(mob_library()), scoring=MOB_SCORING)
                a = mal.align_seq(full, seq, "I" * len(seq))[0]
                if not a.is_unmapped:
                    f.write(rsam.to_sam_line(a, tags=f"AS:i:{a.score}")
                            + "\n")
                continue
            # the mob half of the contig maps to the element with a strong
            # score; qname must be the FULL stdin name (with :MH/:SA=
            # suffixes) and seq must not be a homopolymer (MobAllA filter,
            # RUFUS.interpret.cpp:4772) or the entry is dropped
            full = next(l.split("\t")[0] for l in lines
                        if l.startswith(base_name))
            seq = dict(specs)[base_name]
            f.write(f"{full}\t0\t{rname}\t{pos}\t60\t300S300M\t*\t0\t0\t"
                    f"{seq}\t{'I' * len(seq)}\tAS:i:290\n")
    return contigs, lines, w, par_alt, par_ref
