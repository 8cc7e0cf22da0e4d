import numpy as np
import jax.numpy as jnp

from rufus_tpu.ops import codec, count, filter as rfilter


def _batch(seqs, quals):
    L = max(len(s) for s in seqs)
    r = np.full((len(seqs), L), ord("N"), np.uint8)
    q = np.full((len(seqs), L), ord("!"), np.uint8)
    for i, (s, qq) in enumerate(zip(seqs, quals)):
        r[i, : len(s)] = np.frombuffer(s.encode(), np.uint8)
        q[i, : len(qq)] = np.frombuffer(qq.encode(), np.uint8)
    lens = np.array([len(s) for s in seqs], np.int32)
    return jnp.asarray(r), jnp.asarray(q), jnp.asarray(lens)


def _ref_hits(seq, qual, k, min_q, table_strs):
    """Literal transcription of the RUFUS.Filter.cpp:199-221 scan."""
    both = set()
    for t in table_strs:
        both.add(t)
        both.add(codec.revcomp_str(t))
    hits = 0
    streak = 0
    for i in range(0, len(seq) - 1):
        if (ord(qual[i]) - 33) < min_q or seq[i] == "N":
            streak = 0
        else:
            streak += 1
        if streak >= k:
            if seq[i - k + 1 : i + 1] in both:
                hits += 1
    return hits


def test_window_hits_matches_reference_scan():
    rng = np.random.default_rng(3)
    k, min_q = 7, 15
    table_strs = ["ACGTACG", "GGGTTTC"]
    tbl = np.sort(np.array([codec.str_to_kmer(codec.canonical_str(s)) for s in table_strs], dtype=np.uint64))
    seqs, quals = [], []
    for _ in range(40):
        L = int(rng.integers(10, 30))
        s = "".join(rng.choice(list("ACGTN"), L, p=[0.23, 0.23, 0.23, 0.23, 0.08]))
        # inject table kmer sometimes
        if rng.random() < 0.5 and L > k + 2:
            p = int(rng.integers(0, L - k))
            s = s[:p] + table_strs[int(rng.integers(0, 2))] + s[p + k :]
        q = "".join(chr(int(x)) for x in rng.integers(33 + 2, 33 + 40, L))
        seqs.append(s)
        quals.append(q)
    r, q, lens = _batch(seqs, quals)
    hits = np.asarray(rfilter.window_hits(r, q, lens, jnp.asarray(tbl), k, min_q))
    for i, (s, qq) in enumerate(zip(seqs, quals)):
        assert hits[i] == _ref_hits(s, qq, k, min_q, table_strs), (i, s, qq)


def test_filter_pairs_or_semantics():
    k, min_q = 5, 15
    tbl = np.array([codec.str_to_kmer(codec.canonical_str("ACGTA"))], dtype=np.uint64)
    good_q = "I" * 20
    m1 = ["ACGTAACGTAACGTAACGTA", "CCCCCCCCCCCCCCCCCCCC"]
    m2 = ["CCCCCCCCCCCCCCCCCCCC", "CCCCCCCCCCCCCCCCCCCC"]
    r1, q1, l1 = _batch(m1, [good_q] * 2)
    r2, q2, l2 = _batch(m2, [good_q] * 2)
    keep, h1, h2 = rfilter.filter_pairs(r1, q1, l1, r2, q2, l2, jnp.asarray(tbl), k, min_q, 1)
    keep = np.asarray(keep)
    assert keep[0] and not keep[1]
