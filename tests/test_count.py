import numpy as np
import jax.numpy as jnp

from rufus_tpu.ops import codec, count


def _ascii_batch(seqs, pad_to=None):
    L = pad_to or max(len(s) for s in seqs)
    out = np.full((len(seqs), L), ord("N"), dtype=np.uint8)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = np.frombuffer(s.encode(), dtype=np.uint8)
    return jnp.asarray(out)


def _brute_counts(seqs, k):
    from collections import Counter

    c = Counter()
    for s in seqs:
        for i in range(len(s) - k + 1):
            w = s[i : i + k]
            if set(w) <= set("ACGT"):
                c[codec.canonical_str(w)] += 1
    return dict(c)


def _rle_dict(keys, counts, k):
    keys = np.asarray(keys)
    counts = np.asarray(counts)
    mask = keys != count.SENTINEL
    return {codec.kmer_to_str(int(kk), k): int(cc)
            for kk, cc in zip(keys[mask], counts[mask])}


def test_count_reads_batch_matches_brute():
    rng = np.random.default_rng(7)
    k = 11
    seqs = ["".join(rng.choice(list("ACGTN"), rng.integers(20, 40), p=[0.24] * 4 + [0.04])) for _ in range(50)]
    keys, counts, n = count.count_reads_batch(_ascii_batch(seqs), k)
    got = _rle_dict(keys, counts, k)
    assert got == _brute_counts(seqs, k)
    assert int(n) == len(got)


def test_table_from_chunks_and_lower_count():
    k = 7
    seqs1 = ["ACGTACGTACGT" * 3]
    seqs2 = ["ACGTACGTACGT" * 2, "TTTTTTTTT"]
    chunks = [count.count_reads_batch(_ascii_batch(seqs1), k),
              count.count_reads_batch(_ascii_batch(seqs2), k)]
    t = count.KmerTable.from_rle_chunks(k, chunks)
    brute = _brute_counts(seqs1 + seqs2, k)
    got = dict(zip(codec.kmers_to_strs(t.keys, k), t.counts.tolist()))
    assert got == brute
    # lower_count floor drops rare k-mers (jellyfish -L semantics)
    t2 = count.KmerTable.from_rle_chunks(k, chunks, lower_count=5)
    got2 = dict(zip(codec.kmers_to_strs(t2.keys, k), t2.counts.tolist()))
    assert got2 == {s: c for s, c in brute.items() if c >= 5}


def test_query_and_histo():
    k = 5
    t = count.KmerTable.from_strings(k, ["AAAAACCCCCAAAAA"])
    q = t.query_strs(["AAAAA", "CCCCC", "GGGGG", "TTTTT"])
    # AAAAA x2 fwd; TTTTT canonical==AAAAA so same count; GGGGG canonical==CCCCC
    assert q[0] == 2 and q[3] == 2
    assert q[1] == q[2] == 1
    h = t.histo()
    assert h[2] >= 1


def test_merge_sorted_device():
    k = 9
    a = count.KmerTable.from_strings(k, ["ACGTACGTACGTACG"])
    b = count.KmerTable.from_strings(k, ["ACGTACGTACGTACG", "CCCCCCCCCC"])
    pad = count.SENTINEL
    ak = jnp.asarray(np.concatenate([a.keys, [pad] * 4]))
    ac = jnp.asarray(np.concatenate([a.counts, [0] * 4]))
    bk = jnp.asarray(b.keys)
    bc = jnp.asarray(b.counts)
    keys, sums, n = count.merge_sorted(ak, ac, bk, bc)
    got = _rle_dict(keys, sums, k)
    brute = _brute_counts(["ACGTACGTACGTACG"] * 2 + ["CCCCCCCCCC"], k)
    assert got == brute


def test_subtract_unique_semantics():
    k = 5
    # table A only: AAACA (count 6 -> kept), AAACC (count 4 -> dropped by >=5)
    # in both A and B: AAACG -> dropped (not unique)
    ta = count.KmerTable(k, np.sort(np.array([codec.str_to_kmer(s) for s in ["AAACA", "AAACC", "AAACG"]], dtype=np.uint64)),
                         np.array([6, 4, 9]))
    # fix counts to match sorted key order
    order = {codec.kmer_to_str(int(x), k): i for i, x in enumerate(ta.keys)}
    cnts = np.zeros(3, np.int64)
    cnts[order["AAACA"]] = 6
    cnts[order["AAACC"]] = 4
    cnts[order["AAACG"]] = 9
    ta.counts = cnts
    tb = count.KmerTable(k, np.array([codec.str_to_kmer("AAACG")], dtype=np.uint64), np.array([3]))
    out = count.subtract_unique([ta, tb], merge_min=5)
    assert codec.kmers_to_strs(out, k) == ["AAACA"]


def test_count_reads_batch_fast_matches_classic():
    """The fused (pallas-encode) count path must produce the identical
    (key, count) multiset as the classic XLA path, N bases included."""
    import jax.numpy as jnp

    from rufus_tpu.ops import count

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGTN", np.uint8)
    reads = rng.choice(bases, size=(512, 96), p=[.24, .24, .24, .24, .04])
    r = jnp.asarray(reads)
    k1, c1, n1 = count.count_reads_batch(r, 25)
    k2, c2, n2 = count.count_reads_batch_fast(r, 25)
    assert int(n1) == int(n2)
    m1 = np.asarray(k1) != count.SENTINEL
    m2 = np.asarray(k2) != count.SENTINEL
    a = sorted(zip(np.asarray(k1)[m1].tolist(), np.asarray(c1)[m1].tolist()))
    b = sorted(zip(np.asarray(k2)[m2].tolist(), np.asarray(c2)[m2].tolist()))
    assert a == b


def test_pallas_count_interpret_matches_xla():
    from rufus_tpu.ops import pallas_count

    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGTN", np.uint8)
    reads = rng.choice(bases, size=(256, 64), p=[.24, .24, .24, .24, .04])
    hi_i, lo_i = pallas_count.encode_canon_hilo(reads, 21, interpret=True)
    hi_x, lo_x = pallas_count.encode_canon_hilo_xla(reads, 21)
    assert (np.asarray(hi_i) == np.asarray(hi_x)).all()
    assert (np.asarray(lo_i) == np.asarray(lo_x)).all()
