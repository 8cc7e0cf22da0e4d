import numpy as np
import jax.numpy as jnp
import pytest

from rufus_tpu.ops import codec


def test_str_roundtrip():
    s = "ACGTACGTACGTACGTACGTACGTA"  # k=25
    v = codec.str_to_kmer(s)
    assert codec.kmer_to_str(v, 25) == s


def test_numeric_order_is_lexicographic():
    ks = ["AAACA", "AAACC", "AAACG", "AAACT", "CAAAA", "TTTTT"]
    vals = [codec.str_to_kmer(s) for s in ks]
    assert vals == sorted(vals)


def test_pack_kmers_matches_host():
    seq = "ACGTTGCANACGTACGTTT"
    arr = jnp.asarray(np.frombuffer(seq.encode(), dtype=np.uint8))[None, :]
    k = 4
    kmers, valid = codec.pack_kmers(codec.encode_bases(arr), k)
    kmers, valid = np.asarray(kmers)[0], np.asarray(valid)[0]
    for i in range(len(seq) - k + 1):
        w = seq[i : i + k]
        if "N" in w:
            assert not valid[i]
        else:
            assert valid[i]
            assert int(kmers[i]) == codec.str_to_kmer(w)


@pytest.mark.parametrize("k", [4, 25, 31, 32])
def test_revcomp_device_matches_host(k):
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), k)) for _ in range(64)]
    vals = jnp.asarray(np.array([codec.str_to_kmer(s) for s in seqs], dtype=np.uint64))
    rc = np.asarray(codec.revcomp_kmers(vals, k))
    for s, r in zip(seqs, rc):
        assert codec.kmer_to_str(int(r), k) == codec.revcomp_str(s)


def test_canonical_matches_str():
    rng = np.random.default_rng(1)
    k = 25
    seqs = ["".join(rng.choice(list("ACGT"), k)) for _ in range(100)]
    vals = jnp.asarray(np.array([codec.str_to_kmer(s) for s in seqs], dtype=np.uint64))
    canon = np.asarray(codec.canonical_kmers(vals, k))
    for s, c in zip(seqs, canon):
        assert codec.kmer_to_str(int(c), k) == codec.canonical_str(s)


def test_strs_to_kmers_vectorized():
    seqs = ["ACGTA", "TTTTT", "GGGCC"]
    out = codec.strs_to_kmers(seqs, 5)
    assert [int(v) for v in out] == [codec.str_to_kmer(s) for s in seqs]
    assert codec.kmers_to_strs(out, 5) == seqs
