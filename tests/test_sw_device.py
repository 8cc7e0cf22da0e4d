"""Batched device Smith-Waterman == host sw_kernel, bit for bit.

Scores, best-cell coordinates AND the full H matrix must match: the
aligner's traceback/clip-extension consumes H directly, and the golden
contig is order-sensitive to candidate scores (PARITY.md)."""

import numpy as np

from rufus_tpu.align import sw_device
from rufus_tpu.align.aligner import sw_kernel, encode

RNG = np.random.default_rng(20260821)
BASES = np.frombuffer(b"ACGT", np.uint8)


def _rand_codes(n, n_frac=0.02):
    s = RNG.choice(BASES, size=n)
    s = np.where(RNG.random(n) < n_frac, ord("N"), s).astype(np.uint8)
    return encode(s)


def test_sw_batch_matches_host_exactly():
    B, n, m = 9, 61, 120
    qs, rs = [], []
    for b in range(B):
        q = _rand_codes(n)
        if b % 3 == 0:
            # related pair: window contains a mutated copy of the query
            r = np.full(m, 255, np.uint8)
            r[:] = _rand_codes(m)
            ins = RNG.integers(0, m - n)
            r[ins : ins + n] = q
            r[ins + 10] = (r[ins + 10] + 1) % 4  # SNV
        else:
            r = _rand_codes(m)
        qs.append(q)
        rs.append(r)
    q_b = np.stack(qs)
    r_b = np.stack(rs)
    H_d, s_d, bi_d, bj_d = sw_device.sw_batch(q_b, r_b)
    for b in range(B):
        (score, bi, bj), H = sw_kernel(qs[b], rs[b])
        assert s_d[b] == score, (b, s_d[b], score)
        assert (bi_d[b], bj_d[b]) == (bi, bj), (b, bi_d[b], bj_d[b], bi, bj)
        np.testing.assert_array_equal(H_d[b], H)


def test_sw_batch_padded_query_equals_short_query():
    """255-padding a query must not change scores (pad never matches)."""
    q = _rand_codes(40, 0)
    r = _rand_codes(100, 0)
    qp = np.concatenate([q, np.full(21, 255, np.uint8)])
    H1, s1, bi1, bj1 = sw_device.sw_batch(q[None], r[None])
    H2, s2, bi2, bj2 = sw_device.sw_batch(qp[None], r[None])
    assert s1[0] == s2[0] and bi1[0] == bi2[0] and bj1[0] == bj2[0]
    np.testing.assert_array_equal(H1[0], H2[0][: 41])
