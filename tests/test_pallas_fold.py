"""Pallas streaming RLE-compaction kernel (ops/pallas_fold.py).

Runs in interpret mode on CPU (bit-exact with the compiled TPU kernel's
semantics); the compiled path is exercised on the real chip by bench.py
and showed identical totals (table_unique_kmers matches the XLA path's
figure exactly, BENCH round 3).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rufus_tpu.ops import pallas_fold

RNG = np.random.default_rng(20260821)


def make_case(n, n_valid):
    """Sorted-with-holes planes exactly as _rle_compact_hilo hole-punches
    them: valid entries (run heads) strictly increasing, holes all-ones."""
    pool = np.unique(RNG.integers(0, 1 << 50, max(4 * n_valid, 64),
                                  dtype=np.uint64))
    keys = np.sort(RNG.choice(pool, n_valid, replace=False)) if n_valid \
        else pool[:0]
    pos = np.sort(RNG.choice(n, n_valid, replace=False))
    h = np.full(n, 0xFFFFFFFF, np.uint32)
    l = np.full(n, 0xFFFFFFFF, np.uint32)
    c = np.zeros(n, np.int32)
    h[pos] = (keys >> np.uint64(32)).astype(np.uint32)
    l[pos] = keys.astype(np.uint32)
    c[pos] = RNG.integers(1, 100, n_valid)
    return h, l, c, keys, c[pos].copy()


@pytest.mark.parametrize("n,n_valid,cap", [
    (8192, 1000, 4096),       # two blocks, carry crosses them
    (4096, 4096, 4096),       # fully dense, exact-fit output
    (8192, 0, 4096),          # fully empty
    (12288, 129, 4096),       # sparse: carries propagate through blocks
    (8192, 127, 4096),        # never fills a whole row until the end
    (8000, 777, 4224),        # n not a multiple of the block size
])
def test_compact_exact(n, n_valid, cap):
    h, l, c, keys, cnts = make_case(n, n_valid)
    oh, ol, oc, slots, uniq = pallas_fold.compact_sorted_hilo(
        jnp.asarray(h), jnp.asarray(l), jnp.asarray(c), cap, interpret=True)
    slots, uniq = int(slots), int(uniq)
    assert slots == uniq == n_valid
    oh, ol, oc = np.asarray(oh), np.asarray(ol), np.asarray(oc)
    got = (oh[:slots].astype(np.uint64) << np.uint64(32)) | ol[:slots]
    np.testing.assert_array_equal(got, keys)
    np.testing.assert_array_equal(oc[:slots], cnts)
    # tail is clean sentinel / zero
    assert (oh[slots:] == 0xFFFFFFFF).all() and (oc[slots:] == 0).all()


def test_compact_overflow_reported_losslessly():
    """Content past cap_out is clamped but the returned total still
    reports the TRUE count so callers can grow and retry."""
    h, l, c, keys, cnts = make_case(16384, 6000)
    oh, ol, oc, slots, uniq = pallas_fold.compact_sorted_hilo(
        jnp.asarray(h), jnp.asarray(l), jnp.asarray(c), 4096, interpret=True)
    assert int(slots) == int(uniq) == 6000  # true total, not the clamp
