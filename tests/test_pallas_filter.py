"""Pallas fused filter kernel vs the exact XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rufus_tpu.ops import codec, filter as rfilter
from rufus_tpu.ops import pallas_filter


@pytest.mark.parametrize("k", [11, 25, 31])
def test_pallas_filter_matches_exact(k):
    rng = np.random.default_rng(5)
    B, L = 256, 96
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = rng.choice(bases, size=(B, L))
    quals = rng.integers(33 + 5, 33 + 41, size=(B, L), dtype=np.uint8).astype(np.uint8)
    lens = rng.integers(k + 2, L + 1, size=B).astype(np.int32)
    # table from random read windows so some reads hit
    tbl = set()
    for _ in range(30):
        i = int(rng.integers(0, B))
        j = int(rng.integers(0, L - k))
        w = reads[i, j : j + k].tobytes().decode()
        tbl.add(codec.canonical_str(w))
    keys = np.sort(np.array([codec.str_to_kmer(s) for s in sorted(tbl)], dtype=np.uint64))

    exact = np.asarray(rfilter.window_hits(
        jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
        jnp.asarray(keys), k, 15))
    small = np.asarray(rfilter.window_hits_small(
        jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
        jnp.asarray(keys), k, 15))
    np.testing.assert_array_equal(exact, small)

    hi, lo = pallas_filter.split_table(keys)
    out = np.asarray(pallas_filter.pallas_window_hits(
        jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
        jnp.asarray(hi), jnp.asarray(lo), k, 15, interpret=True))
    np.testing.assert_array_equal(exact, out)
