#!/usr/bin/env python
"""Microbenchmark of the count engine's reorder primitives on the real
device. The count stage is sort-bound (bench.py roofline); before
optimizing, measure what each primitive actually costs:

1. lax.sort over (hi, lo) u32 planes at batch and pending-buffer sizes
   -> effective GB/s under the comparator model (passes ~ log2(n)^2/2).
2. bitonic MERGE of two sorted halves expressed as log2(n) elementwise
   XLA passes (compare+select over reshaped halves) -> is merging sorted
   runs cheaper than re-sorting their concat? (It should be ~log2(n)/2x.)
3. gather-based compaction (out[j] = in[sel[j]]) -> can RLE compaction
   avoid its sort?
4. lax.sort with a third i32 payload lane (the fold's merge shape).

Run on the TPU: python tools/sortbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import rufus_tpu  # noqa: F401  (x64)


def _sync(out):
    """Force execution to completion: reduce to a scalar and fetch it
    (block_until_ready alone does not flush the axon relay's pipeline)."""
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.asarray(leaves[0]).ravel()[0])


def timeit(fn, *args, iters=20):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


@jax.jit
def sort2(h, l):
    return jax.lax.sort((h, l), num_keys=2)


@jax.jit
def sort3(h, l, c):
    return jax.lax.sort((h, l, c), num_keys=2)


@jax.jit
def sort1(h):
    return jnp.sort(h)


def merge_passes(n):
    """Number of compare passes for a bitonic merge of n elements."""
    return int(np.log2(n))


@jax.jit
def bitonic_merge2(h, l):
    """Merge [sorted A | sorted B] (each n/2) -> sorted n, u32 pair keys.

    Classic bitonic merge: reverse B to make the whole array bitonic,
    then log2(n) clean stages of compare-exchange at strides n/2..1.
    Pure elementwise reshapes/selects — no lax.sort.
    """
    n = h.shape[0]
    half = n // 2
    h = jnp.concatenate([h[:half], h[half:][::-1]])
    l = jnp.concatenate([l[:half], l[half:][::-1]])
    s = half
    while s >= 1:
        hr = h.reshape(-1, 2, s)
        lr = l.reshape(-1, 2, s)
        a_h, b_h = hr[:, 0, :], hr[:, 1, :]
        a_l, b_l = lr[:, 0, :], lr[:, 1, :]
        swap = (a_h > b_h) | ((a_h == b_h) & (a_l > b_l))
        lo_h = jnp.where(swap, b_h, a_h)
        hi_h = jnp.where(swap, a_h, b_h)
        lo_l = jnp.where(swap, b_l, a_l)
        hi_l = jnp.where(swap, a_l, b_l)
        h = jnp.stack([lo_h, hi_h], axis=1).reshape(n)
        l = jnp.stack([lo_l, hi_l], axis=1).reshape(n)
        s //= 2
    return h, l


@jax.jit
def gather_compact(h, sel):
    return h[sel]


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    rng = np.random.default_rng(0)
    results = {}
    for n in (8 << 20,):
        h = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
        l = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
        c = jnp.asarray(rng.integers(0, 100, n, dtype=np.int32))
        lg = int(np.log2(n))
        passes = lg * (lg + 1) // 2

        dt = timeit(sort2, h, l)
        gbps = passes * n * 8 * 2 / dt / 1e9
        print(f"sort2   n={n>>20}Mi: {dt*1e3:8.2f} ms  "
              f"({passes} passes -> {gbps:6.0f} GB/s eff)", flush=True)
        results[("sort2", n)] = dt

        dt = timeit(sort3, h, l, c)
        gbps = passes * n * 12 * 2 / dt / 1e9
        print(f"sort3   n={n>>20}Mi: {dt*1e3:8.2f} ms  "
              f"({passes} passes -> {gbps:6.0f} GB/s eff)", flush=True)
        results[("sort3", n)] = dt

        # merge two sorted halves
        h2 = jnp.concatenate(jax.lax.sort(
            (h[: n // 2], h[n // 2 :]), num_keys=1))
        hs_a, ls_a = sort2(h[: n // 2], l[: n // 2])
        hs_b, ls_b = sort2(h[n // 2 :], l[n // 2 :])
        hcat = jnp.concatenate([hs_a, hs_b])
        lcat = jnp.concatenate([ls_a, ls_b])
        dt = timeit(bitonic_merge2, hcat, lcat)
        mp = merge_passes(n)
        gbps = mp * n * 8 * 2 / dt / 1e9
        print(f"merge2  n={n>>20}Mi: {dt*1e3:8.2f} ms  "
              f"({mp} passes -> {gbps:6.0f} GB/s eff)", flush=True)
        # verify
        mh, ml = bitonic_merge2(hcat, lcat)
        wh, wl = sort2(hcat, lcat)
        ok = bool(jnp.all(mh == wh) & jnp.all(ml == wl))
        print(f"        merge correct: {ok}", flush=True)
        results[("merge2", n)] = dt

        sel = jnp.asarray(np.sort(rng.choice(n, n // 2, replace=False)))
        dt = timeit(gather_compact, h, sel)
        gbps = (n // 2) * 8 / dt / 1e9
        print(f"gather  n={n>>20}Mi->half: {dt*1e3:8.2f} ms  "
              f"({gbps:6.0f} GB/s eff)", flush=True)


if __name__ == "__main__":
    main()
