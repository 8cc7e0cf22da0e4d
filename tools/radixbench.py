#!/usr/bin/env python
"""Radix/range-partition count formulation — measured (VERDICT r4 next #2).

The round-4 roofline argued exact counting is comparator-sort bound and
"no TPU scatter => no radix"; the verdict countered that pallas_fold's
dynamic-offset DMA writes are exactly the primitive an MSD radix
PARTITION needs: per-block VMEM sort, then run-wise DMA of each block's
bucket runs into per-bucket regions; buckets then sort independently
with NO merge-back (disjoint ranges concatenate).

This tool measures that formulation's components on the real chip:

  A. the partition pass = per-block bitonic sort (bucket id is the key
     prefix, so one (h,l) sort groups buckets) + NB run-wise DMAs per
     block at SMEM cursors + per-bucket alignment rolls. Measured as a
     real Pallas kernel moving the real bytes and issuing the real DMA
     count (row-aligned runs: same traffic, boundary rows duplicated —
     an upper bound on what the exact carry machinery saves).
  B. the per-bucket sorts = NB independent lax.sort calls of n/NB
     (2-lane u32), vs
  C. the baseline global lax.sort of n (2-lane u32).

partition_total = A + B (+ the unchanged RLE compaction);
global_total    = C (+ the same compaction).

Writes RADIX_r{N}.json with the verdict the numbers support.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/radixbench.py [r05]
"""

import functools
import json
import sys
import time

import numpy as np

N = int(26_000_000)       # ~flush-size pending buffer (fits v5e HBM
                          # alongside the partition output regions)
NB = 16                   # buckets (MSD radix digits = top-4 bits)
BLKC = 8192               # elements per partition block
ROWS = BLKC // 128


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import rufus_tpu  # noqa: F401
    from rufus_tpu.ops import pallas_fold

    _ONES = np.uint32(0xFFFFFFFF)
    rng = np.random.default_rng(0)
    n = (N // BLKC) * BLKC
    h_np = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    l_np = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    h = jax.device_put(jnp.asarray(h_np))
    l = jax.device_put(jnp.asarray(l_np))

    def timeit(fn, *a, reps=3):
        jax.block_until_ready(fn(*a))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    # ---- C. global 2-lane sort (the current formulation's hot op) ----
    gsort = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
    t_global = timeit(gsort, h, l)

    # ---- B. NB independent bucket sorts of n/NB ----
    nb_n = n // NB
    hb = h.reshape(NB, nb_n)
    lb = l.reshape(NB, nb_n)
    bsort = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2,
                                              dimension=1))
    t_buckets = timeit(bsort, hb, lb)

    # ---- A. the partition kernel ----
    if sys.getrecursionlimit() < 100000:
        sys.setrecursionlimit(100000)
    nblocks = n // BLKC
    out_rows = 2 * (n // NB) // 128 + ROWS + 2  # 2x headroom per region

    # per-(block, bucket) run starts/lengths, in XLA (streaming pass)
    shift = np.uint32(32 - int(np.log2(NB)))
    bucket = (h.reshape(nblocks, BLKC) >> shift).astype(jnp.int32)
    oneh = jax.nn.one_hot(bucket, NB, dtype=jnp.int32)
    runlen = oneh.sum(axis=1)                      # (nblocks, NB)
    runstart = jnp.cumsum(runlen, axis=1) - runlen  # within sorted block
    runrows = -(-runlen // 128) + 1                # rows DMA'd per run

    def kernel(runstart_ref, runrows_ref, h_ref, l_ref, oh_refs, ol_refs,
               sh, sl, sem, cur_ref):
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            for b in range(NB):
                cur_ref[np.int32(b)] = jnp.int32(0)

        hh, ll = h_ref[:], l_ref[:]
        hh, ll, _ = pallas_fold._block_bitonic_sort(
            hh, ll, jnp.zeros_like(hh, jnp.int32))
        sh[:ROWS] = hh
        sl[:ROWS] = ll
        sh[ROWS:] = jnp.full((1, 128), _ONES, jnp.uint32)
        sl[ROWS:] = jnp.full((1, 128), _ONES, jnp.uint32)
        for b in range(NB):
            st = runstart_ref[step * jnp.int32(NB) + np.int32(b)]
            rr = runrows_ref[step * jnp.int32(NB) + np.int32(b)]
            cur = cur_ref[np.int32(b)]
            # run-wise DMA: the bucket's rows land at the bucket region's
            # cursor (row-aligned measurement variant: boundary rows ride
            # along; the exact kernel's carry trick removes them at no
            # extra traffic). ONE async copy per (block, bucket).
            src_row = st // jnp.int32(128)
            cp = pltpu.make_async_copy(
                sh.at[pl.ds(jnp.minimum(src_row, jnp.int32(ROWS - 1)),
                            ROWS + 1), :],
                oh_refs[b].at[pl.ds(
                    jnp.minimum(cur, jnp.int32(out_rows - ROWS - 1)),
                    ROWS + 1), :],
                sem.at[np.int32(0)])
            cp2 = pltpu.make_async_copy(
                sl.at[pl.ds(jnp.minimum(src_row, jnp.int32(ROWS - 1)),
                            ROWS + 1), :],
                ol_refs[b].at[pl.ds(
                    jnp.minimum(cur, jnp.int32(out_rows - ROWS - 1)),
                    ROWS + 1), :],
                sem.at[np.int32(1)])
            cp.start()
            cp2.start()
            cp.wait()
            cp2.wait()
            cur_ref[np.int32(b)] = cur + rr

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((ROWS, 128), lambda i, *_: (i, 0)),
                  pl.BlockSpec((ROWS, 128), lambda i, *_: (i, 0))],
        out_specs=(tuple(pl.BlockSpec(memory_space=pl.ANY)
                         for _ in range(NB)),
                   tuple(pl.BlockSpec(memory_space=pl.ANY)
                         for _ in range(NB))),
        scratch_shapes=[pltpu.VMEM((ROWS + 1, 128), jnp.uint32),
                        pltpu.VMEM((ROWS + 1, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SMEM((NB,), jnp.int32)],
    )

    @jax.jit
    def partition(h2d, l2d, rs, rr):
        return pl.pallas_call(
            functools.partial(kernel),
            grid_spec=grid_spec,
            out_shape=(tuple(jax.ShapeDtypeStruct((out_rows, 128),
                                                  jnp.uint32)
                             for _ in range(NB)),
                       tuple(jax.ShapeDtypeStruct((out_rows, 128),
                                                  jnp.uint32)
                             for _ in range(NB))),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(rs, rr, h2d, l2d)

    h2 = h.reshape(nblocks * ROWS, 128)
    l2 = l.reshape(nblocks * ROWS, 128)
    rs = runstart.astype(jnp.int32).reshape(-1)  # 1-D scalar prefetch
    rr = runrows.astype(jnp.int32).reshape(-1)
    t_partition = timeit(partition, h2, l2, rs, rr)
    t_starts = timeit(jax.jit(
        lambda hh: jax.nn.one_hot((hh.reshape(nblocks, BLKC) >> shift)
                                  .astype(jnp.int32), NB,
                                  dtype=jnp.int32).sum(axis=1)), h)

    # after partition, each bucket still needs its RLE compaction — same
    # as the global path; compare the SORT portions
    t_radix_total = t_partition + t_starts + t_buckets
    speedup = t_global / t_radix_total
    lg = int(np.ceil(np.log2(n)))
    out = {
        "n_keys": n,
        "buckets": NB,
        "block": BLKC,
        "global_sort2_ms": round(t_global * 1e3, 1),
        "bucket_sorts_ms": round(t_buckets * 1e3, 1),
        "partition_kernel_ms": round(t_partition * 1e3, 1),
        "run_metadata_ms": round(t_starts * 1e3, 1),
        "radix_total_ms": round(t_radix_total * 1e3, 1),
        "speedup_vs_global_sort": round(speedup, 3),
        "dmas_issued": nblocks * NB * 2,
        "comparator_pass_model": {
            "global": lg * (lg + 1) // 2,
            "per_bucket": (lg - 4) * (lg - 3) // 2,
        },
        "note": "partition = per-block bitonic sort (bucket id is the "
                "key prefix) + run-wise DMAs at SMEM cursors "
                "(pallas_fold's dynamic-offset write primitive) + "
                "metadata pass; buckets sort independently, no "
                "merge-back. speedup<1 means the partition cost eats "
                "the per-bucket sort saving; >1 means the fold should "
                "adopt MSD radix partitioning.",
        "device": None,
    }
    import jax as _j

    out["device"] = str(_j.devices()[0])
    print(json.dumps(out, indent=1))
    tag = sys.argv[1] if len(sys.argv) > 1 else "r05"
    with open(f"RADIX_{tag}.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
