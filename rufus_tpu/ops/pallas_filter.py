"""Pallas TPU kernel: fused mutant-read filter for small tables.

One kernel fuses the whole RUFUS.Filter inner loop — base encoding,
k-mer packing, canonicalization, table membership and the qual-streak
scan — over a block of reads resident in VMEM, with the mutant table
(split into hi/lo u32 halves; Mosaic has no 64-bit integers) broadcast
into VMEM once. Grid = read blocks; everything is VPU element-wise ops
plus static slices, so the kernel is HBM-bandwidth-bound on the read
stream, which is the speed-of-light target for this stage
(SURVEY.md section 7.1 item 5).

Falls back to the XLA path transparently if Pallas/Mosaic is unavailable
(tests force JAX_PLATFORMS=cpu where pallas TPU kernels don't run; the
interpret=True path covers them).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # pltpu only resolves fully on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

BLK = 256  # reads per grid step (the kernel's unrolled k-loop live set
# scales with BLK: ~10 MB of scoped VMEM at 256, 4x that at 1024 — past
# the 16 MB limit)


def _encode(ascii_u8):
    # all arithmetic in u32 — Mosaic lacks sub-word shift lowering
    u = ascii_u8.astype(jnp.uint32) & jnp.uint32(0xDF)
    code = (u >> jnp.uint32(1)) & jnp.uint32(3)
    code = jnp.where(code >= 2, code ^ jnp.uint32(1), code)
    valid = (u == 65) | (u == 67) | (u == 71) | (u == 84)
    return code, valid


def _filter_kernel(reads_ref, quals_ref, lens_ref, thi_ref, tlo_ref, out_ref,
                   scratch, sem, *, k: int, min_q: int, L: int, T: int):
    reads = reads_ref[:]
    quals = quals_ref[:]
    lens = lens_ref[:]  # (BLK, 1)
    codes, valid = _encode(reads)
    pos = jax.lax.broadcasted_iota(jnp.int32, (BLK, L), dimension=1)
    good = valid & ((quals.astype(jnp.int32) - 33) >= min_q) & (pos < lens)

    W = L - k + 1
    hi = jnp.zeros((BLK, W), dtype=jnp.uint32)
    lo = jnp.zeros((BLK, W), dtype=jnp.uint32)
    allgood = jnp.ones((BLK, W), dtype=jnp.bool_)
    for j in range(k):
        c = codes[:, j : j + W]
        g = good[:, j : j + W]
        allgood = allgood & g
        hi = (hi << jnp.uint32(2)) | (lo >> jnp.uint32(30))
        lo = (lo << jnp.uint32(2)) | c
    # revcomp of the 2k-bit value stored as (hi, lo): complement codes then
    # reverse 2-bit groups of the 64-bit pair and shift down by 64-2k
    chi = ~hi
    clo = ~lo

    def rev32(x):
        m = jnp.uint32
        x = ((x & m(0x33333333)) << m(2)) | ((x >> m(2)) & m(0x33333333))
        x = ((x & m(0x0F0F0F0F)) << m(4)) | ((x >> m(4)) & m(0x0F0F0F0F))
        x = ((x & m(0x00FF00FF)) << m(8)) | ((x >> m(8)) & m(0x00FF00FF))
        x = (x << m(16)) | (x >> m(16))
        return x

    rhi, rlo = rev32(clo), rev32(chi)  # 64-bit group-reverse swaps halves
    # shift the 64-bit (rhi, rlo) right by (64 - 2k)
    sh = 64 - 2 * k
    if sh >= 32:  # k <= 16: the whole value fits in the low word
        s = sh - 32
        rlo2 = (rhi >> jnp.uint32(s)) if s else rhi
        rhi2 = jnp.zeros_like(rhi)
    elif sh > 0:
        rlo2 = (rlo >> jnp.uint32(sh)) | (rhi << jnp.uint32(32 - sh))
        rhi2 = rhi >> jnp.uint32(sh)
    else:
        rlo2, rhi2 = rlo, rhi
    # canonical = min(fwd, rc) on the (hi, lo) pair
    take_rc = (rhi2 < hi) | ((rhi2 == hi) & (rlo2 < lo))
    khi = jnp.where(take_rc, rhi2, hi)
    klo = jnp.where(take_rc, rlo2, lo)

    # streak rule: window ending at i=j+k-1 scanned iff all k bases good
    # and i <= len-2
    end_pos = jax.lax.broadcasted_iota(jnp.int32, (BLK, W), 1) + (k - 1)
    scanned = allgood & (end_pos <= lens - 2)

    member = jnp.zeros((BLK, W), dtype=jnp.bool_)
    thi = thi_ref[:]  # (1, T)
    tlo = tlo_ref[:]
    for t in range(T):
        member = member | ((khi == thi[0, t]) & (klo == tlo[0, t]))
    # output lives in ANY (HBM) and is written by an explicit DMA: a
    # plain blocked output gets its FULL buffer staged in scoped VMEM by
    # XLA, where (8,128) tiling inflates a minor-dim-1 column 128x —
    # 33+ MB at WGS batch sizes (compile-time scoped-vmem OOM). DMA
    # slices must be 128-lane aligned, so hits broadcast across lanes
    # (the XLA wrapper reads lane 0); HBM cost is 128 KB/block.
    scratch[:] = jnp.broadcast_to(
        jnp.sum(scanned & member, axis=1, keepdims=True,
                dtype=jnp.int32), (BLK, 128))
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        scratch.at[:, :], out_ref.at[pl.ds(i * jnp.int32(BLK), BLK), :],
        sem)
    cp.start()
    cp.wait()


@functools.partial(jax.jit,
                   static_argnames=("k", "min_q", "interpret"))
def pallas_window_hits(reads, quals, lens, table_hi, table_lo, k: int,
                       min_q: int, interpret: bool = False):
    """Fused filter over (B, L) reads; B must be a multiple of BLK.

    table_hi/lo: (T,) u32 halves of the canonical mutant k-mers (T static
    per compile; keep tables padded to a fixed size with a sentinel that
    cannot match, e.g. hi=0xFFFFFFFF). Runs under a local x64-disable
    scope: the package enables x64 globally, which leaks i64 literals into
    pallas index maps that Mosaic rejects. jit-wrapped: an unjitted
    pallas_call re-traces and re-lowers the kernel on EVERY invocation
    (~2s/call through the axon relay).
    """
    B, L = reads.shape
    T = table_hi.shape[0]
    grid = (B // BLK,)
    kernel = functools.partial(_filter_kernel, k=k, min_q=min_q, L=L, T=T)
    z = np.int32(0)  # i32 literals: x64 would promote bare 0 to i64,
    # which Mosaic rejects in index maps
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, L), lambda i: (i, z)),
            pl.BlockSpec((BLK, L), lambda i: (i, z)),
            pl.BlockSpec((BLK, 1), lambda i: (i, z)),
            pl.BlockSpec((1, T), lambda i: (z, z)),
            pl.BlockSpec((1, T), lambda i: (z, z)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((BLK, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(reads, quals, lens.reshape(B, 1), table_hi.reshape(1, T),
      table_lo.reshape(1, T))[:, 0]


def split_table(keys: np.ndarray, pad_to: int = 64):
    """u64 canonical table -> padded (hi, lo) u32 arrays for the kernel."""
    n = max(pad_to, int(2 ** np.ceil(np.log2(max(1, len(keys))))))
    hi = np.full(n, 0xFFFFFFFF, dtype=np.uint32)  # unmatchable sentinel
    lo = np.zeros(n, dtype=np.uint32)
    keys = np.asarray(keys, dtype=np.uint64)
    hi[: len(keys)] = (keys >> np.uint64(32)).astype(np.uint32)
    lo[: len(keys)] = keys.astype(np.uint32)
    return hi, lo
