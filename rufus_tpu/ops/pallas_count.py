"""Pallas TPU kernel: fused base-encode + k-mer pack + canonicalize.

The count path is sort-bound (the XLA bitonic sort is ~80% of its own
bandwidth roofline and TPU has no scatter primitive a radix sort could
use), so the win left on the table is the front half: the XLA
encode->pack->canonicalize chain materializes several (B, W) u64
intermediates in HBM (~11 ms per 64k-read batch on v5e). This kernel fuses
all of it in VMEM and emits the canonical k-mer directly as (hi, lo) u32
planes — the exact operand layout `lax.sort(num_keys=2)` wants, so the
u64 recombine disappears too. Invalid windows (any non-ACGT base, e.g.
padding) come out as the all-ones sentinel, which sorts last like
ops.count.SENTINEL.

Reference role: the innermost mer_dna packing of jellyfish count -C
(modifiedJellyfish include/jellyfish/mer_dna.hpp) — reimplemented as a
data-parallel VPU kernel rather than a per-base serial loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

from . import codec

BLK = 256  # reads per grid step


def _kernel(reads_ref, hi_ref, lo_ref, *, k: int, L: int):
    u = reads_ref[:].astype(jnp.uint32) & jnp.uint32(0xDF)  # uppercase
    code = (u >> jnp.uint32(1)) & jnp.uint32(3)
    code = jnp.where(code >= 2, code ^ jnp.uint32(1), code)  # A0 C1 G2 T3
    valid = (u == 65) | (u == 67) | (u == 71) | (u == 84)

    W = L - k + 1
    hi = jnp.zeros((BLK, W), dtype=jnp.uint32)
    lo = jnp.zeros((BLK, W), dtype=jnp.uint32)
    allgood = jnp.ones((BLK, W), dtype=jnp.bool_)
    for j in range(k):
        c = code[:, j : j + W]
        allgood = allgood & valid[:, j : j + W]
        hi = (hi << jnp.uint32(2)) | (lo >> jnp.uint32(30))
        lo = (lo << jnp.uint32(2)) | c

    # reverse complement of the 2k-bit (hi, lo) value
    chi = ~hi
    clo = ~lo

    def rev32(x):
        m = jnp.uint32
        x = ((x & m(0x33333333)) << m(2)) | ((x >> m(2)) & m(0x33333333))
        x = ((x & m(0x0F0F0F0F)) << m(4)) | ((x >> m(4)) & m(0x0F0F0F0F))
        x = ((x & m(0x00FF00FF)) << m(8)) | ((x >> m(8)) & m(0x00FF00FF))
        return (x << m(16)) | (x >> m(16))

    rhi, rlo = rev32(clo), rev32(chi)
    sh = 64 - 2 * k
    if sh >= 32:
        s = sh - 32
        rlo2 = (rhi >> jnp.uint32(s)) if s else rhi
        rhi2 = jnp.zeros_like(rhi)
    elif sh > 0:
        rlo2 = (rlo >> jnp.uint32(sh)) | (rhi << jnp.uint32(32 - sh))
        rhi2 = rhi >> jnp.uint32(sh)
    else:
        rlo2, rhi2 = rlo, rhi
    take_rc = (rhi2 < hi) | ((rhi2 == hi) & (rlo2 < lo))
    khi = jnp.where(take_rc, rhi2, hi)
    klo = jnp.where(take_rc, rlo2, lo)
    ones = jnp.uint32(0xFFFFFFFF)
    hi_ref[:] = jnp.where(allgood, khi, ones)
    lo_ref[:] = jnp.where(allgood, klo, ones)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def encode_canon_hilo(reads, k: int, interpret: bool = False):
    """(B, L) uint8 ASCII -> ((B, W) hi, (B, W) lo) u32 canonical k-mers,
    sentinel 0xFFFFFFFF/0xFFFFFFFF on invalid windows. B % BLK == 0."""
    B, L = reads.shape
    W = L - k + 1
    grid = (B // BLK,)
    z = np.int32(0)
    kernel = functools.partial(_kernel, k=k, L=L)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((BLK, L), lambda i: (i, z))],
        out_specs=(pl.BlockSpec((BLK, W), lambda i: (i, z)),
                   pl.BlockSpec((BLK, W), lambda i: (i, z))),
        out_shape=(jax.ShapeDtypeStruct((B, W), jnp.uint32),
                   jax.ShapeDtypeStruct((B, W), jnp.uint32)),
        interpret=interpret,
    )(reads)


@functools.partial(jax.jit, static_argnames=("k",))
def encode_canon_hilo_xla(reads, k: int):
    """XLA fallback with the same contract (CPU tests, non-TPU backends)."""
    codes = codec.encode_bases(reads)
    kmers, valid = codec.pack_kmers(codes, k)
    canon = codec.canonical_kmers(kmers, k)
    ones = jnp.uint32(0xFFFFFFFF)
    hi = jnp.where(valid, (canon >> jnp.uint64(32)).astype(jnp.uint32), ones)
    lo = jnp.where(valid, canon.astype(jnp.uint32), ones)
    return hi, lo
