"""2-bit k-mer codec: packing, canonicalization, text round-trip.

TPU-first equivalent of the reference's ``Util::HashToLong`` /
``Util::RevComp`` (reference: src/Util.cpp:51-210) and Jellyfish's
``mer_dna`` codec (src/modifiedJellyfish/include/jellyfish/mer_dna.hpp).
The reference packs LSB-first per base; we pack MSB-first so that numeric
order on the packed uint64 equals lexicographic order on the string with
A<C<G<T — only self-consistency matters, every file format is text k-mers.

All device functions are shape-polymorphic over leading batch dims and
jit-safe (static k).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Base codes. 255 marks invalid (N or any non-ACGT byte).
BASE_A, BASE_C, BASE_G, BASE_T = 0, 1, 2, 3
INVALID = 255

_LUT = np.full(256, INVALID, dtype=np.uint8)
for _b, _c in zip(b"ACGT", (BASE_A, BASE_C, BASE_G, BASE_T)):
    _LUT[_b] = _c
for _b, _c in zip(b"acgt", (BASE_A, BASE_C, BASE_G, BASE_T)):
    _LUT[_b] = _c
_LUT_J = jnp.asarray(_LUT)

_CODE2CHAR = np.array([ord("A"), ord("C"), ord("G"), ord("T")], dtype=np.uint8)


def encode_bases(ascii_bytes: jax.Array) -> jax.Array:
    """ASCII uint8 array -> 2-bit codes (uint8), INVALID for non-ACGT.

    Pure arithmetic (no table gather — dynamic gathers are slow on TPU):
    (c>>1)&3 maps A->0 C->1 G->3 T->2; flipping the LSB for codes >= 2
    restores lexicographic order A0 C1 G2 T3.
    """
    u = ascii_bytes & jnp.uint8(0xDF)  # uppercase
    code = (u >> jnp.uint8(1)) & jnp.uint8(3)
    code = jnp.where(code >= 2, code ^ jnp.uint8(1), code)
    valid = (u == 65) | (u == 67) | (u == 71) | (u == 84)
    return jnp.where(valid, code, jnp.uint8(INVALID))


@functools.partial(jax.jit, static_argnames=("k",))
def pack_kmers(codes: jax.Array, k: int):
    """Extract all k-windows of a code array, packed MSB-first.

    Args:
      codes: uint8 array of shape (..., L) with values 0..3 or INVALID.
      k: k-mer length (<= 32, static).

    Returns:
      (kmers, valid): kmers uint64 (..., L-k+1) packed windows; valid bool
      (..., L-k+1), False where any window base was INVALID.
    """
    L = codes.shape[-1]
    W = L - k + 1
    if W <= 0:
        raise ValueError(f"sequence length {L} < k={k}")
    acc = jnp.zeros(codes.shape[:-1] + (W,), dtype=jnp.uint64)
    bad = jnp.zeros(codes.shape[:-1] + (W,), dtype=bool)
    for j in range(k):
        c = codes[..., j : j + W]
        bad = bad | (c == INVALID)
        acc = (acc << jnp.uint64(2)) | jnp.where(c == INVALID, 0, c).astype(jnp.uint64)
    return acc, ~bad


@functools.partial(jax.jit, static_argnames=("k",))
def revcomp_kmers(kmers: jax.Array, k: int) -> jax.Array:
    """Reverse-complement packed k-mers (uint64 -> uint64)."""
    x = ~kmers  # complement: code -> 3-code is bitwise NOT per 2-bit group
    # Reverse the 32 2-bit groups via log-swaps, then shift down to k groups.
    m = jnp.uint64
    x = ((x & m(0x3333333333333333)) << m(2)) | ((x >> m(2)) & m(0x3333333333333333))
    x = ((x & m(0x0F0F0F0F0F0F0F0F)) << m(4)) | ((x >> m(4)) & m(0x0F0F0F0F0F0F0F0F))
    x = ((x & m(0x00FF00FF00FF00FF)) << m(8)) | ((x >> m(8)) & m(0x00FF00FF00FF00FF))
    x = ((x & m(0x0000FFFF0000FFFF)) << m(16)) | ((x >> m(16)) & m(0x0000FFFF0000FFFF))
    x = (x << m(32)) | (x >> m(32))
    return x >> m(64 - 2 * k)


@functools.partial(jax.jit, static_argnames=("k",))
def canonical_kmers(kmers: jax.Array, k: int) -> jax.Array:
    """Canonical form: min(fwd, revcomp); Jellyfish `count -C` semantics."""
    return jnp.minimum(kmers, revcomp_kmers(kmers, k))


# ---------------------------------------------------------------------------
# Host-side text round trip (numpy; used for HashList / parity I/O).
# ---------------------------------------------------------------------------


def str_to_kmer(s: str) -> int:
    v = 0
    for ch in s:
        c = _LUT[ord(ch)]
        if c == INVALID:
            raise ValueError(f"invalid base {ch!r} in k-mer {s!r}")
        v = (v << 2) | int(c)
    return v


def kmer_to_str(v: int, k: int) -> str:
    out = []
    for i in range(k - 1, -1, -1):
        out.append("ACGT"[(v >> (2 * i)) & 3])
    return "".join(out)


def strs_to_kmers(seqs, k: int) -> np.ndarray:
    """Vectorized parse of equal-length k-mer strings -> uint64 array."""
    buf = np.frombuffer("".join(seqs).encode(), dtype=np.uint8).reshape(-1, k)
    codes = _LUT[buf].astype(np.uint64)
    if (codes == INVALID).any():
        raise ValueError("invalid base in k-mer list")
    shifts = np.arange(k - 1, -1, -1, dtype=np.uint64) * np.uint64(2)
    return (codes << shifts).sum(axis=1, dtype=np.uint64)


def kmers_to_strs(kmers: np.ndarray, k: int) -> list[str]:
    kmers = np.asarray(kmers, dtype=np.uint64)
    shifts = np.arange(k - 1, -1, -1, dtype=np.uint64) * np.uint64(2)
    codes = (kmers[:, None] >> shifts) & np.uint64(3)
    chars = _CODE2CHAR[codes.astype(np.int64)]
    flat = chars.tobytes().decode()
    return [flat[i * k : (i + 1) * k] for i in range(len(kmers))]


def revcomp_str(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N",
            "a": "t", "c": "g", "g": "c", "t": "a", "n": "n"}
    return "".join(comp.get(c, "N") for c in reversed(s))


def canonical_str(s: str) -> str:
    r = revcomp_str(s)
    return s if s <= r else r
