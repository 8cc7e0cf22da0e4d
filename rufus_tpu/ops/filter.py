"""Mutant-read filter: per-window table membership with the qual-streak rule.

Device kernel replacing RUFUS.Filter's OpenMP scan (reference:
src/RUFUS.Filter.cpp:196-277).  Semantics reproduced exactly:

* a base is *bad* iff qual-33 < MinQ or the base is not ACGT (ref checks
  'N' only, but non-ACGT cannot hash anyway);
* a window of k consecutive good bases ending at position i is looked up
  iff i <= len-2 — the reference's loop runs `i < length()-1`, so the
  window ending at the LAST base is never examined (load-bearing quirk,
  RUFUS.Filter.cpp:203);
* lookup is orientation-insensitive (the reference inserts both strands of
  every HashList k-mer, RUFUS.Filter.cpp:126-129; we canonicalize the
  window against a canonical table — equivalent);
* a read pair is kept iff mate1's hit count >= threshold, else mate2's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import codec


@functools.partial(jax.jit, static_argnames=("k",))
def window_hits(ascii_reads, quals, lengths, table_keys, k: int, min_q: int):
    """Per-read count of mutant-table windows.

    Args:
      ascii_reads: (B, L) uint8 ASCII bases (pad with anything non-ACGT).
      quals: (B, L) uint8 ASCII quality bytes (Phred+33).
      lengths: (B,) int32 true read lengths.
      table_keys: (M,) uint64 sorted canonical mutant k-mers.
      k, min_q: static k-mer size / quality floor.

    Returns:
      (B,) int32 number of valid windows whose canonical k-mer is in the table.
    """
    B, L = ascii_reads.shape
    if table_keys.shape[0] == 0:  # empty HashList: nothing can match
        return jnp.zeros((B,), dtype=jnp.int32)
    codes = codec.encode_bases(ascii_reads)
    good = (codes != codec.INVALID) & ((quals.astype(jnp.int32) - 33) >= min_q)
    pos = jnp.arange(L, dtype=jnp.int32)
    good = good & (pos[None, :] < lengths[:, None])

    kmers, _ = codec.pack_kmers(codes, k)
    canon = codec.canonical_kmers(kmers, k)

    # window ending at i=j+k-1 is scanned iff all k bases good and i<=len-2
    run = jnp.cumsum(good.astype(jnp.int32), axis=1)
    run_k = run[:, k - 1 :] - jnp.pad(run, ((0, 0), (1, 0)))[:, : L - k + 1]
    end_pos = pos[k - 1 :]
    scanned = (run_k == k) & (end_pos[None, :] <= lengths[:, None] - 2)

    idx = jnp.searchsorted(table_keys, canon)
    idx_c = jnp.minimum(idx, table_keys.shape[0] - 1)
    member = table_keys[idx_c] == canon
    return jnp.sum(scanned & member, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def filter_pairs(m1_reads, m1_quals, m1_lens, m2_reads, m2_quals, m2_lens,
                 table_keys, k: int, min_q: int, threshold: int):
    """Paired-end keep mask: mate1 hits >= T, OR (else) mate2 hits >= T."""
    h1 = window_hits(m1_reads, m1_quals, m1_lens, table_keys, k, min_q)
    h2 = window_hits(m2_reads, m2_quals, m2_lens, table_keys, k, min_q)
    return (h1 >= threshold) | (h2 >= threshold), h1, h2


@functools.partial(jax.jit, static_argnames=("k",))
def filter_single(reads, quals, lens, table_keys, k: int, min_q: int,
                  threshold: int):
    """Single-end keep mask (RUFUS.Filter.ss.cpp path)."""
    h = window_hits(reads, quals, lens, table_keys, k, min_q)
    return h >= threshold, h
