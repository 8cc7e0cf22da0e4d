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
import numpy as np

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


# ---------------------------------------------------------------------------
# Fast path: Bloom pre-filter on device + exact host verification.
#
# searchsorted over a u64 table costs ~300ms per 8k-read batch on TPU
# (emulated 64-bit compares x 16 binary-search steps); a 2-hash bit-array
# probe in u32 arithmetic costs ~0.1ms. False positives only — candidate
# reads (rare) are re-checked exactly on the host, so the keep set is
# bit-identical to the exact kernel.
# ---------------------------------------------------------------------------

BLOOM_LOG2 = 24  # 16M bits = 2 MB of u32 words

_C1 = np.uint32(2654435761)
_C2 = np.uint32(2246822519)
_C3 = np.uint32(3266489917)


def _bloom_hashes_np(keys: np.ndarray):
    """Blocked bloom: one u32 word per key (h1) holding two bits (from h2).

    A single gather per probe — gathers dominate the probe cost on TPU."""
    hi = (keys >> np.uint64(32)).astype(np.uint32)
    lo = keys.astype(np.uint32)
    word_mask = np.uint32((1 << BLOOM_LOG2) // 32 - 1)
    with np.errstate(over="ignore"):
        m1 = (hi * _C1) ^ (lo * _C2)
        m1 ^= m1 >> np.uint32(15)
        m1 *= _C3
        m1 ^= m1 >> np.uint32(13)
        m2 = (lo * _C3) ^ (hi * _C2) ^ np.uint32(0x9E3779B9)
        m2 ^= m2 >> np.uint32(16)
        m2 *= _C1
        m2 ^= m2 >> np.uint32(11)
    h1 = m1 & word_mask
    b1 = (m2 >> np.uint32(27)) & np.uint32(31)
    b2 = (m2 >> np.uint32(22)) & np.uint32(31)
    return h1, b1, b2


def build_bloom(table_keys: np.ndarray) -> np.ndarray:
    """Host: canonical mutant k-mers -> u32 blocked-bloom for device probing."""
    words = np.zeros((1 << BLOOM_LOG2) // 32, dtype=np.uint32)
    if len(table_keys):
        h1, b1, b2 = _bloom_hashes_np(np.asarray(table_keys, dtype=np.uint64))
        np.bitwise_or.at(words, h1, (np.uint32(1) << b1) | (np.uint32(1) << b2))
    return words


@functools.partial(jax.jit, static_argnames=("k",))
def window_candidate_hits(ascii_reads, quals, lens, bloom_words, k: int,
                          min_q: int):
    """Per-read count of scanned windows whose canonical k-mer probes
    positive in the Bloom bit-array (superset of window_hits)."""
    B, L = ascii_reads.shape
    codes = codec.encode_bases(ascii_reads)
    good = (codes != codec.INVALID) & ((quals.astype(jnp.int32) - 33) >= min_q)
    pos = jnp.arange(L, dtype=jnp.int32)
    good = good & (pos[None, :] < lens[:, None])
    kmers, _ = codec.pack_kmers(codes, k)
    canon = codec.canonical_kmers(kmers, k)
    run = jnp.cumsum(good.astype(jnp.int32), axis=1)
    run_k = run[:, k - 1 :] - jnp.pad(run, ((0, 0), (1, 0)))[:, : L - k + 1]
    end_pos = pos[k - 1 :]
    scanned = (run_k == k) & (end_pos[None, :] <= lens[:, None] - 2)

    hi = (canon >> jnp.uint64(32)).astype(jnp.uint32)
    lo = canon.astype(jnp.uint32)
    word_mask = jnp.uint32((1 << BLOOM_LOG2) // 32 - 1)
    m1 = (hi * _C1) ^ (lo * _C2)
    m1 = m1 ^ (m1 >> jnp.uint32(15))
    m1 = m1 * _C3
    m1 = m1 ^ (m1 >> jnp.uint32(13))
    m2 = (lo * _C3) ^ (hi * _C2) ^ jnp.uint32(0x9E3779B9)
    m2 = m2 ^ (m2 >> jnp.uint32(16))
    m2 = m2 * _C1
    m2 = m2 ^ (m2 >> jnp.uint32(11))
    h1 = m1 & word_mask
    b1 = (m2 >> jnp.uint32(27)) & jnp.uint32(31)
    b2 = (m2 >> jnp.uint32(22)) & jnp.uint32(31)
    word = bloom_words[h1]  # the single gather
    member = (((word >> b1) & 1) & ((word >> b2) & 1)).astype(bool)
    return jnp.sum(scanned & member, axis=1).astype(jnp.int32)


# Above this the Bloom+verify path wins: the fused Pallas kernel's
# membership loop is UNROLLED T times (padded to a power of two), so a
# 4096-key table both compiles pathologically slowly and costs
# O(B*W*T) compares at runtime — measured fine at T<=1024, hopeless at
# 4096 (a WGS-scale HashList with hundreds of real variants). The Bloom
# probe is T-independent; its rare candidates are verified host-exact.
SMALL_TABLE_MAX = 1024


@functools.partial(jax.jit, static_argnames=("k",))
def window_hits_small(ascii_reads, quals, lens, table_keys, k: int, min_q: int):
    """Exact per-read hits via broadcast-compare against a SMALL table.

    De novo HashLists are typically tiny (tens to hundreds of k-mers); an
    all-pairs equality test in chunks beats both binary search (emulated
    u64 compares x log T) and Bloom+verify, and is exact.
    """
    B, L = ascii_reads.shape
    T = table_keys.shape[0]
    if T == 0:
        return jnp.zeros((B,), dtype=jnp.int32)
    codes = codec.encode_bases(ascii_reads)
    good = (codes != codec.INVALID) & ((quals.astype(jnp.int32) - 33) >= min_q)
    pos = jnp.arange(L, dtype=jnp.int32)
    good = good & (pos[None, :] < lens[:, None])
    kmers, _ = codec.pack_kmers(codes, k)
    canon = codec.canonical_kmers(kmers, k)
    run = jnp.cumsum(good.astype(jnp.int32), axis=1)
    run_k = run[:, k - 1 :] - jnp.pad(run, ((0, 0), (1, 0)))[:, : L - k + 1]
    end_pos = pos[k - 1 :]
    scanned = (run_k == k) & (end_pos[None, :] <= lens[:, None] - 2)
    member = jnp.zeros(canon.shape, dtype=bool)
    CH = 512
    for t0 in range(0, T, CH):
        chunk = table_keys[t0 : t0 + CH]
        member = member | (canon[..., None] == chunk[None, None, :]).any(-1)
    return jnp.sum(scanned & member, axis=1).astype(jnp.int32)


def small_table_hits_auto(reads, quals, lens, keys_np: np.ndarray, k: int,
                          min_q: int) -> np.ndarray:
    """Exact per-read hit counts for a SMALL table, picking the fastest
    backend: the fused Pallas kernel on TPU (fastest measured filter path,
    ~4.2M reads/s/chip at T=256), the XLA broadcast-compare elsewhere.
    Handles Pallas' block-size padding; (B,) int32 out."""
    import jax
    import jax.numpy as jnp

    B = reads.shape[0]
    if jax.default_backend() == "tpu" and len(keys_np):
        from . import pallas_filter

        pad = (-B) % pallas_filter.BLK
        # jnp (not np) conversions/padding: callers may pass DEVICE
        # arrays (the driver's packed-transport filter path) — an
        # np.asarray here would round-trip them through the host
        r = jnp.asarray(reads)
        q = jnp.asarray(quals)
        l = jnp.asarray(lens)
        if pad:
            r = jnp.concatenate([r, jnp.full((pad, r.shape[1]),
                                             ord("N"), jnp.uint8)])
            q = jnp.concatenate([q, jnp.full((pad, q.shape[1]),
                                             ord("!"), jnp.uint8)])
            l = jnp.concatenate([l, jnp.zeros(pad, l.dtype)])
        hi, lo = pallas_filter.split_table(keys_np)
        h = pallas_filter.pallas_window_hits(
            r, q, l, jnp.asarray(hi), jnp.asarray(lo), k, min_q)
        return np.asarray(h).ravel()[:B]
    return np.asarray(window_hits_small(
        jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
        jnp.asarray(keys_np), k, min_q))


def exact_hits_host(seq: str, qual: str, sorted_keys: np.ndarray, k: int,
                    min_q: int) -> int:
    """Host-exact replication of the RUFUS.Filter window scan for one read."""
    hits = 0
    streak = 0
    n = len(seq)
    for i in range(0, n - 1):
        if ord(qual[i]) - 33 < min_q or seq[i] not in "ACGT":
            streak = 0
        else:
            streak += 1
        if streak >= k:
            w = seq[i - k + 1 : i + 1]
            v = np.uint64(codec.str_to_kmer(codec.canonical_str(w)))
            j = int(np.searchsorted(sorted_keys, v))
            if j < len(sorted_keys) and sorted_keys[j] == v:
                hits += 1
    return hits

