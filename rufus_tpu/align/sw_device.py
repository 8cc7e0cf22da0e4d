"""Batched Smith-Waterman on device: the `sw_kernel` seam filled.

The aligner's per-candidate local affine-gap DP (align/aligner.py
sw_kernel) is the O(n*m) hot loop of both mutant-read alignment
(runRufus.sh:1000 role) and contig alignment (Overlap.shorter.sh:209
role). This module runs the SAME recurrence for a whole batch of
(query, window) candidate pairs as one jitted lax.scan over query rows —
each row is a (B, m) vector update (VPU-friendly), with the horizontal-
gap term in closed form via a running cummax (no inner loop):

    E[j] = max_{j'<j}(H[j'] + ext*j') - open - ext - ext*j

Bit-exactness contract: identical integer scores, best cell, AND H
matrix to the numpy sw_kernel (tested in test_sw_device.py), so the
host-side traceback / clip-extension / MAPQ chain is unchanged and the
device path cannot perturb parity (the golden contig is order-sensitive
to candidate scores).

Scale contract: H for a batch is (B, n+1, m+1) i32 — callers chunk B so
the returned H stays within a budget (Aligner.sw_batch_size); the DP
itself is compute-bound on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MATCH, MISMATCH = 1, -4
GAP_OPEN, GAP_EXT = 6, 1
NEG = -(10 ** 6)


@functools.partial(jax.jit,
                   static_argnames=("n", "m", "match", "mismatch",
                                    "gap_open", "gap_ext"))
def _sw_batch(q, r, n: int, m: int, match: int = MATCH,
              mismatch: int = MISMATCH, gap_open: int = GAP_OPEN,
              gap_ext: int = GAP_EXT):
    """q: (B, n) codes (255 = N/pad), r: (B, m) codes.

    Returns (H (B, n+1, m+1) i32, best_score (B,), best_i (B,),
    best_j (B,)). Padding rows (q == 255) never match, so padded
    queries simply stop improving — identical to running the shorter
    query alone.
    """
    B = q.shape[0]
    j_idx = jnp.arange(m + 1, dtype=jnp.int32) * gap_ext

    def row_step(carry, qi):
        prev, F = carry  # prev: (B, m+1), F: (B, m+1)
        # match scores for this query base against every window base
        sub = jnp.where(
            (qi[:, None] == r) & (qi[:, None] != 255) & (r != 255),
            match, mismatch).astype(jnp.int32)
        F = jnp.maximum(F - gap_ext, prev - gap_open - gap_ext)
        cand = jnp.maximum(jnp.maximum(prev[:, :-1] + sub, F[:, 1:]), 0)
        row = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), cand], axis=1)
        # E via running max of row[j'] + ext*j' over j' < j
        s = row + j_idx[None, :]
        pref = jax.lax.cummax(s[:, :-1], axis=1)
        E = pref - gap_open - gap_ext - j_idx[None, :-1]
        row = row.at[:, 1:].set(jnp.maximum(row[:, 1:], E))
        return (row, F), row

    zero = jnp.zeros((B, m + 1), jnp.int32)
    negF = jnp.full((B, m + 1), NEG, jnp.int32)
    _, rows = jax.lax.scan(row_step, (zero, negF), jnp.swapaxes(q, 0, 1))

    H = jnp.concatenate([zero[:, None, :],
                         jnp.swapaxes(rows, 0, 1)], axis=1)
    # running best with host tie rules, computed from H
    flat = H.reshape(B, -1)
    best_flat = jnp.argmax(flat, axis=1).astype(jnp.int32)
    best_score = jnp.take_along_axis(flat, best_flat[:, None], axis=1)[:, 0]
    best_i = best_flat // (m + 1)
    best_j = best_flat % (m + 1)
    return H, best_score, best_i, best_j


def sw_batch(q_codes: np.ndarray, r_codes: np.ndarray, scoring=None):
    """Batched DP: (B, n) x (B, m) uint8 codes -> (H, score, bi, bj) as
    numpy arrays. See module docstring for the exactness contract.

    NOTE on ties: the host sw_kernel updates its best on strictly-greater
    row maxima scanning i upward and takes the FIRST argmax within a row
    — i.e. the lexicographically smallest (i, j) among maximal cells.
    jnp.argmax over the flattened H picks exactly that cell."""
    q = jnp.asarray(q_codes, jnp.uint8)
    r = jnp.asarray(r_codes, jnp.uint8)
    n, m = q.shape[1], r.shape[1]
    kw = {}
    if scoring is not None:
        kw = dict(match=scoring.match, mismatch=scoring.mismatch,
                  gap_open=scoring.gap_open, gap_ext=scoring.gap_ext)
    H, s, bi, bj = _sw_batch(q.astype(jnp.int32), r.astype(jnp.int32), n=n, m=m,
                             **kw)
    return (np.asarray(H), np.asarray(s), np.asarray(bi), np.asarray(bj))
