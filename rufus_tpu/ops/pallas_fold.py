"""Pallas TPU kernel: RLE-compaction of sorted k-mer runs.

The count engine is sort-bound (see bench.py roofline). Half of the fold's
comparator traffic is NOT the sort of new keys but the *compaction* that
follows run-length encoding: XLA has no fast reorder primitive except
lax.sort, so round 2 compacted by re-sorting a (key, key, count) triple
with holes sentineled (sharded.py::_rle_compact_hilo) — a second full
bitonic sort per fold, ~280 ms at the 48M pending-buffer size.

This kernel compacts EXACTLY in ONE streaming pass instead:

  grid step = one block of BLKC elements of the (already sorted,
  hole-punched) run. In VMEM, a bitonic sort network pushes the block's
  valid entries to the front (valid keys are strictly increasing, so the
  unstable network preserves their order; holes are all-ones sentinels
  that sort last). The valid prefix is then shifted right by the length
  of the PARTIAL ROW CARRIED from the previous block (a dynamic lane
  rotate), the carry is overlaid on row zero, and the whole window is
  DMA'd to the output at a running row offset kept in SMEM — advancing
  by only the number of FULL rows produced. The new partial row is both
  saved as the next carry and written out, where the next (overlapping,
  strictly in-order) write completes it. Ascending full-width writes let
  each window's tail be overwritten by its successor, so no dynamic-size
  DMA is ever needed and the output contains no padding entries at all.

Hard-won lowering notes (each measured or bisected on v5e): weakly-typed
python scalars in kernel expressions send the tracer into infinite
promotion recursion; selecting bool values with jnp.where lowers through
an i8->i1 truncation Mosaic rejects (use AND/OR/NOT algebra); scalar
reductions inside the kernel cost ~9 us each (precompute per-block stats
in XLA and scalar-prefetch them); conditionals around DMAs and SMEM
*outputs* both serialize the grid (~20-40x).

Reference role: replaces the sorted-run compaction inside the modified
Jellyfish merge (merge_files.cc:69-153) and the hash-array's in-place
compaction on dump (large_hash_array.hpp) — reformulated for a machine
whose only fast reorder is a comparator network.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLKC = 4096          # elements per grid step (32 rows x 128 lanes)
_ROWS = BLKC // 128
_ONES = np.uint32(0xFFFFFFFF)  # np scalar: a jnp constant would be a
# captured device array inside the pallas kernel (not allowed)


def _cmp_ge(h1, l1, h2, l2):
    """(h1,l1) > (h2,l2) lexicographic, u32 planes."""
    return (h1 > h2) | ((h1 == h2) & (l1 > l2))


def _block_bitonic_sort(h, l, c):
    """Full bitonic sort of a (ROWS, 128) block in flat row-major order by
    (h, l) ascending, payload c. Stage strides >= 128 are row reshapes;
    strides < 128 are lane rolls (partner = index XOR stride)."""
    R = h.shape[0]
    n = R * 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    flat = row * 128 + lane

    def exchange(h, l, c, s, k_):
        # partner = flat XOR s; keep = min on the "lower" side of each
        # pair if ascending (dir 0), max if descending (dir 1)
        is_lo = (flat & s) == 0
        desc = (flat & k_) != 0
        if s >= 128:
            sr = s // 128
            hr = h.reshape(R // (2 * sr), 2, sr, 128)
            lr = l.reshape(R // (2 * sr), 2, sr, 128)
            cr = c.reshape(R // (2 * sr), 2, sr, 128)
            # partner of half 0 is half 1 and vice versa
            ph = jnp.stack([hr[:, 1], hr[:, 0]], axis=1)
            pl_ = jnp.stack([lr[:, 1], lr[:, 0]], axis=1)
            pc = jnp.stack([cr[:, 1], cr[:, 0]], axis=1)
            ph = ph.reshape(R, 128)
            pl_ = pl_.reshape(R, 128)
            pc = pc.reshape(R, 128)
        else:
            # lane-level exchange: roll by 128-s (circular) gives
            # x[lane+s] for lane&s==0, roll by +s gives x[lane-s] for
            # lane&s!=0 (s power of two keeps both in-segment, so the
            # circular wrap never crosses a segment boundary)
            up = np.int32(128 - s)  # i32: bare python ints become i64
            dn = np.int32(s)        # under x64, tpu.dynamic_rotate rejects
            hm, hp = pltpu.roll(h, up, 1), pltpu.roll(h, dn, 1)
            lm, lp = pltpu.roll(l, up, 1), pltpu.roll(l, dn, 1)
            cm, cp = pltpu.roll(c, up, 1), pltpu.roll(c, dn, 1)
            lane_lo = (lane & s) == 0
            ph = jnp.where(lane_lo, hm, hp)
            pl_ = jnp.where(lane_lo, lm, lp)
            pc = jnp.where(lane_lo, cm, cp)
        me_gt = _cmp_ge(h, l, ph, pl_)       # me > partner (strict)
        par_gt = _cmp_ge(ph, pl_, h, l)      # partner > me (strict)
        # ascending pair: lower index keeps min, upper keeps max; desc
        # flips. BOTH strict compares are needed — deriving the upper
        # side as ~me_gt would make a TIE take the partner on one side
        # only, duplicating one payload and losing the other. Pure
        # AND/OR/NOT algebra: selecting BOOL values with jnp.where
        # lowers through an i8->i1 truncation Mosaic rejects.
        take_a = (desc & par_gt) | (~desc & me_gt)   # lower-side rule
        take_b = (desc & me_gt) | (~desc & par_gt)   # upper-side rule
        want_partner = (is_lo & take_a) | (~is_lo & take_b)
        # tie (equal keys): both sides must make the SAME choice or data
        # duplicates/vanishes; "i_am_greater" is False on both sides of a
        # tie so both keep their own element — consistent.
        nh = jnp.where(want_partner, ph, h)
        nl = jnp.where(want_partner, pl_, l)
        nc = jnp.where(want_partner, pc, c)
        return nh, nl, nc

    k_ = 2
    while k_ <= n:
        s = k_ // 2
        while s >= 1:
            h, l, c = exchange(h, l, c, s, k_ if k_ < n else 0)
            s //= 2
        k_ *= 2
    return h, l, c


def _flat_roll_right(x, pad_row, sh_lanes):
    """Roll a (R, 128) block right by sh_lanes (< 128) in FLAT row-major
    order, appending one extra row: out has R+1 rows, out_flat[i] =
    in_flat[i - sh_lanes] (front lanes of row 0 are left as wrapped
    garbage — caller overlays them). Uses the TPU dynamic lane rotate."""
    R = x.shape[0]
    ext = jnp.concatenate([x, pad_row], axis=0)          # (R+1, 128)
    rot = pltpu.roll(ext, sh_lanes, 1)                   # lane rotate
    # lanes < sh take the PREVIOUS row's rotated value (flat carry-over)
    prev = jnp.concatenate([rot[-1:], rot[:-1]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R + 1, 128), 1)
    return jnp.where(lane >= sh_lanes, rot, prev)


def _compact_kernel(nv_ref, h_ref, l_ref, c_ref,
                    oh_ref, ol_ref, oc_ref,
                    sh, sl, sc, ch, cl, cc, sem, off_ref,
                    *, out_rows: int):
    step = pl.program_id(0)

    @pl.when(step == jnp.int32(0))
    def _():
        off_ref[np.int32(0)] = jnp.int32(0)  # output row offset
        off_ref[np.int32(1)] = jnp.int32(0)  # carry length (lanes)

    h, l, c = h_ref[:], l_ref[:], c_ref[:]
    h, l, c = _block_bitonic_sort(h, l, c)

    # per-block valid counts come in via scalar prefetch: in-Mosaic
    # scalar reductions measured ~9 us EACH; XLA computes all blocks'
    # counts in one cheap streaming pass
    nv = nv_ref[step]
    cln = off_ref[np.int32(1)]

    # EXACT compaction with a cross-block carry: this block's nv valid
    # elements are shifted right by the carry length, the carried partial
    # row is overlaid on row 0, and only the resulting FULL rows advance
    # the output offset. The new partial row (tail) is saved as the next
    # carry AND also written out, where the next block's (overlapping,
    # in-order) write completes it — so the output needs no per-block
    # dummy padding at all (an earlier revision padded each block to a
    # row boundary with zero-count duplicates: at 4096-element blocks
    # that inflated tables by 10-25%, forcing capacity growth).
    lane = jax.lax.broadcasted_iota(jnp.int32, (_ROWS + 1, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_ROWS + 1, 128), 0)
    flat = row * 128 + lane
    sent_h = jnp.full((1, 128), _ONES, jnp.uint32)
    sent_c = jnp.zeros((1, 128), jnp.int32)
    bh = _flat_roll_right(h, sent_h, cln)
    bl = _flat_roll_right(l, sent_h, cln)
    bc = _flat_roll_right(c, sent_c, cln)
    on_carry = (row == jnp.int32(0)) & (lane < cln)
    total = cln + nv
    in_content = flat < total
    sh[:] = jnp.where(on_carry, ch[:], jnp.where(in_content, bh, _ONES))
    sl[:] = jnp.where(on_carry, cl[:], jnp.where(in_content, bl, _ONES))
    sc[:] = jnp.where(on_carry, cc[:], jnp.where(in_content, bc,
                                                 jnp.int32(0)))
    full_rows = total // jnp.int32(128)
    new_cln = total - full_rows * jnp.int32(128)
    # save the new carry: the (possibly partial) row at full_rows
    ch[:] = sh[pl.ds(full_rows, 1), :]
    cl[:] = sl[pl.ds(full_rows, 1), :]
    cc[:] = sc[pl.ds(full_rows, 1), :]

    row_off = off_ref[np.int32(0)]
    row_off = jnp.minimum(row_off, jnp.int32(out_rows - _ROWS - 1))

    # UNCONDITIONAL DMA: wrapping it in pl.when(nv > 0) serializes the
    # whole grid (~47 us/step of lost pipelining, measured). The write
    # spans _ROWS+1 rows; rows past full_rows are garbage that the next
    # (overlapping, strictly in-order: cp.wait below) write overwrites,
    # and the caller masks everything past the true total.
    cp_h = pltpu.make_async_copy(
        sh.at[:, :], oh_ref.at[pl.ds(row_off, _ROWS + 1), :],
        sem.at[np.int32(0)])
    cp_l = pltpu.make_async_copy(
        sl.at[:, :], ol_ref.at[pl.ds(row_off, _ROWS + 1), :],
        sem.at[np.int32(1)])
    cp_c = pltpu.make_async_copy(
        sc.at[:, :], oc_ref.at[pl.ds(row_off, _ROWS + 1), :],
        sem.at[np.int32(2)])
    cp_h.start()
    cp_l.start()
    cp_c.start()
    cp_h.wait()
    cp_l.wait()
    cp_c.wait()

    # no SMEM *output*: a per-step SMEM writeback serializes the grid
    # (measured 20x); the caller derives the total from nv in XLA
    off_ref[np.int32(0)] = row_off + full_rows
    off_ref[np.int32(1)] = new_cln


@functools.partial(jax.jit, static_argnames=("cap_out", "interpret"))
def compact_sorted_hilo(h, l, c, cap_out: int, interpret: bool = False):
    """Compact sorted-with-holes u32 planes (+ i32 counts) to cap_out.

    h, l: (n,) u32 sorted runs where holes are all-ones sentinels and the
    valid entries are strictly increasing (run heads). c: (n,) i32 counts
    (0 at holes). cap_out: output slot count, multiple of 128, >= BLKC.

    Returns (h_out, l_out, c_out, slots_used, true_unique) with
    slots_used == true_unique (the cross-block carry makes compaction
    EXACT — no padding entries); slots beyond it are sentinel/0.
    slots_used > cap_out means the output was clamped (lossy): grow and
    retry, as with table overflow."""
    # the unrolled bitonic network is a >2000-deep expression chain;
    # recursive jaxpr/lowering passes need headroom past CPython's 1000
    if sys.getrecursionlimit() < 100000:
        sys.setrecursionlimit(100000)
    n = h.shape[0]
    pad = (-n) % BLKC
    if pad:
        h = jnp.concatenate([h, jnp.full((pad,), _ONES, jnp.uint32)])
        l = jnp.concatenate([l, jnp.full((pad,), _ONES, jnp.uint32)])
        c = jnp.concatenate([c, jnp.zeros((pad,), jnp.int32)])
        n += pad
    assert cap_out % 128 == 0 and cap_out >= BLKC
    R_in = n // 128
    # allocate one block + one row of slack: every write spans
    # _ROWS+1 rows whose tail the NEXT block overwrites, so content that
    # exactly fills cap_out still needs a landing zone (sliced off below)
    out_rows = cap_out // 128 + _ROWS + 1
    nb = n // BLKC
    z = np.int32(0)
    # per-block valid counts in XLA (one streaming pass)
    valid = ~((h == _ONES) & (l == _ONES))
    nv = jnp.sum(valid.reshape(nb, BLKC), axis=1, dtype=jnp.int32)
    kernel = functools.partial(_compact_kernel, out_rows=out_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((_ROWS, 128), lambda i, *_: (i, z)),
                  pl.BlockSpec((_ROWS, 128), lambda i, *_: (i, z)),
                  pl.BlockSpec((_ROWS, 128), lambda i, *_: (i, z))],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[pltpu.VMEM((_ROWS + 1, 128), jnp.uint32),
                        pltpu.VMEM((_ROWS + 1, 128), jnp.uint32),
                        pltpu.VMEM((_ROWS + 1, 128), jnp.int32),
                        pltpu.VMEM((1, 128), jnp.uint32),
                        pltpu.VMEM((1, 128), jnp.uint32),
                        pltpu.VMEM((1, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA((3,)),
                        pltpu.SMEM((2,), jnp.int32)],
    )
    oh, ol, oc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((out_rows, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((out_rows, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((out_rows, 128), jnp.int32)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(nv, h.reshape(R_in, 128), l.reshape(R_in, 128), c.reshape(R_in, 128))
    # exact total in XLA (no SMEM output: a per-step SMEM writeback
    # serializes the grid, measured 20x)
    slots = jnp.sum(nv, dtype=jnp.int64).astype(jnp.int32)
    uniq = slots
    # slice off the landing-zone slack, then mask the tail beyond the
    # total (the final carry row's unwritten lanes and stale garbage)
    idx = jnp.arange(cap_out, dtype=jnp.int32)
    live = idx < slots
    oh = jnp.where(live, oh.reshape(-1)[:cap_out], _ONES)
    ol = jnp.where(live, ol.reshape(-1)[:cap_out], _ONES)
    oc = jnp.where(live, oc.reshape(-1)[:cap_out], 0)
    return oh, ol, oc, slots, uniq
