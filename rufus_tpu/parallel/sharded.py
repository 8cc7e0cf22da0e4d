"""Mesh-sharded k-mer pipeline: device-resident sharded tables.

Design (scaling-book style): one 1-D mesh over all chips, LOCAL-
AGGREGATE counting (the combiner idiom — round 4):

  count:    per batch, each device only encodes + defers its raw window
            keys locally (local_count_step) — ZERO per-batch collectives,
            identical work to the single-chip path
  flush:    each device sorts its own pending (2 u32 lanes) + RLE-
            compacts to sorted-unique partials, cuts them at RANGE
            SPLITTERS (sampled quantiles — canonical min(fwd,rc) skews
            keys low, so top-bit partitioning would overload shard 0; the
            partials are already sorted so routing needs NO extra sort),
            and all_to_alls only the unique (key, count) pairs —
            O(unique) per flush, not O(windows) per batch
  fold:     local merge of the shard's running table with the received
            runs (LSM fold, no collectives)
  subtract: every sample's table shares the splitters, so the "present
            in exactly ONE sample && count >= 5" test (reference
            modifiedJellyfish/jellyfish/merge_files.cc:69-153) fused
            with the subject count-range filter (CheckJellyHashList.sh:12)
            is local per shard: a tagged sort-merge membership test
  query:    genotyping lookups are routed to their owner shard (hash or
            splitters) by all_to_all, answered by local u32-plane
            bisection, routed back
  filter:   data-parallel over reads with the (small) mutant HashList
            replicated (RUFUS.Filter.cpp:196-277 role)

The per-batch hash-routed count step (sharded_count_step at n>1) is kept
as an alternative for streaming-latency-sensitive deployments.

Determinism: table contents are sorted-unique and independent of shard
count and batch boundaries (the parity requirement of SURVEY.md §7.3);
tests assert exact equality of the sharded chain vs the single-device
host path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import codec, count

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

P = jax.sharding.PartitionSpec


def make_mesh(n_devices: int | None = None, axis: str = "d"):
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        # fail fast: silently building a smaller mesh turns sized routing
        # capacities into guaranteed overflow (e.g. the axon TPU plugin
        # winning backend selection over a virtual CPU mesh request)
        raise ValueError(
            f"mesh wants {n} devices but backend "
            f"{jax.default_backend()!r} has {len(devs)}")
    return jax.sharding.Mesh(np.array(devs[:n]), (axis,))


# Owner assignment: a multiplicative mixer over the (hi, lo) u32 planes of
# the canonical k-mer. Plain top-bit partitioning is load-imbalanced on real
# genomes (canonical = min(fwd, rc) biases keys low; base composition skews
# further); hashing decorrelates owner from sequence content — the role of
# jellyfish's invertible matrix hash (large_hash_array.hpp:298-325), except
# we never need to invert because the key rides along with its slot.
_MIX1 = np.uint32(0x9E3779B1)
_MIX2 = np.uint32(0x85EBCA77)
_MIX3 = np.uint32(0xC2B2AE3D)


def _owner_hash_hilo(hi, lo, n_shards: int):
    """Owner shard of each k-mer given as u32 (hi, lo) planes. Near-uniform
    for any key distribution and any n_shards (not just powers of two).
    Native u32 arithmetic only (no emulated-u64 ops on TPU)."""
    if n_shards == 1:
        return jnp.zeros(hi.shape, jnp.int32)
    h = (hi * _MIX1) ^ (lo * _MIX2)
    h = h ^ (h >> jnp.uint32(15))
    h = h * _MIX3
    h = h ^ (h >> jnp.uint32(13))
    return (h % jnp.uint32(n_shards)).astype(jnp.int32)


def _owners(keys, n_shards: int, k: int):
    """Owner shard of u64 canonical k-mers (hash-partitioned; see
    _owner_hash_hilo). `k` is unused but kept for call-site clarity."""
    del k
    if n_shards == 1:
        return jnp.zeros(keys.shape, jnp.int32)
    hi = (keys >> jnp.uint64(32)).astype(jnp.uint32)
    lo = keys.astype(jnp.uint32)
    return _owner_hash_hilo(hi, lo, n_shards)


def route_capacity(m: int, n_shards: int, slack: float = 0.3) -> int:
    """Per-peer routing capacity for m keys spread over n_shards bins by a
    uniform hash: mean + max(slack*mean, 6*sqrt(mean)), rounded up to a
    lane-aligned multiple of 128 and clamped to m (can't receive more than
    everything). Overflow beyond this is *detected* (lossless) and callers
    retry with double the capacity — the ShardedKmerTable._grow pattern."""
    if n_shards == 1:
        return m
    mean = m / n_shards
    cap = mean + max(slack * mean, 6.0 * np.sqrt(max(mean, 1.0)))
    cap = int(-(-cap // 128) * 128)
    return max(128, min(m, cap))


def host_owners(kmers: np.ndarray, n_shards: int,
                splitters: np.ndarray | None = None) -> np.ndarray:
    """Owner shard of host u64 k-mers — numpy mirror of the device
    owner functions (_owner_hash_hilo / _owners_by_splitters), bit-exact,
    so callers can size routing capacities EXACTLY instead of padding
    with statistical slack. SENTINEL keys get owner n_shards."""
    kmers = np.asarray(kmers, np.uint64)
    if splitters is not None:
        owner = np.searchsorted(np.asarray(splitters, np.uint64), kmers,
                                side="right").astype(np.int32)
    elif n_shards == 1:
        owner = np.zeros(kmers.shape, np.int32)
    else:
        hi = (kmers >> np.uint64(32)).astype(np.uint32)
        lo = kmers.astype(np.uint32)
        with np.errstate(over="ignore"):
            h = (hi * _MIX1) ^ (lo * _MIX2)
            h = h ^ (h >> np.uint32(15))
            h = h * _MIX3
            h = h ^ (h >> np.uint32(13))
        owner = (h % np.uint32(n_shards)).astype(np.int32)
    return np.where(kmers == count.SENTINEL, np.int32(n_shards), owner)


def exact_route_cap(padded_queries: np.ndarray, n_shards: int,
                    splitters: np.ndarray | None = None) -> int:
    """The exact per-peer routing bin width a (n_shards, qcap) query
    dispatch needs: max over (source device, owner) bin counts, rounded
    up to a lane-aligned 128. Computed host-side from the same owner
    function the device uses, so routed dispatches sized with this can
    NEVER overflow — no slack inflation (route_capacity's +30% directly
    inflates the per-peer lookup and return-trip volume) and no retry."""
    q = np.asarray(padded_queries, np.uint64).reshape(n_shards, -1)
    mx = 0
    for row in q:
        owner = host_owners(row, n_shards, splitters)
        owner = owner[owner < n_shards]
        if len(owner):
            mx = max(mx, int(np.bincount(owner,
                                         minlength=n_shards).max()))
    return max(128, -(-mx // 128) * 128)


def searchsorted_u64(keys, q):
    """Left-bisect u64 queries into a sorted u64 array using ONLY u32
    compares and gathers.

    Native jnp.searchsorted on u64 operands FAULTS the TPU worker at
    tens-of-millions element sizes (reproduced on v5e via the axon
    relay: a 67M x 67M u64 searchsorted kills the device; the identical
    shape in u32, and 67M random gathers, are fine — the emulated-u64
    compare inside XLA's bisection loop is the trigger). This manual
    vectorized bisection runs ~log2(n) rounds of two u32 gathers."""
    n = keys.shape[0]
    kh = (keys >> jnp.uint64(32)).astype(jnp.uint32)
    kl = keys.astype(jnp.uint32)
    qh = (q >> jnp.uint64(32)).astype(jnp.uint32)
    ql = q.astype(jnp.uint32)
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, n, jnp.int32)
    # bisection over the CLOSED interval [0, n]: n.bit_length() rounds
    # (one more than (n-1).bit_length() — the shorter count left stragglers
    # unconverged), and the compare is masked so keys[n] acts as +inf
    # (otherwise the clamped midc = n-1 compare pushes lo past n once
    # lo == hi == n). Property-tested against np.searchsorted.
    for _ in range(max(1, int(n).bit_length())):
        mid = (lo + hi) >> 1
        midc = jnp.minimum(mid, n - 1)
        mh = kh[midc]
        ml = kl[midc]
        less = (mh < qh) | ((mh == qh) & (ml < ql))
        less = less & (mid < n)
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    return lo


def _sort_pairs(keys, cnts):
    """Sort (keys, cnts) by keys with native-width compares.

    u64 compares are emulated on TPU (no 64-bit VPU lanes); splitting into
    (hi, lo) u32 and using lax.sort with num_keys=2 keeps every compare in
    native u32 — measurably faster than jnp.sort on u64 and exact."""
    hi = (keys >> jnp.uint64(32)).astype(jnp.uint32)
    lo = keys.astype(jnp.uint32)
    hi, lo, cnts = jax.lax.sort((hi, lo, cnts), num_keys=2)
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64), cnts


_U32_ONES = np.uint32(0xFFFFFFFF)


def _rle_compact_hilo(h, l, counts, cap: int):
    """RLE sorted (hi, lo) u32 key planes and compact the run heads into
    width-`cap` outputs (SENTINEL-plane padded, still sorted).

    counts=None means every element contributes 1 (raw keys); otherwise
    per-element i32 counts are summed per run.

    Run sums are PREFIX-CODED through the compaction instead of gathered:
    each head carries the exclusive WRAPPING-u32 prefix sum of counts at
    its position; after compaction, consecutive heads' prefixes differ by
    exactly the run total (exact under u32 wraparound while any single
    run's sum < 2^32), recovered with one elementwise shift-subtract.
    This removes an O(n) variable-index gather — measured 19 ns/element
    at the 8.4M fold size on v5e, 3x the cost of the compaction itself —
    plus the flip-cummin next-head scan and the i64 cumsum.

    Two compaction paths, identical (exact) output:
    * TPU + big-enough shapes: the Pallas streaming kernel
      (ops/pallas_fold.py) — one pass of in-VMEM per-block sorting with
      carry-chained running-offset DMA writes, ~2.2x faster than
      re-sorting at the 48M pending size.
    * otherwise: sort of (key planes, prefix plane) — run heads keep
      their key, non-heads become SENTINEL planes, and the sort moves
      the holes to the tail so truncation to cap is lossless. (A
      cumsum+scatter compaction is ~5x slower: XLA lowers large
      variable-index scatters near-serially, ~9M el/s measured on v5e.)

    Returns (hi, lo, sums_i32, n_unique); keys beyond cap are DROPPED —
    callers must treat n_unique > cap as overflow and retry bigger."""
    n = h.shape[0]
    neq = (h[1:] != h[:-1]) | (l[1:] != l[:-1])
    head = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_sent = (h == _U32_ONES) & (l == _U32_ONES)
    valid = head & ~is_sent
    # `total` must be the prefix at the FIRST SENTINEL (sentinels sort to
    # the tail and are excluded from the compacted output, so the last
    # valid run's sum is total - its prefix — using the whole-array total
    # would inflate it by the trailing sentinel region)
    if counts is None:
        # exclusive prefix of all-ones counts == the index itself
        pref = jnp.arange(n, dtype=jnp.uint32)
        total = jnp.sum(~is_sent, dtype=jnp.uint32)
    else:
        cu = jnp.where(is_sent, jnp.uint32(0), counts.astype(jnp.uint32))
        inc = jnp.cumsum(cu)  # wrapping u32 prefix
        pref = jnp.concatenate([jnp.zeros((1,), jnp.uint32), inc[:-1]])
        total = inc[-1]
    uh = jnp.where(valid, h, _U32_ONES)
    ul = jnp.where(valid, l, _U32_ONES)
    us = jnp.where(valid, pref, 0)

    def _diff_sums(oc_u32, slots):
        idx_o = jnp.arange(oc_u32.shape[0], dtype=jnp.int32)
        nxt = jnp.concatenate([oc_u32[1:], jnp.zeros((1,), jnp.uint32)])
        nxt = jnp.where(idx_o + 1 == slots, total, nxt)
        d = nxt - oc_u32  # wrapping difference = exact run sum < 2^32
        d = jnp.minimum(d, jnp.uint32(2**31 - 1)).astype(jnp.int32)
        return jnp.where(idx_o < slots, d, 0)

    from ..ops import pallas_fold

    if (jax.default_backend() == "tpu" and cap % 128 == 0
            and cap >= pallas_fold.BLKC and n >= pallas_fold.BLKC):
        oh, ol, oc, slots, _ = pallas_fold.compact_sorted_hilo(
            uh, ul, us.astype(jnp.int32), cap)
        sums = _diff_sums(oc.astype(jnp.uint32), slots)
        return oh, ol, sums, slots.astype(jnp.int64)
    us32 = us.astype(jnp.int32)
    uh, ul, us32 = jax.lax.sort((uh, ul, us32), num_keys=2)
    nv = valid.sum(dtype=jnp.int64)
    sums = _diff_sums(us32[:cap].astype(jnp.uint32),
                      jnp.minimum(nv, cap).astype(jnp.int32))
    return uh[:cap], ul[:cap], sums, nv


def _route_segments(owner, planes, fills, n_shards: int, capacity: int):
    """Scatter-free routing: sort the key planes by owner, then cut each
    owner's contiguous segment into a (n_shards, capacity) bin row with one
    dynamic_slice per row (TPU dynamic_slice is fast; variable-index
    scatters lower near-serially — measured ~9M el/s on v5e).

    owner: (m,) i32, entries == n_shards mean "invalid, drop silently".
    planes: tuple of (m,) arrays routed together; fills: pad value per
    plane. Returns (routed planes each (n_shards, capacity), dropped) where
    `dropped` counts VALID keys lost to capacity overflow — callers must
    treat dropped > 0 as a retry-with-bigger-capacity signal."""
    m = owner.shape[0]
    sorted_all = jax.lax.sort((owner,) + tuple(planes), num_keys=1)
    owner_s, planes_s = sorted_all[0], sorted_all[1:]
    bounds = jnp.arange(n_shards + 1, dtype=owner.dtype)
    starts = jnp.searchsorted(owner_s, bounds).astype(jnp.int32)
    seg_len = starts[1:] - starts[:-1]
    dropped = jnp.sum(jnp.maximum(seg_len - capacity, 0).astype(jnp.int64))
    col = jax.lax.broadcasted_iota(jnp.int32, (n_shards, capacity), 1)
    in_seg = col < seg_len[:, None]
    routed = []
    for p, fill in zip(planes_s, fills):
        padded = jnp.concatenate([p, jnp.full((capacity,), fill, p.dtype)])
        rows = jnp.stack([
            jax.lax.dynamic_slice(padded, (starts[q],), (capacity,))
            for q in range(n_shards)])
        routed.append(jnp.where(in_seg, rows, fill))
    return routed, dropped


def _bucket_by_owner(keys_flat, owner, n_shards: int, capacity: int,
                     payload=None):
    """Route keys (+ optional payload) into (n_shards, capacity) bins padded
    with SENTINEL. Returns bins (and payload bins, the (owner, rank)
    coordinates of each input so callers can un-route replies, and the
    count of valid keys dropped by capacity overflow).

    Callers must check `dropped` and retry with a bigger capacity when
    nonzero — routing is otherwise lossless."""
    n = keys_flat.shape[0]
    order = jnp.argsort(owner, stable=True)
    keys_sorted = keys_flat[order]
    owner_sorted = owner[order]
    idx = jnp.arange(n)
    starts = jnp.searchsorted(owner_sorted, jnp.arange(n_shards + 1))
    rank = idx - starts[owner_sorted]
    ok = (owner_sorted < n_shards) & (rank < capacity)
    dropped = jnp.sum((~ok) & (owner_sorted < n_shards), dtype=jnp.int64)
    # not-ok entries are routed OUT OF BOUNDS and dropped by the scatter —
    # parking them at a real bin like (0,0) would clobber a legitimate key
    row = jnp.where(ok, owner_sorted, 0)
    col = jnp.where(ok, rank, capacity)
    bins = jnp.full((n_shards, capacity), count.SENTINEL, dtype=jnp.uint64)
    bins = bins.at[row, col].set(keys_sorted, mode="drop")
    pbins = None
    if payload is not None:
        pbins = jnp.zeros((n_shards, capacity), dtype=payload.dtype)
        pbins = pbins.at[row, col].set(payload[order], mode="drop")
    return bins, pbins, order, row, col, ok, dropped


# ---------------------------------------------------------------------------
# count: data-sharded reads -> prefix-sharded per-batch RLE
# ---------------------------------------------------------------------------


# pre-exchange routing closures, stashed per step configuration for the
# scaling harness's phase probes (tools/scaling.py)
_LOCAL_ROUTE_FNS: dict = {}


def _count_local_probe(mesh, k: int, capacity: int, route_cap: int):
    """Jitted encode+collapse+route-sort WITHOUT the all_to_all — the
    scaling harness times this against the full step to attribute the
    exchange cost. For 1-device meshes (no routing) this is just the
    fused encode."""
    n = mesh.devices.size
    axis = mesh.axis_names[0]
    if n == 1:
        from ..ops import pallas_count

        def enc(reads):
            hi, lo = pallas_count.encode_canon_hilo_xla(reads, k)
            return hi.ravel()[None]

        return jax.jit(shard_map(enc, mesh=mesh, in_specs=P(axis),
                                 out_specs=P(axis), check_vma=False))
    _sharded_count_step(mesh, k, capacity, route_cap)  # registers the fn
    fn = _LOCAL_ROUTE_FNS[(mesh, k, capacity, route_cap)]

    def probe(reads):
        bins, bc, dropped = fn(reads)
        return bins[None]

    return jax.jit(shard_map(probe, mesh=mesh, in_specs=P(axis),
                             out_specs=P(axis), check_vma=False))


def sharded_count_step(mesh, k: int, capacity: int, route_cap: int | None = None):
    """(global reads (B, L) uint8, data-sharded) -> per-shard RAW routed
    keys for the shard's k-mer hash partition, as
    (keys, counts=None, n, dropped). One all_to_all per batch; everything
    else local.

    `capacity` is the per-device window count (reads_per_dev * (L-k+1));
    `route_cap` is the PER-PEER bin width — O(capacity/n), so the
    all_to_all moves n*route_cap ~= (1+slack)*capacity slots per device
    and the downstream fold width is O(batch) INDEPENDENT of device count
    (the round-2 design routed `capacity` per peer: n x oversized).
    Overflow past route_cap is counted in `dropped` (per-device i64);
    callers retry the batch with a doubled route_cap when it fires.

    Single-device meshes skip the owner-bucketing entirely and use the
    fused count kernel (pallas encode on TPU) directly."""
    if route_cap is None:
        route_cap = route_capacity(capacity, mesh.devices.size)
    return _sharded_count_step(mesh, k, capacity, route_cap)


@functools.lru_cache(maxsize=None)
def _sharded_count_step(mesh, k: int, capacity: int, route_cap: int):
    axis = mesh.axis_names[0]
    n = mesh.devices.size

    if n == 1:
        # RAW keys out, no per-batch sort: the fold sorts its concat input
        # anyway, so pre-RLE-ing the batch would pay a whole extra sort of
        # B*W keys for nothing (rle_sum over the fold's sorted concat sums
        # count-1 raw keys and table counts identically). Encode is the
        # fused pallas kernel on TPU.
        from ..ops import pallas_count

        @jax.jit
        def single(reads):
            B = reads.shape[0]
            if (jax.default_backend() == "tpu"
                    and B % pallas_count.BLK == 0):
                hi, lo = pallas_count.encode_canon_hilo(reads, k)
            else:
                hi, lo = pallas_count.encode_canon_hilo_xla(reads, k)
            keys = ((hi.astype(jnp.uint64) << jnp.uint64(32))
                    | lo.astype(jnp.uint64)).ravel()
            nn = jnp.sum(keys != count.SENTINEL, dtype=jnp.int64)
            return keys[None], nn[None]

        zero = jnp.zeros((1,), jnp.int64)

        def run(reads):
            keys, nn = single(reads)
            return keys, None, nn, zero

        return run

    def _local_route(reads):
        from ..ops import pallas_count

        B = reads.shape[0]
        if (jax.default_backend() == "tpu" and B % pallas_count.BLK == 0):
            hi, lo = pallas_count.encode_canon_hilo(reads, k)
        else:
            hi, lo = pallas_count.encode_canon_hilo_xla(reads, k)
        hi, lo = hi.ravel(), lo.ravel()
        m = hi.shape[0]
        # collapse ADJACENT duplicate k-mers before routing (homopolymer
        # and STR runs make every window of a read the same canonical
        # k-mer, and ALL copies hash to ONE peer — a per-key hotspot no
        # uniform-slack bin sizing can absorb at large n; collapsing
        # bounds one read's contribution to a peer at O(distinct), and
        # run heads carry the run length as an i32 count plane)
        same = jnp.concatenate([jnp.zeros((1,), bool),
                                (hi[1:] == hi[:-1]) & (lo[1:] == lo[:-1])])
        head = ~same
        idx = jnp.arange(m, dtype=jnp.int32)
        marks = jnp.where(head, idx, jnp.int32(m))
        nxt = jnp.concatenate([jnp.flip(jax.lax.cummin(jnp.flip(marks)))[1:],
                               jnp.full((1,), m, jnp.int32)])
        run_len = nxt - idx
        is_sent = (hi == _U32_ONES) & (lo == _U32_ONES)
        valid = head & ~is_sent
        owner = jnp.where(valid, _owner_hash_hilo(hi, lo, n), n)
        (bh, bl, bc), dropped = _route_segments(
            owner, (hi, lo, run_len), (_U32_ONES, _U32_ONES, jnp.int32(0)),
            n, route_cap)
        bins = (bh.astype(jnp.uint64) << jnp.uint64(32)) | bl.astype(jnp.uint64)
        return bins, bc, dropped

    def local(reads):
        bins, bc, dropped = _local_route(reads)
        # exchange: shard i sends bins[j] to shard j; counts ride along.
        bins = jax.lax.all_to_all(bins[None], axis, split_axis=1,
                                  concat_axis=0, tiled=False)
        cnts = jax.lax.all_to_all(bc[None], axis, split_axis=1,
                                  concat_axis=0, tiled=False)
        keys = bins.reshape(1, -1)
        cnts = cnts.reshape(1, -1)
        nn = jnp.sum(keys != count.SENTINEL, dtype=jnp.int64)
        # replicated total: host-readable on every process of a
        # multi-process mesh
        dropped = jax.lax.psum(dropped, axis)
        return keys, cnts, nn[None], dropped

    _LOCAL_ROUTE_FNS[(mesh, k, capacity, route_cap)] = _local_route

    f = jax.jit(shard_map(local, mesh=mesh, in_specs=P(axis),
                          out_specs=(P(axis), P(axis), P(axis), P()),
                          check_vma=False))

    def run(reads):
        keys, cnts, nn, dropped = f(reads)
        return keys, cnts, nn, dropped

    return run


# ---------------------------------------------------------------------------
# local-aggregate count: defer EVERYTHING to the flush (combiner idiom)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def local_count_step(mesh, k: int):
    """Encode-only count step: each device's window keys STAY LOCAL — no
    per-batch collective at all. The reduction is deferred to the flush,
    which locally sorts + RLEs each device's pending and routes only the
    UNIQUE (key, count) pairs (sharded_local_flush_step). This is the
    combiner idiom: the all_to_all moves O(unique) instead of O(windows),
    and per-batch device work is IDENTICAL to the single-chip path.

    Returns (keys (n, W) u64 P(axis)-sharded raw count-1 keys, n_valid)."""
    axis = mesh.axis_names[0]

    def local(reads):
        from ..ops import pallas_count

        B = reads.shape[0]
        if (jax.default_backend() == "tpu" and B % pallas_count.BLK == 0):
            hi, lo = pallas_count.encode_canon_hilo(reads, k)
        else:
            hi, lo = pallas_count.encode_canon_hilo_xla(reads, k)
        keys = ((hi.astype(jnp.uint64) << jnp.uint64(32))
                | lo.astype(jnp.uint64)).ravel()
        nn = jnp.sum(keys != count.SENTINEL, dtype=jnp.int64)
        return keys[None], nn[None]

    return jax.jit(shard_map(local, mesh=mesh, in_specs=P(axis),
                             out_specs=(P(axis), P(axis)), check_vma=False))


def make_splitters(keys_arr, n_shards: int, sample: int = 1 << 16):
    """Range-partition splitters from one — or a list of — (sharded or
    host) key arrays.

    Returns a host (n_shards-1,) u64 array of quantile boundaries — key k
    belongs to shard searchsorted(splitters, k, side='right'). Computed
    from a systematic sample, so the partition is balanced for the ACTUAL
    key distribution (canonical k-mers are heavily skewed low — a naive
    top-bit partition would load shard 0 with most of the table).
    Passing several spaced batches matters for coordinate-sorted BAM
    input: a single batch covers one genomic locality whose quantiles can
    differ from the genome-wide distribution, skewing shard load for the
    whole run. Deterministic given the data; different batch sizes or
    device counts change placement only, never table content."""
    arrs = (list(keys_arr) if isinstance(keys_arr, (list, tuple))
            else [keys_arr])
    per = max(1, sample // max(1, len(arrs)))
    pools = []
    for a in arrs:
        stride = max(1, a.shape[-1] // max(1, per))
        a = a[..., ::stride]
        if (hasattr(a, "is_fully_addressable")
                and not a.is_fully_addressable):
            # multi-process mesh: subsample per shard on device, then
            # gather the small sample to every process
            from jax.experimental import multihost_utils

            a = multihost_utils.process_allgather(a, tiled=True)
        pools.append(np.asarray(a).ravel())
    ks = np.concatenate(pools)
    ks = ks[ks != count.SENTINEL]
    if len(ks) == 0:
        return np.linspace(0, float(count.SENTINEL), n_shards + 1,
                           dtype=np.float64)[1:-1].astype(np.uint64)
    m = min(sample, len(ks))
    idx = (np.arange(m, dtype=np.int64) * len(ks)) // m
    pool = np.sort(ks[idx])
    q = (np.arange(1, n_shards, dtype=np.int64) * len(pool)) // n_shards
    return pool[q].astype(np.uint64)


def _owners_by_splitters(keys, splitters, n_shards: int):
    """Owner shard of u64 keys under a range partition; SENTINEL keys get
    owner == n_shards (dropped by routing)."""
    owner = jnp.searchsorted(splitters, keys, side="right").astype(jnp.int32)
    return jnp.where(keys == count.SENTINEL, jnp.int32(n_shards), owner)


@functools.lru_cache(maxsize=None)
def _local_partial_step(mesh, part_cap: int):
    """Per-device local aggregation: sort the device's raw pending (2 u32
    lanes — identical work to the single-chip fold) and RLE-compact to
    sorted-unique (key, count) partials of width part_cap. No collective.
    Returns (keys (n, part_cap), counts, max unique per device)."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size

    def local(pending):
        pk = pending.reshape(-1)
        ph = (pk >> jnp.uint64(32)).astype(jnp.uint32)
        plo = pk.astype(jnp.uint32)
        ph, plo = jax.lax.sort((ph, plo), num_keys=2)
        uh, ul, uc, nu = _rle_compact_hilo(ph, plo, None, part_cap)
        keys = (uh.astype(jnp.uint64) << jnp.uint64(32)) | ul.astype(jnp.uint64)
        if n > 1:
            nu = jnp.max(jax.lax.all_gather(nu, axis))
        return keys[None], uc[None], nu

    return jax.jit(shard_map(local, mesh=mesh, in_specs=P(axis),
                             out_specs=(P(axis), P(axis), P()),
                             check_vma=False))


@functools.lru_cache(maxsize=None)
def _route_partials_step(mesh, route_cap: int):
    """Cut each device's ALREADY-SORTED unique partials into per-shard
    segments at the range splitters (searchsorted — routing needs NO sort
    under a range partition) and exchange (key, count) pairs. The
    all_to_all moves O(unique) slots, not O(windows) — the combiner
    payoff. Returns per-shard received (keys (n*route_cap,), counts,
    dropped (replicated sum))."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size

    def local(pkeys, pcnts, splitters):
        keys = pkeys.reshape(-1)
        uc = pcnts.reshape(-1)
        # segment bounds under the range partition: the partial is sorted,
        # so each shard's keys are a contiguous slice. side="left" pairs
        # with _owners_by_splitters's side="right": a key EQUAL to
        # splitters[i-1] belongs to shard i
        bounds = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            searchsorted_u64(keys, splitters),
            searchsorted_u64(keys, jnp.full((1,), count.SENTINEL,
                                            jnp.uint64)),
        ]).astype(jnp.int32)
        # belt-and-braces for the completely-full-partial case (no
        # sentinel slots): bounds can never legitimately exceed the
        # partial's width
        bounds = jnp.minimum(bounds, jnp.int32(keys.shape[0]))
        seg_len = bounds[1:] - bounds[:-1]
        dropped = jnp.sum(
            jnp.maximum(seg_len - route_cap, 0).astype(jnp.int64))
        col = jax.lax.broadcasted_iota(jnp.int32, (n, route_cap), 1)
        in_seg = col < seg_len[:, None]
        kpad = jnp.concatenate(
            [keys, jnp.full((route_cap,), count.SENTINEL, jnp.uint64)])
        cpad = jnp.concatenate([uc, jnp.zeros((route_cap,), jnp.int32)])
        krows = jnp.stack([jax.lax.dynamic_slice(kpad, (bounds[q],),
                                                 (route_cap,))
                           for q in range(n)])
        crows = jnp.stack([jax.lax.dynamic_slice(cpad, (bounds[q],),
                                                 (route_cap,))
                           for q in range(n)])
        krows = jnp.where(in_seg, krows, count.SENTINEL)
        crows = jnp.where(in_seg, crows, 0)
        if n > 1:
            krows = jax.lax.all_to_all(krows[None], axis, split_axis=1,
                                       concat_axis=0, tiled=False)
            crows = jax.lax.all_to_all(crows[None], axis, split_axis=1,
                                       concat_axis=0, tiled=False)
            dropped = jax.lax.psum(dropped, axis)
        else:
            krows, crows = krows[None], crows[None]
        return krows.reshape(1, -1), crows.reshape(1, -1), dropped

    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P()), check_vma=False))


# ---------------------------------------------------------------------------
# fold: LSM-merge a batch's sharded RLE into the running sharded table
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def sharded_fold_step(mesh, table_cap: int, raw: bool = False):
    """Local merge of the running per-shard table (S, table_cap) with a
    buffer of per-shard batch keys -> new (S, table_cap) table + per-shard
    unique count (for overflow detection). Collective-free: both sides are
    already prefix-sharded identically.

    raw=True: batch keys are RAW count-1 k-mers (the count step's output —
    it defers all reduction here). The pending side then sorts with NO
    payload (a 2-operand u32-plane sort, ~1/3 less comparator traffic than
    dragging a count lane through) and its counts fall out as run lengths.

    Fold cost structure (replaces the old two (cap+P)-wide 3-op i64
    sorts):
      1. sort pending (P wide; 2 u32 lanes when raw)   — dominant
      2. RLE + sort-compact pending to table_cap (3 lanes, i32 sums)
      3. sort table||compacted-pending (2*table_cap, 3 lanes) — small
      4. RLE + sort-compact to table_cap
    On the bench shapes (P=48M, cap=4M) that is ~2.2x less sorted lane
    traffic (5 lanes over P + 6 over 2cap, vs 8 lanes over cap+P twice).
    Overflow stays lossless: n_unique reports max(pending unique, merged
    unique) BEFORE truncation, and ShardedKmerTable.flush grows + retries
    on overflow."""
    axis = mesh.axis_names[0]

    axis_name = axis
    n_shards = mesh.devices.size

    def _shard_max(v):
        """Replicated max over shards: host-readable on EVERY process of
        a multi-process mesh. all_gather+max rather than pmax — the axon
        TPU backend only lowers Sum all-reduces — and skipped entirely
        on one-device meshes."""
        if n_shards == 1:
            return v
        return jnp.max(jax.lax.all_gather(v, axis_name))

    def _merge_with_table(tk, tc, ph, plo, pc, pn):
        # i32 count lanes through the sorts (a per-sample k-mer count
        # beyond 2^31 would be >2% of all windows of a 100Gbp run — far
        # past MaxHashDepth's ~1e5 cap); table storage stays i64 and the
        # narrow saturates instead of wrapping, so even a pathological
        # count can never go negative and get dropped by apply_lower_count
        th = (tk[0] >> jnp.uint64(32)).astype(jnp.uint32)
        tl = tk[0].astype(jnp.uint32)
        mh = jnp.concatenate([th, ph])
        ml = jnp.concatenate([tl, plo])
        tc32 = jnp.minimum(tc[0], jnp.int64(2**31 - 1)).astype(jnp.int32)
        mc = jnp.concatenate([tc32, pc])
        mh, ml, mc = jax.lax.sort((mh, ml, mc), num_keys=2)
        oh, ol, oc, mn = _rle_compact_hilo(mh, ml, mc, table_cap)
        keys = (oh.astype(jnp.uint64) << jnp.uint64(32)) | ol.astype(jnp.uint64)
        nn = _shard_max(jnp.maximum(mn, pn))
        return keys[None], oc.astype(jnp.int64)[None], nn

    if raw:
        def local(tk, tc, bk):
            bh = (bk[0] >> jnp.uint64(32)).astype(jnp.uint32)
            bl = bk[0].astype(jnp.uint32)
            bh, bl = jax.lax.sort((bh, bl), num_keys=2)
            ph, plo, pc, pn = _rle_compact_hilo(bh, bl, None, table_cap)
            return _merge_with_table(tk, tc, ph, plo, pc, pn)

        f = shard_map(local, mesh=mesh,
                      in_specs=(P(axis), P(axis), P(axis)),
                      out_specs=(P(axis), P(axis), P()), check_vma=False)
    else:
        def local(tk, tc, bk, bc):
            bh = (bk[0] >> jnp.uint64(32)).astype(jnp.uint32)
            bl = bk[0].astype(jnp.uint32)
            bc32 = bc[0].astype(jnp.int32)  # per-buffer counts fit i32
            bh, bl, bc32 = jax.lax.sort((bh, bl, bc32), num_keys=2)
            ph, plo, pc, pn = _rle_compact_hilo(bh, bl, bc32, table_cap)
            return _merge_with_table(tk, tc, ph, plo, pc, pn)

        f = shard_map(local, mesh=mesh,
                      in_specs=(P(axis), P(axis), P(axis), P(axis)),
                      out_specs=(P(axis), P(axis), P()), check_vma=False)
    return jax.jit(f)


# ---------------------------------------------------------------------------
# subtract: N prefix-sharded tables -> mutant HashList (local per shard)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def sharded_subtract_step(mesh, n_samples: int):
    """'Present in exactly ONE sample with count >= merge_min' over N
    prefix-sharded tables, fused with the subject count-range filter.

    Reference semantics: modified-merge (merge_files.cc:147-153) emits
    k-mers occurring in exactly one input file with count >= 5; the
    downstream `jellyfish query` vs the subject (CheckJellyHashList.sh:12)
    then keeps only subject k-mers with count in [min_cov, max_depth].
    Both steps are local per shard because every sample's table shares the
    prefix partition — the payoff of prefix sharding: the trio subtract
    needs ZERO collectives.

    Input: lists of keys/counts arrays, each (S, cap_i), sample 0 =
    subject. Output: (S, cap_0) mutant keys (SENTINEL-padded, sorted per
    shard) and their subject counts. Requires min_cov >= 1 (always true
    in the pipeline: the model cutoff is >= 2 and -m overrides are
    positive) — with min_cov = 0 the reference merge would also emit
    control-only singletons, which this fused form never materializes."""
    axis = mesh.axis_names[0]

    def local(keys_list, cnts_list, merge_min, min_cov, max_depth):
        # The fused reference semantics — "k-mer occurs in exactly ONE
        # input file with count >= merge_min" (merge_files.cc:147-153)
        # followed by the subject count-range pull
        # (CheckJellyHashList.sh:12, min_cov >= 1) — reduce to: SUBJECT
        # keys, absent from EVERY control, with subject count in
        # [max(merge_min, min_cov), max_depth]. (Control-only singletons
        # that the reference merge also prints die at the subject pull —
        # their subject count is 0 < min_cov.) This formulation is a
        # per-control sorted MEMBERSHIP test (searchsorted + gather) over
        # the subject's shard slice — no concat, no re-sort of tables
        # that are already sorted. The previous 3-table concat+sort
        # tripled transient HBM and OOM-crashed the worker at the
        # whole-genome SCALE run sizes (3 x 50M unique per shard).
        sk, sc = keys_list[0][0], cnts_list[0][0]
        cap = sk.shape[0]
        sh_ = (sk >> jnp.uint64(32)).astype(jnp.uint32)
        sl_ = sk.astype(jnp.uint32)
        keep = ((sk != count.SENTINEL) & (sc > 0)
                & (sc >= merge_min) & (sc >= min_cov) & (sc <= max_depth))
        for k_, c_ in zip(keys_list[1:], cnts_list[1:]):
            # membership via a tagged sort-merge: concat control(tag 0) +
            # subject(tag 1) u32 planes, sort by (h, l, tag) — a subject
            # key's LEFT neighbor is its control twin iff present (both
            # tables are sorted-unique) — then compact the subject
            # entries (unique, ascending) back out with the presence
            # flag as payload. Sorts + the streaming compaction are the
            # proven-fast primitives; per-element binary search is not:
            # random gathers measure ~0.5 us/element on v5e, which at
            # 67M queries x 54 bisection rounds is effectively a hang.
            ck = jnp.where(c_[0] > 0, k_[0], count.SENTINEL)
            h = jnp.concatenate([(ck >> jnp.uint64(32)).astype(jnp.uint32),
                                 sh_])
            l = jnp.concatenate([ck.astype(jnp.uint32), sl_])
            # each sample's table is independently shrink()-ed, so the
            # control's capacity routinely differs from the subject's —
            # the tag plane must use the CONTROL's own width or lax.sort
            # rejects the mismatched operand shapes
            tag = jnp.concatenate([jnp.zeros(k_[0].shape[0], jnp.int32),
                                   jnp.ones(cap, jnp.int32)])
            h, l, tag = jax.lax.sort((h, l, tag), num_keys=3)
            prev_same = jnp.concatenate([
                jnp.zeros((1,), bool),
                (h[1:] == h[:-1]) & (l[1:] == l[:-1])])
            present = (tag == 1) & prev_same
            is_subj = (tag == 1) & ~((h == _U32_ONES) & (l == _U32_ONES))
            uh = jnp.where(is_subj, h, _U32_ONES)
            ul = jnp.where(is_subj, l, _U32_ONES)
            flag = jnp.where(is_subj, present.astype(jnp.int32), 0)
            # unique ascending keys => run sums == the flag itself, and
            # the compacted order equals the subject table's valid prefix
            fh, fl, fflag, _n = _rle_compact_hilo(uh, ul, flag, cap)
            keep = keep & (fflag == 0)
        mh = jnp.where(keep, sh_, _U32_ONES)
        ml = jnp.where(keep, sl_, _U32_ONES)
        ms = jnp.where(keep, jnp.minimum(sc, jnp.int64(2**31 - 1))
                       .astype(jnp.int32), 0)
        mh, ml, ms = jax.lax.sort((mh, ml, ms), num_keys=2)
        mut = (mh.astype(jnp.uint64) << jnp.uint64(32)) | ml.astype(jnp.uint64)
        return mut[None], ms.astype(jnp.int64)[None]

    f = shard_map(
        local, mesh=mesh,
        in_specs=([P(axis)] * n_samples, [P(axis)] * n_samples,
                  P(), P(), P()),
        out_specs=(P(axis), P(axis)), check_vma=False)
    return jax.jit(f)


# ---------------------------------------------------------------------------
# query: genotyping lookups routed to owner shards (all_to_all round trip)
# ---------------------------------------------------------------------------


def sharded_query_step(mesh, k: int, qcap: int, route_cap: int | None = None,
                       by_splitters: bool = False):
    """Point-lookup of data-sharded canonical k-mers against a sharded
    table: bucket by owner, all_to_all, local searchsorted, all_to_all
    back, un-route. Replaces `jellyfish query` pulls
    (Overlap.shorter.sh:265-303) at pod scale.

    queries: (S, Q) u64 data-sharded; table keys/counts (S, cap) sharded
    by hash (by_splitters=False) or by range splitters (True — the jitted
    fn then takes a trailing (n-1,) u64 splitters arg and MUST be given
    the same splitters the table was built with). qcap = per-device query
    count Q. route_cap is the PER-PEER bin width, O(qcap/n) (round 2
    routed qcap per peer — n x oversized). Returns ((S, Q) i64 counts (0
    when absent), (S,) dropped); dropped > 0 means some queries never
    reached their owner — the caller must retry with a doubled route_cap
    for correct counts."""
    if route_cap is None:
        route_cap = route_capacity(qcap, mesh.devices.size)
    return _sharded_query_step(mesh, k, qcap, route_cap, by_splitters)


@functools.lru_cache(maxsize=None)
def _sharded_query_step(mesh, k: int, qcap: int, route_cap: int,
                        by_splitters: bool = False):
    axis = mesh.axis_names[0]
    n = mesh.devices.size

    def local(queries, tk, tc, *split):
        q = queries.reshape(-1)
        if by_splitters:
            owner = _owners_by_splitters(q, split[0], n)
        else:
            owner = _owners(q, n, k)
        bins, _, order, row, col, ok, dropped = _bucket_by_owner(
            q, owner, n, route_cap)
        if n > 1:
            routed = jax.lax.all_to_all(bins[None], axis, split_axis=1,
                                        concat_axis=0, tiled=False)
        else:
            routed = bins[None]
        rq = routed.reshape(n, route_cap)
        keys, cnts = tk[0], tc[0]
        idx = searchsorted_u64(keys, rq)
        idx_c = jnp.minimum(idx, keys.shape[0] - 1)
        ans = jnp.where(keys[idx_c] == rq, cnts[idx_c], 0)
        if n > 1:
            back = jax.lax.all_to_all(ans[None], axis, split_axis=1,
                                      concat_axis=0, tiled=False)
        else:
            back = ans[None]
        back = back.reshape(n, route_cap)
        got_sorted = jnp.where(ok, back[row, col], 0)
        out = jnp.zeros(q.shape, dtype=back.dtype).at[order].set(got_sorted)
        # local block is (1, Q); the shard axis is already the leading
        # queries dim — no extra wrap, global result is (S, Q)
        return (out.reshape(queries.shape),
                jax.lax.psum(dropped, axis))

    in_specs = (P(axis), P(axis), P(axis)) + ((P(),) if by_splitters else ())
    f = shard_map(local, mesh=mesh, in_specs=in_specs,
                  out_specs=(P(axis), P()), check_vma=False)
    return jax.jit(f)


def sharded_query_multi(mesh, k: int, qcap: int, n_tables: int,
                        route_cap: int | None = None,
                        by_splitters: bool = False):
    """One routed dispatch answering the SAME query set against N sharded
    tables — the genotyping-pull hot path (Overlap.shorter.sh:265-303
    backgrounds one `jellyfish query` per sample; here route/return/
    un-route costs amortize over all samples, and the per-sample work is
    only the local bisection).

    Routing is SORT-based, not scatter-based: queries sort by (owner,
    key) with their index as payload, segments cut by native-i32
    searchsorted, rows gathered with dynamic slices — no variable-index
    scatters (XLA lowers large scatters near-serially on TPU, measured
    ~9M el/s; multi-lane sorts are the proven-fast primitive). The
    un-route is one more payload sort by original index.

    queries: (S, qcap) u64 data-sharded. keys_list/cnts_list: per-sample
    (S, cap_i) sharded planes (capacities may differ). Returns
    ((n_tables, S, qcap) i32 counts, dropped). Counts clamp to i32 —
    genotype pulls cap at ~1e5 (Overlap.shorter.sh:20). dropped > 0 =>
    retry with doubled route_cap."""
    if route_cap is None:
        route_cap = route_capacity(qcap, mesh.devices.size)
    return _sharded_query_multi(mesh, k, qcap, n_tables, route_cap,
                                by_splitters)


@functools.lru_cache(maxsize=None)
def _sharded_query_multi(mesh, k: int, qcap: int, n_tables: int,
                         route_cap: int, by_splitters: bool,
                         upto: str = "full"):
    """upto: 'full' (device-side unroute, (T, S, qcap) in query order),
    'permuted' (skip the final device sort: returns (T+1, S, qcap) where
    plane 0 is the per-device permutation idx_s — the caller unpermutes
    with one vectorized host copy, cheaper than a device payload sort),
    or the scaling harness's phase probes — 'route' stops after the
    outbound exchange, 'answer' after the local bisections (cumulative
    prefixes of the SAME traced code, so phase attribution times exactly
    what production runs)."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size

    def local(queries, keys_list, cnts_list, *split):
        q = queries.reshape(-1)
        if by_splitters:
            owner = _owners_by_splitters(q, split[0], n)
        else:
            owner = _owners(q, n, k)
        qh = (q >> jnp.uint64(32)).astype(jnp.uint32)
        ql = q.astype(jnp.uint32)
        idx = jnp.arange(qcap, dtype=jnp.int32)
        # deterministic 3-key sort (owner, key) with the original index as
        # payload; SENTINEL queries carry owner == n and sort to the tail
        owner_s, qh_s, ql_s, idx_s = jax.lax.sort(
            (owner, qh, ql, idx), num_keys=3)
        starts = jnp.searchsorted(
            owner_s, jnp.arange(n + 1, dtype=jnp.int32)).astype(jnp.int32)
        seg_len = starts[1:] - starts[:-1]
        dropped = jnp.sum(
            jnp.maximum(seg_len - route_cap, 0).astype(jnp.int64))
        hpad = jnp.concatenate([qh_s, jnp.full((route_cap,), _U32_ONES)])
        lpad = jnp.concatenate([ql_s, jnp.full((route_cap,), _U32_ONES)])
        col = jax.lax.broadcasted_iota(jnp.int32, (n, route_cap), 1)
        in_seg = col < seg_len[:, None]
        hrows = jnp.stack([jax.lax.dynamic_slice(hpad, (starts[s],),
                                                 (route_cap,))
                           for s in range(n)])
        lrows = jnp.stack([jax.lax.dynamic_slice(lpad, (starts[s],),
                                                 (route_cap,))
                           for s in range(n)])
        rq = jnp.where(in_seg,
                       (hrows.astype(jnp.uint64) << jnp.uint64(32))
                       | lrows.astype(jnp.uint64),
                       count.SENTINEL)
        if n > 1:
            routed = jax.lax.all_to_all(rq[None], axis, split_axis=1,
                                        concat_axis=0, tiled=False)
        else:
            routed = rq[None]
        rqf = routed.reshape(-1)  # (n*route_cap,) queries owned here
        if upto == "route":
            return rqf[None], dropped
        answers = []
        for keys, cnts in zip(keys_list, cnts_list):
            tkeys, tcnts = keys[0], cnts[0]
            ix = searchsorted_u64(tkeys, rqf)
            ixc = jnp.minimum(ix, tkeys.shape[0] - 1)
            hit = tkeys[ixc] == rqf
            ans = jnp.where(hit,
                            jnp.minimum(tcnts[ixc],
                                        jnp.int64(2**31 - 1)), 0)
            answers.append(ans.astype(jnp.int32).reshape(n, route_cap))
        ast = jnp.stack(answers, axis=1)  # (n_src, T, route_cap)
        if upto == "answer":
            return ast.reshape(1, -1), dropped
        if n > 1:
            back = jax.lax.all_to_all(ast[None], axis, split_axis=1,
                                      concat_axis=0, tiled=False)
            dropped = jax.lax.psum(dropped, axis)
        else:
            back = ast[None]
        back = back.reshape(n, n_tables, route_cap)
        # un-route: sorted position j sat at (segment owner_s[j], column
        # j - starts[owner_s[j]]); gather, then ONE payload sort by the
        # original index restores query order for every table at once
        owner_c = jnp.minimum(owner_s, n - 1)
        colq = idx - starts[owner_c]
        valid = (owner_s < n) & (colq < route_cap) & (colq >= 0)
        flatpos = jnp.where(valid, owner_c * route_cap
                            + jnp.minimum(colq, route_cap - 1), 0)
        lanes = [jnp.where(valid, back[:, t, :].reshape(-1)[flatpos], 0)
                 for t in range(n_tables)]
        if upto == "permuted":
            out = jnp.stack([idx_s, *lanes], axis=0)  # (T+1, qcap)
            return out[:, None, :], dropped
        unsorted = jax.lax.sort((idx_s, *lanes), num_keys=1)
        out = jnp.stack(unsorted[1:], axis=0)  # (T, qcap)
        return out[:, None, :], dropped

    in_specs = (P(axis), [P(axis)] * n_tables, [P(axis)] * n_tables) + (
        (P(),) if by_splitters else ())
    f = shard_map(local, mesh=mesh, in_specs=in_specs,
                  out_specs=(P(None, axis), P()), check_vma=False)
    return jax.jit(f)


# ---------------------------------------------------------------------------
# filter: data-parallel reads, replicated mutant table
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def sharded_filter_step(mesh, k: int, min_q: int, threshold: int):
    """Data-parallel read filter with a replicated mutant table
    (HashLists are small — tens to thousands of k-mers — so replication
    beats routing every read window)."""
    axis = mesh.axis_names[0]

    def local(reads, quals, lens, table):
        from ..ops import filter as rfilter

        hits = rfilter.window_hits(reads, quals, lens, table, k, min_q)
        return hits >= threshold

    f = shard_map(local, mesh=mesh,
                  in_specs=(P(axis), P(axis), P(axis), P()),
                  out_specs=P(axis), check_vma=False)
    return jax.jit(f)


# ---------------------------------------------------------------------------
# ShardedKmerTable: device-resident per-sample table over the mesh
# ---------------------------------------------------------------------------


class ShardedKmerTable:
    """A sample's count table living ON DEVICE, prefix-sharded over the
    mesh: keys/counts are (n_shards, capacity) arrays sharded on axis 0,
    each row sorted unique with SENTINEL padding.

    The distributed equivalent of a `.Jhash`: built by folding per-batch
    sharded count results (sharded_count_step -> sharded_fold_step), it
    stays resident across the count -> subtract -> query stages so no
    table bytes ever cross the host boundary until the (tiny) HashList is
    materialized."""

    def __init__(self, mesh, k: int, capacity: int,
                 pending_budget: int = 96 << 20, splitters=None):
        self.mesh = mesh
        self.k = k
        self.capacity = capacity
        axis = mesh.axis_names[0]
        n = mesh.devices.size
        self._sharding = jax.sharding.NamedSharding(mesh, P(axis))
        self.keys = jax.device_put(
            jnp.full((n, capacity), count.SENTINEL, jnp.uint64),
            self._sharding)
        self.counts = jax.device_put(
            jnp.zeros((n, capacity), jnp.int64), self._sharding)
        # replicated scalar (max over shards): host-readable on every
        # process of a multi-process mesh
        self.n_unique = jnp.zeros((), jnp.int64)
        # fold buffering: batches accumulate device-side until the pending
        # per-shard element count reaches the budget, then fold once. The
        # fold's two O(cap + pending) sorts amortize over the buffered
        # batches; the table contents are batch-boundary independent either
        # way (sorted-unique RLE), so determinism is unaffected.
        self._pending: list = []
        self._pending_els = 0
        self._pending_budget = pending_budget
        # range-partition splitters ((n-1,) u64 host array) enable the
        # LOCAL-AGGREGATE flush: batches stay device-local (no per-batch
        # collective), and the flush routes only the locally-unique
        # (key, count) pairs — the combiner idiom. All tables that meet in
        # a subtract must share the same splitters.
        self.splitters = splitters
        # out-of-HBM guard: when a fold would need to grow past
        # max_capacity and an overflow_spill callback is installed, the
        # COMMITTED table is spilled (callback's job: to_flat + reset)
        # and the fold retries against the emptied table — the LSM
        # run-spill regime (jellyfish --disk, count_main.cc:318-338)
        self.max_capacity: int | None = None
        self.overflow_spill = None
        self._split_dev = None
        self._part_cap = None
        self._flush_route_cap = None
        # observability: organic resize/retry events (asserted by the
        # multichip dryrun; jellyfish's cooperative-resize analog)
        self.stats = {"grows": 0, "flushes": 0, "route_retries": 0}

    def fold_batch(self, batch_keys, batch_counts=None):
        """Queue one sharded batch — RAW count-1 keys from the count step
        (batch_counts=None) or pre-RLE'd (keys, counts) — folding when the
        buffer budget fills.

        The fold reports the true unique count BEFORE truncation, so
        overflow is detected losslessly: the fold is retried after growing
        the table (jellyfish's cooperative resize role,
        hash_counter.hpp:52-56 — but deterministic: the retry produces the
        identical table a bigger initial capacity would have)."""
        self._pending.append((batch_keys, batch_counts))
        self._pending_els += batch_keys.shape[-1]
        if self._pending_els >= self._pending_budget:
            self.flush()

    def flush(self):
        """Fold every pending batch into the table. With fixed-size
        batches only two fold shapes ever compile: the full buffer and the
        final partial one."""
        if not self._pending:
            return
        if (self.splitters is not None and self.mesh.devices.size > 1
                and all(c is None for _, c in self._pending)):
            return self._flush_local_agg()
        bk = jnp.concatenate([k for k, _ in self._pending], axis=-1)
        raw = all(c is None for _, c in self._pending)
        if raw:
            bc = None
        else:
            bc = jnp.concatenate(
                [(jnp.ones(k.shape, jnp.int32) if c is None
                  else c.astype(jnp.int32))
                 for k, c in self._pending], axis=-1)
        self._pending = []
        self._pending_els = 0
        while True:
            fold = sharded_fold_step(self.mesh, self.capacity, raw)
            if raw:
                nk, nc, nn = fold(self.keys, self.counts, bk)
            else:
                nk, nc, nn = fold(self.keys, self.counts, bk, bc)
            need = int(np.asarray(nn).max())
            if need <= self.capacity:
                self.keys, self.counts, self.n_unique = nk, nc, nn
                return
            if (self.overflow_spill is not None and self.max_capacity
                    and need > self.max_capacity):
                # growing would exceed the fold's HBM budget: spill the
                # committed table as a sorted run, reset empty, retry.
                # Progress guard: if the table is ALREADY empty the
                # pending alone exceeds the budget — installers must
                # clamp the pending trigger below max_capacity
                if int(np.asarray(self.n_unique).max()) == 0:
                    raise RuntimeError(
                        f"pending unique ({need}) exceeds max_capacity "
                        f"({self.max_capacity}); lower pending_budget")
                self.overflow_spill(self)
                continue
            # the fold reports the true per-shard unique count BEFORE
            # truncation, so grow straight to a capacity that fits (one
            # retry) instead of doubling once per retry (each doubling
            # would compile a fresh fold shape)
            self._grow(need)

    def _flush_local_agg(self):
        """Local-aggregate flush: sort+RLE each device's own pending
        (identical work to the single-chip fold), cut the sorted partials
        at the range splitters (no routing sort), all_to_all only the
        unique (key, count) pairs, then fold the received runs into the
        authoritative range-partitioned table. Lossless: partial-width and
        route-bin overflows are detected and retried wider."""
        n = self.mesh.devices.size
        self.stats["flushes"] += 1
        bk = jnp.concatenate([k for k, _ in self._pending], axis=-1)
        self._pending = []
        self._pending_els = 0
        per_dev = bk.shape[-1]
        if self._split_dev is None:
            rep = jax.sharding.NamedSharding(self.mesh, P())
            self._split_dev = jax.device_put(
                jnp.asarray(self.splitters, jnp.uint64), rep)
        # phase 1: local partials (no collective); the partial can never
        # exceed the pending width, so one shape per pending size
        part_cap = -(-per_dev // 128) * 128
        pstep = _local_partial_step(self.mesh, part_cap)
        pk, pc, nu = pstep(bk)
        # phase 2: route O(unique) slots; per-peer width sized from the
        # OBSERVED unique count (balanced splitters => ~nu/n per peer),
        # grown losslessly on overflow
        nu_i = int(np.asarray(nu).max())
        want_cap = route_capacity(max(nu_i, 128), n)
        if self._flush_route_cap is None or self._flush_route_cap < want_cap:
            self._flush_route_cap = want_cap
        while True:
            rstep = _route_partials_step(self.mesh, self._flush_route_cap)
            rk, rc, dropped = rstep(pk, pc, self._split_dev)
            if int(np.asarray(dropped).sum()) == 0:
                break
            self._flush_route_cap *= 2
            self.stats["route_retries"] += 1
        while True:
            fold = sharded_fold_step(self.mesh, self.capacity, False)
            nk, nc, nn = fold(self.keys, self.counts, rk, rc)
            need = int(np.asarray(nn).max())
            if need <= self.capacity:
                self.keys, self.counts, self.n_unique = nk, nc, nn
                return
            if (self.overflow_spill is not None and self.max_capacity
                    and need > self.max_capacity):
                if int(np.asarray(self.n_unique).max()) == 0:
                    raise RuntimeError(
                        f"pending unique ({need}) exceeds max_capacity "
                        f"({self.max_capacity}); lower pending_budget")
                self.overflow_spill(self)
                continue
            self._grow(need)

    def _grow(self, need: int | None = None):
        """Grow per-shard capacity in place (SENTINEL/zero padding) to at
        least `need` (lane-aligned), minimum doubling."""
        self.stats["grows"] += 1
        old = self.capacity
        target = max(old * 2, 1 << max(1, int(need or 1) - 1).bit_length())
        self.capacity = target
        pad = target - old
        axis = self.mesh.axis_names[0]

        def local(tk, tc):
            pk = jnp.full((1, pad), count.SENTINEL, jnp.uint64)
            pc = jnp.zeros((1, pad), jnp.int64)
            return (jnp.concatenate([tk, pk], axis=1),
                    jnp.concatenate([tc, pc], axis=1))

        f = jax.jit(shard_map(local, mesh=self.mesh,
                              in_specs=(P(axis), P(axis)),
                              out_specs=(P(axis), P(axis)),
                              check_vma=False))
        self.keys, self.counts = f(self.keys, self.counts)

    def shrink(self):
        """Shrink per-shard capacity to the smallest lane-aligned power of
        two holding the current unique count. The whole-genome budget
        story: counting holds every error k-mer until the -L floor drops
        them, so the table during counting is ~2x its final size — without
        a shrink, the subtract stage's 3-sample concat would carry all
        that dead padding through HBM (jellyfish's --disk counterpart
        frees it by writing sorted runs; count_main.cc:318-338)."""
        self.flush()
        need = int(np.asarray(self.n_unique).max())
        target = max(128, 1 << max(7, int(need - 1).bit_length()))
        if target >= self.capacity:
            return
        axis = self.mesh.axis_names[0]
        cap = target

        def local(tk, tc):
            return tk[:, :cap], tc[:, :cap]

        f = jax.jit(shard_map(local, mesh=self.mesh,
                              in_specs=(P(axis), P(axis)),
                              out_specs=(P(axis), P(axis)),
                              check_vma=False))
        self.keys, self.counts = f(self.keys, self.counts)
        self.capacity = cap

    def overflowed(self) -> bool:
        """True if any shard's unique-key count hit capacity (keys beyond
        capacity are truncated — caller must rebuild with a larger cap)."""
        self.flush()
        return bool(np.asarray(self.n_unique).max() > self.capacity)

    def apply_lower_count(self, lower: int):
        """jellyfish `count -L` floor (count_main.cc:320-330): drop k-mers
        with final count < lower. Local per shard."""
        self.flush()
        if lower <= 1:
            return
        axis = self.mesh.axis_names[0]

        def local(tk, tc):
            keep = tc[0] >= lower
            uk = jnp.where(keep, tk[0], count.SENTINEL)
            us = jnp.where(keep, tc[0], 0)
            uk, us = _sort_pairs(uk, us)
            nn = keep.sum(dtype=jnp.int64)
            if self.mesh.devices.size > 1:  # axon lowers only Sum
                nn = jnp.max(jax.lax.all_gather(nn, axis))
            return uk[None], us[None], nn

        f = jax.jit(shard_map(local, mesh=self.mesh,
                              in_specs=(P(axis), P(axis)),
                              out_specs=(P(axis), P(axis), P()),
                              check_vma=False))
        self.keys, self.counts, self.n_unique = f(self.keys, self.counts)

    def to_host(self) -> "count.KmerTable":
        """Gather to a host KmerTable (sorted unique across shards —
        prefix partitions are disjoint and ordered by owner bits)."""
        self.flush()
        keys = np.asarray(self.keys).ravel()
        cnts = np.asarray(self.counts).ravel()
        # count > 0 also drops the Pallas compaction's zero-count dummy
        # duplicates (pallas_fold.py)
        mask = (keys != count.SENTINEL) & (cnts > 0)
        keys, cnts = keys[mask], cnts[mask]
        order = np.argsort(keys)  # owner bits aren't the topmost u64 bits
        return count.KmerTable(self.k, keys[order], cnts[order])

    def to_flat(self, path: str, chunk: int = 1 << 25):
        """Spill the device table to a flat sorted file (the
        KmerTable.save_flat layout) with O(chunk) host memory: chunked
        d2h slices, sentinel/zero-count entries masked per chunk, keys
        and counts sections written through two cursors into one file.

        The whole-genome regime: a human-scale sample's table (~0.5G
        unique k-mers x 16 B) doesn't leave room for 3 samples in one
        chip's HBM — counting spills each finished sample to host memmap
        and frees the device, exactly jellyfish --disk's role of dumping
        sorted runs instead of growing (count_main.cc:245-246, 318-338).
        Downstream stages bisect the memmap (model histo, streamed
        subtract, genotype pulls) — pages fault in on demand.

        Requires a globally-sorted layout: range splitters (rows ordered)
        or a single shard. Returns the memmap-backed KmerTable."""
        self.flush()
        S = self.keys.shape[0]
        if S > 1 and self.splitters is None:
            raise ValueError(
                "flat spill needs a range partition (hash-partitioned "
                "rows do not concatenate sorted)")

        def nvalid(tk, tc):
            return jnp.sum((tk != count.SENTINEL) & (tc > 0), axis=1,
                           dtype=jnp.int64)

        nv = np.asarray(jax.jit(nvalid)(self.keys, self.counts))
        n = int(nv.sum())
        cap = self.keys.shape[1]
        head = 8 + 16
        with open(path, "wb") as f:
            f.write(count.KmerTable.FLAT_MAGIC + b"\0\0\0\0")
            np.array([self.k, n], dtype="<u8").tofile(f)
            ko, co = head, head + 8 * n
            for s in range(S):
                for off in range(0, cap, chunk):
                    m = min(chunk, cap - off)
                    kc = np.asarray(self.keys[s, off:off + m])
                    cc = np.asarray(self.counts[s, off:off + m])
                    msk = (kc != count.SENTINEL) & (cc > 0)
                    kv, cv = kc[msk], cc[msk]
                    f.seek(ko)
                    kv.astype("<u8").tofile(f)
                    ko += kv.nbytes
                    f.seek(co)
                    cv.astype("<i8").tofile(f)
                    co += cv.nbytes
            assert ko == head + 8 * n, (ko, n)
        return count.KmerTable.load_flat(path)

    def release(self):
        """Drop the device-resident planes (after a spill) so the next
        sample's table can use the HBM."""
        self._pending = []
        self._pending_els = 0
        self.keys = None
        self.counts = None

    def reset(self, capacity: int | None = None):
        """Empty the committed table in place (after a run spill) —
        pending batches, splitters and compiled shapes are untouched."""
        cap = capacity or self.capacity
        n = self.mesh.devices.size
        self.keys = jax.device_put(
            jnp.full((n, cap), count.SENTINEL, jnp.uint64), self._sharding)
        self.counts = jax.device_put(
            jnp.zeros((n, cap), jnp.int64), self._sharding)
        self.n_unique = jnp.zeros((), jnp.int64)
        self.capacity = cap
