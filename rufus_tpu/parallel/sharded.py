"""Mesh-sharded k-mer pipeline steps (shard_map + XLA collectives).

Design (scaling-book style): pick a 1-D mesh over all chips; reads are
data-sharded on the batch axis; count tables are sharded by k-mer PREFIX
(top log2(n) bits of the canonical k-mer = owner shard), so per-batch
counting is: local window+canonicalize -> bucket-by-owner into fixed
capacity bins -> all_to_all over ICI -> local sort+RLE. Determinism: the
table contents are independent of shard count (sorted-unique semantics);
only bin-capacity overflow could drop k-mers, so capacity is sized to
batch_kmers (lossless) by default.
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


def make_mesh(n_devices: int | None = None, axis: str = "d"):
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.sharding.Mesh(np.array(devs[:n]), (axis,))


def _bucket_by_owner(kmers, valid, n_shards: int, capacity: int):
    """Route each kmer to its prefix-owner bin: returns (n_shards, capacity)
    keys padded with SENTINEL. Overflow beyond capacity is dropped (callers
    size capacity >= len(kmers) for lossless routing)."""
    keys = jnp.where(valid, kmers, count.SENTINEL).ravel()
    shift = jnp.uint64(64 - max(1, (n_shards - 1).bit_length()))
    owner = jnp.where(
        keys == count.SENTINEL,
        n_shards,  # park invalid in a virtual overflow shard
        (keys >> shift).astype(jnp.int32) % n_shards if n_shards > 1 else 0,
    ).astype(jnp.int32)
    order = jnp.argsort(owner, stable=True)
    keys_sorted = keys[order]
    owner_sorted = owner[order]
    # rank within owner group
    idx = jnp.arange(keys.shape[0])
    starts = jnp.searchsorted(owner_sorted, jnp.arange(n_shards + 1))
    rank = idx - starts[owner_sorted]
    bins = jnp.full((n_shards, capacity), count.SENTINEL, dtype=jnp.uint64)
    ok = (owner_sorted < n_shards) & (rank < capacity)
    bins = bins.at[jnp.where(ok, owner_sorted, 0),
                   jnp.where(ok, rank, 0)].set(
        jnp.where(ok, keys_sorted, bins[0, 0]))
    return bins


def sharded_count_step(mesh, k: int, capacity: int):
    """Build a pjit-able step: (global reads (B, L) uint8, data-sharded) ->
    per-shard sorted unique (keys, counts, n) for the shard's k-mer prefix
    partition."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size

    def local(reads):
        codes = codec.encode_bases(reads)
        kmers, valid = codec.pack_kmers(codes, k)
        canon = codec.canonical_kmers(kmers, k)
        bins = _bucket_by_owner(canon, valid, n, capacity)  # (n, cap)
        # exchange: shard i sends bins[j] to shard j
        routed = jax.lax.all_to_all(bins[None], axis, split_axis=1,
                                    concat_axis=0, tiled=False)
        keys = routed.reshape(-1)
        s = jnp.sort(keys)
        ones = jnp.ones(s.shape, dtype=jnp.int64)
        uk, cnts, nn = count.rle_sum(s, ones)
        return uk[None], cnts[None], nn[None]

    f = shard_map(
        local, mesh=mesh,
        in_specs=jax.sharding.PartitionSpec(axis),
        out_specs=jax.sharding.PartitionSpec(axis),
        check_vma=False,
    )
    return jax.jit(f)


def sharded_filter_step(mesh, k: int, min_q: int, threshold: int):
    """Data-parallel read filter with a replicated mutant table."""
    axis = mesh.axis_names[0]

    def local(reads, quals, lens, table):
        from ..ops import filter as rfilter

        hits = rfilter.window_hits(reads, quals, lens, table, k, min_q)
        return hits >= threshold

    f = shard_map(
        local, mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec(axis),
                  jax.sharding.PartitionSpec(axis),
                  jax.sharding.PartitionSpec(axis),
                  jax.sharding.PartitionSpec()),
        out_specs=jax.sharding.PartitionSpec(axis),
        check_vma=False,
    )
    return jax.jit(f)


def sharded_subtract(mesh):
    """Prefix-sharded 'present in exactly one sample' merge: tables already
    prefix-sharded per sample -> per-shard subtraction is purely local
    (no collectives needed — the payoff of prefix sharding)."""

    def local(keys_a, cnt_a, keys_b, cnt_b, merge_min):
        # vectorized exactly-one-sample test over two sorted runs
        keys = jnp.concatenate([keys_a, keys_b])
        src = jnp.concatenate([jnp.zeros_like(cnt_a), jnp.ones_like(cnt_b)])
        cnts = jnp.concatenate([cnt_a, cnt_b])
        order = jnp.argsort(keys)
        keys, cnts, src = keys[order], cnts[order], src[order]
        head = jnp.concatenate([jnp.ones(1, bool), keys[1:] != keys[:-1]])
        tail = jnp.concatenate([keys[1:] != keys[:-1], jnp.ones(1, bool)])
        singleton = head & tail & (keys != count.SENTINEL)
        keep = singleton & (cnts >= merge_min)
        return jnp.where(keep, keys, count.SENTINEL), keep

    return jax.jit(local)
