"""Mesh-sharded pipeline steps on the 8-device virtual CPU mesh.

Checks (a) the prefix-sharded count produces exactly the single-device
table (shard-count independence — the parity requirement of SURVEY.md
section 7.3), (b) the sharded filter matches the exact kernel, (c) the
collective-free sharded subtraction semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rufus_tpu.ops import codec, count, filter as rfilter
from rufus_tpu.parallel import (make_mesh, sharded_count_step,
                                sharded_filter_step, sharded_subtract)

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@needs_mesh
def test_sharded_count_matches_single_device():
    k = 13
    n_dev = 8
    B, L = 8 * n_dev, 48
    rng = np.random.default_rng(0)
    reads = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(B, L))
    mesh = make_mesh(n_dev)
    cap = (B // n_dev) * (L - k + 1)
    step = sharded_count_step(mesh, k, cap)
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("d"))
    keys, counts, n = step(jax.device_put(jnp.asarray(reads), sharding))
    keys = np.asarray(keys).ravel()
    counts = np.asarray(counts).ravel()
    mask = keys != count.SENTINEL
    got = dict(zip(keys[mask].tolist(), counts[mask].tolist()))

    ref_keys, ref_counts, _ = count.count_reads_batch(jnp.asarray(reads), k)
    ref_keys = np.asarray(ref_keys)
    ref_counts = np.asarray(ref_counts)
    rmask = ref_keys != count.SENTINEL
    want = dict(zip(ref_keys[rmask].tolist(), ref_counts[rmask].tolist()))
    assert got == want


@needs_mesh
def test_sharded_filter_matches_exact():
    k = 11
    n_dev = 8
    B, L = 16 * n_dev, 64
    rng = np.random.default_rng(1)
    reads = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(B, L))
    quals = np.full((B, L), ord("I"), np.uint8)
    lens = np.full(B, L, np.int32)
    tbl = set()
    for _ in range(10):
        i = int(rng.integers(0, B))
        j = int(rng.integers(0, L - k))
        tbl.add(codec.canonical_str(reads[i, j : j + k].tobytes().decode()))
    keys = np.sort(np.array([codec.str_to_kmer(s) for s in sorted(tbl)],
                            dtype=np.uint64))
    mesh = make_mesh(n_dev)
    step = sharded_filter_step(mesh, k, 15, 1)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("d"))
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    keep = np.asarray(step(
        jax.device_put(jnp.asarray(reads), sh),
        jax.device_put(jnp.asarray(quals), sh),
        jax.device_put(jnp.asarray(lens), sh),
        jax.device_put(jnp.asarray(keys), rep)))
    exact = np.asarray(rfilter.window_hits(
        jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
        jnp.asarray(keys), k, 15)) >= 1
    np.testing.assert_array_equal(keep, exact)


def test_sharded_subtract_semantics():
    mesh = make_mesh(1)
    f = sharded_subtract(mesh)
    a_keys = jnp.asarray(np.array([5, 9, 12], np.uint64))
    a_cnt = jnp.asarray(np.array([6, 4, 9], np.int64))
    b_keys = jnp.asarray(np.array([9, 30], np.uint64))
    b_cnt = jnp.asarray(np.array([3, 8], np.int64))
    keys, keep = f(a_keys, a_cnt, b_keys, b_cnt, 5)
    got = sorted(np.asarray(keys)[np.asarray(keep)].tolist())
    # unique-to-one-table with count>=5: 5 (cnt 6) and 30 (cnt 8); 9 is in
    # both, 12 unique but cnt 9>=5 -> kept too
    assert got == [5, 12, 30]
