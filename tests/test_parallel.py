"""Mesh-sharded pipeline steps on the 8-device virtual CPU mesh.

Checks the full sharded chain is EXACTLY shard-count independent (the
parity requirement of SURVEY.md section 7.3):

(a) prefix-sharded count+fold produces the identical table to the
    single-device host build, at every mesh size;
(b) the collective-free N-table subtract matches host subtract_unique +
    subject-range filter (merge_files.cc:147-153 + CheckJellyHashList.sh:12
    fused semantics);
(c) routed genotype queries match host KmerTable.query;
(d) the sharded filter matches the exact kernel AND keeps planted mutant
    reads (keep > 0 — behavior, not just shapes);
(e) end-to-end: count -> fold -> subtract -> filter on a planted trio
    recovers the planted mutant k-mers at 1, 2, 4 and 8 devices.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rufus_tpu.ops import codec, count, filter as rfilter
from rufus_tpu.parallel import (ShardedKmerTable, make_mesh,
                                sharded_count_step, sharded_filter_step,
                                sharded_query_step, sharded_subtract_step)

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

BASES = np.frombuffer(b"ACGT", np.uint8)


def _shard(mesh, arr):
    return jax.device_put(
        jnp.asarray(arr),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("d")))


def _host_table(reads, k, lower=0):
    keys, counts, _ = count.count_reads_batch(jnp.asarray(reads), k)
    return count.KmerTable.from_rle_chunks(
        k, [(np.asarray(keys), np.asarray(counts), 0)], lower_count=lower)


def _build_sharded(mesh, reads, k, cap, batches=2, lower=0):
    """Stream `reads` through sharded count in `batches` chunks, folding."""
    n_dev = mesh.devices.size
    B = reads.shape[0]
    step = None
    table = ShardedKmerTable(mesh, k, cap)
    per = B // batches
    for i in range(batches):
        chunk = reads[i * per : (i + 1) * per]
        if step is None:
            bcap = (chunk.shape[0] // n_dev) * (reads.shape[1] - k + 1)
            step = sharded_count_step(mesh, k, bcap)
        bk, bc, _, dr = step(_shard(mesh, chunk))
        assert int(np.asarray(dr).sum()) == 0, "routing bins overflowed"
        table.fold_batch(bk, bc)
    if lower > 1:
        table.apply_lower_count(lower)
    assert not table.overflowed()
    return table


@needs_mesh
@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_sharded_count_fold_matches_host(n_dev):
    k = 13
    B, L = 16 * 8, 48
    rng = np.random.default_rng(0)
    reads = rng.choice(BASES, size=(B, L))
    mesh = make_mesh(n_dev)
    table = _build_sharded(mesh, reads, k, cap=B * (L - k + 1), batches=4)
    host = table.to_host()
    want = _host_table(reads, k)
    np.testing.assert_array_equal(host.keys, want.keys)
    np.testing.assert_array_equal(host.counts, want.counts)


@needs_mesh
def test_sharded_lower_count_floor():
    k = 11
    rng = np.random.default_rng(3)
    reads = rng.choice(BASES, size=(32, 40))
    reads = np.concatenate([reads, reads[:8]])  # force some counts >= 2
    reads = np.concatenate([reads, np.full((8, 40), ord("N"), np.uint8)])
    mesh = make_mesh(4)
    t = _build_sharded(mesh, reads, k, cap=reads.size, batches=2, lower=2)
    want = _host_table(reads, k, lower=2)
    host = t.to_host()
    np.testing.assert_array_equal(host.keys, want.keys)
    np.testing.assert_array_equal(host.counts, want.counts)


def _planted_trio(rng, k, B, L, n_mut_reads=8):
    """Subject reads contain a planted mutant region absent from controls;
    each sample repeated so counts clear merge_min."""
    base = rng.choice(BASES, size=(B, L))
    mother = np.repeat(base[: B // 2], 6, axis=0)[:B]
    father = np.repeat(base[B // 2 :], 6, axis=0)[:B]
    subject = np.concatenate([mother[: B // 2], father[: B // 2]])
    mutant = rng.choice(BASES, size=(L,))
    mut_reads = np.tile(mutant, (n_mut_reads, 1))
    subject = np.concatenate([subject[:-n_mut_reads], mut_reads])
    # mutant canonical k-mers (the expected HashList)
    s = mutant.tobytes().decode()
    want = sorted({codec.str_to_kmer(codec.canonical_str(s[i:i + k]))
                   for i in range(L - k + 1)})
    return subject, mother, father, np.array(want, np.uint64), mut_reads


@needs_mesh
@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_sharded_chain_end_to_end(n_dev):
    """count -> fold -> subtract(+range) -> filter, planted mutants."""
    k = 13
    B, L = 64, 48
    rng = np.random.default_rng(7)
    subject, mother, father, want_mut, mut_reads = _planted_trio(rng, k, B, L)
    mesh = make_mesh(n_dev)
    cap = 2 * B * (L - k + 1)
    tables = [_build_sharded(mesh, r, k, cap, batches=2)
              for r in (subject, mother, father)]

    sub = sharded_subtract_step(mesh, 3)
    mut, scnt = sub([t.keys for t in tables], [t.counts for t in tables],
                    jnp.int64(5), jnp.int64(5), jnp.int64(10000))
    mut = np.asarray(mut).ravel()
    scnt = np.asarray(scnt).ravel()
    mask = mut != count.SENTINEL
    got = np.sort(mut[mask])

    # host reference: subtract_unique + subject range filter
    host_tabs = [t.to_host() for t in tables]
    ref = count.subtract_unique(host_tabs, merge_min=5)
    sc = host_tabs[0].query(ref)
    ref = ref[(sc >= 5) & (sc <= 10000)]
    np.testing.assert_array_equal(got, ref)
    # the planted k-mers are recovered (behavior, not just shapes)
    assert set(want_mut.tolist()) <= set(got.tolist())
    assert (scnt[mask] >= 5).all()

    # sharded filter keeps the mutant reads and matches the exact kernel
    hl = np.sort(got)
    quals = np.full(subject.shape, ord("I"), np.uint8)
    lens = np.full(B, L, np.int32)
    fstep = sharded_filter_step(mesh, k, 15, 1)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    keep = np.asarray(fstep(_shard(mesh, subject), _shard(mesh, quals),
                            _shard(mesh, lens),
                            jax.device_put(jnp.asarray(hl), rep)))
    exact = np.asarray(rfilter.window_hits(
        jnp.asarray(subject), jnp.asarray(quals), jnp.asarray(lens),
        jnp.asarray(hl), k, 15)) >= 1
    np.testing.assert_array_equal(keep, exact)
    assert keep[-mut_reads.shape[0]:].all(), "planted mutant reads kept"
    assert keep.sum() >= mut_reads.shape[0]


@needs_mesh
@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_query_matches_host(n_dev):
    k = 13
    B, L = 64, 48
    rng = np.random.default_rng(11)
    reads = rng.choice(BASES, size=(B, L))
    mesh = make_mesh(n_dev)
    table = _build_sharded(mesh, reads, k, cap=B * (L - k + 1))
    host = table.to_host()
    # queries: half real k-mers, half random (mostly absent)
    q_real = host.keys[rng.integers(0, len(host.keys), size=24)]
    q_rand = rng.integers(0, 1 << (2 * k), size=24, dtype=np.uint64)
    canon = np.asarray(codec.canonical_kmers(jnp.asarray(q_rand), k))
    queries = np.concatenate([q_real, canon])
    rng.shuffle(queries)
    Q = len(queries) // n_dev
    qstep = sharded_query_step(mesh, k, qcap=Q)
    ans, dropped = qstep(_shard(mesh, queries.reshape(n_dev * 2, -1)),
                         table.keys, table.counts)
    assert int(np.asarray(dropped).sum()) == 0
    got = np.asarray(ans).ravel()
    want = host.query(queries)
    np.testing.assert_array_equal(got, want)


@needs_mesh
def test_route_capacity_is_o_batch_and_overflow_detected():
    """Per-peer routing bins are O(batch/n) — NOT O(batch) per peer (the
    round-2 n-times-oversized exchange) — and undersized bins report
    dropped keys losslessly instead of silently corrupting counts."""
    from rufus_tpu.parallel.sharded import route_capacity

    bcap = 256 * 1024
    for n in (2, 4, 8):
        rcap = route_capacity(bcap, n)
        # exchange volume per device = n*rcap ~= (1+slack)*bcap
        assert n * rcap <= 2 * bcap, (n, rcap)
        assert rcap >= bcap // n  # can't be smaller than the mean load
    # force overflow: a route_cap below the per-peer mean load guarantees
    # some peer bin overflows; the routed weight must then fall short of
    # the true window count and the drop counter must fire (the caller's
    # lossless-retry signal) — and conversely with ample capacity the
    # routed weight must be exact
    k = 13
    B, L = 16 * 8, 48
    rng = np.random.default_rng(2)
    reads = rng.choice(BASES, size=(B, L))
    mesh = make_mesh(8)
    bcap = (B // 8) * (L - k + 1)  # 576 keys/device, mean 72/peer
    _, counts, _ = count.count_reads_batch(jnp.asarray(reads), k)
    total_valid = int(np.asarray(counts).sum())

    step = sharded_count_step(mesh, k, bcap, route_cap=32)
    bk, bc, _, dr = step(_shard(mesh, reads))
    n_dropped = int(np.asarray(dr).sum())
    kept_w = int(np.asarray(jnp.sum(jnp.asarray(bc))))
    assert n_dropped > 0, "expected overflow at route_cap=32"
    assert kept_w < total_valid, "overflow must lose weight (and be retried)"

    step2 = sharded_count_step(mesh, k, bcap)  # default sizing: lossless
    bk2, bc2, _, dr2 = step2(_shard(mesh, reads))
    assert int(np.asarray(dr2).sum()) == 0
    assert int(np.asarray(jnp.sum(jnp.asarray(bc2)))) == total_valid


@needs_mesh
def test_sharded_table_grows_on_overflow():
    """Tiny initial capacity: the fold must grow losslessly (cooperative-
    resize role, hash_counter.hpp:52-56) and still match the host table."""
    k = 11
    B, L = 32, 48
    rng = np.random.default_rng(5)
    reads = rng.choice(BASES, size=(B, L))
    mesh = make_mesh(4)
    n_dev = 4
    bcap = (B // 2 // n_dev) * (L - k + 1)
    step = sharded_count_step(mesh, k, bcap)
    table = ShardedKmerTable(mesh, k, capacity=16)  # absurdly small
    for i in range(2):
        bk, bc, _, _ = step(_shard(mesh, reads[i * (B // 2):(i + 1) * (B // 2)]))
        # virtual CPU devices share one thread pool: force the all_to_all
        # to finish before fold partitions can occupy it (flaky deadlock
        # under load otherwise; real-chip collectives don't interleave so)
        jax.block_until_ready(bk)
        table.fold_batch(bk, bc)
    table.flush()  # folds are buffered; force them before inspecting
    assert table.capacity > 16
    assert not table.overflowed()
    host = table.to_host()
    want = _host_table(reads, k)
    np.testing.assert_array_equal(host.keys, want.keys)
    np.testing.assert_array_equal(host.counts, want.counts)


@needs_mesh
@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_routed_pipeline_pull_matches_host_query(n_dev):
    """The pipeline's genotyping pull (driver._routed_query) routed to
    owner shards returns exactly what a host gather + KmerTable.query
    would — at every shard count, with the table never leaving the
    devices (VERDICT r3 next #3). Mixed present/absent queries, plus a
    width that exercises query padding."""
    from rufus_tpu.pipeline.driver import RufusPipeline

    k = 13
    B, L = 16 * 8, 48
    rng = np.random.default_rng(7)
    reads = rng.choice(BASES, size=(B, L))
    mesh = make_mesh(n_dev)
    dev = _build_sharded(mesh, reads, k, cap=B * (L - k + 1), batches=4)
    host = dev.to_host()

    class _Cfg:
        pass

    probe = RufusPipeline.__new__(RufusPipeline)
    probe.cfg = _Cfg()
    probe.cfg.k = k
    probe.mesh = mesh
    probe.n_devices = n_dev
    probe._log = lambda *a, **kw: None

    present = host.keys[:: max(1, len(host.keys) // 300)].astype(np.uint64)
    absent = np.setdiff1d(
        rng.integers(0, 1 << (2 * k), size=100, dtype=np.uint64), host.keys)
    queries = np.concatenate([present, absent])
    got = RufusPipeline._routed_query(probe, dev, queries)
    want = host.query(queries)
    np.testing.assert_array_equal(np.asarray(got), want)


@needs_mesh
@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_fold_counts_exact_with_sentinel_windows(n_dev):
    """Reads containing N produce sentinel window keys; the prefix-coded
    RLE sums must NOT attribute the trailing sentinel region to the last
    valid run (regression: the largest key's count was inflated by the
    sentinel count on the n=1 raw path)."""
    k = 13
    rng = np.random.default_rng(9)
    reads = rng.choice(BASES, size=(16 * 8, 48))
    nmask = rng.random(reads.shape) < 0.05
    reads = np.where(nmask, ord("N"), reads).astype(np.uint8)
    mesh = make_mesh(n_dev)
    t = _build_sharded(mesh, reads, k, cap=reads.size, batches=4)
    want = _host_table(reads, k)
    host = t.to_host()
    np.testing.assert_array_equal(host.keys, want.keys)
    np.testing.assert_array_equal(host.counts, want.counts)


@needs_mesh
@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_local_aggregate_flush_matches_host(n_dev):
    """The combiner-idiom count flow (local_count_step + splitter-routed
    flush): per-batch work stays device-local, the flush exchanges only
    unique pairs, and the table equals the host build exactly at every
    device count."""
    import jax
    import jax.numpy as jnp

    from rufus_tpu.parallel import local_count_step, make_splitters

    k, B, L = 13, 16 * 8, 48
    rng = np.random.default_rng(3)
    reads = rng.choice(BASES, size=(B, L))
    nmask = rng.random(reads.shape) < 0.03
    reads = np.where(nmask, ord("N"), reads).astype(np.uint8)
    mesh = make_mesh(n_dev)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("d"))
    lstep = local_count_step(mesh, k)
    dev = ShardedKmerTable(mesh, k, capacity=B * (L - k + 1))
    splitters = None
    for i in range(4):
        part = reads[i * (B // 4):(i + 1) * (B // 4)]
        pad = np.full((B - B // 4, L), ord("N"), np.uint8)
        batch = np.concatenate([part, pad])
        bk, _nn = lstep(jax.device_put(jnp.asarray(batch), sh))
        if splitters is None:
            splitters = make_splitters(bk, n_dev)
        dev.splitters = splitters
        dev.fold_batch(bk)
    dev.flush()
    host = dev.to_host()
    want = _host_table(reads, k)
    np.testing.assert_array_equal(host.keys, want.keys)
    np.testing.assert_array_equal(host.counts, want.counts)


def test_searchsorted_u64_matches_numpy():
    """Property test (round-4 advisor high finding): the manual u32-plane
    bisection must match np.searchsorted(side='left') exactly — including
    queries above every key (which previously overshot to n+1 once
    lo == hi == n) — across power-of-two AND odd table sizes."""
    from rufus_tpu.parallel.sharded import searchsorted_u64

    rng = np.random.default_rng(11)
    for n in [1, 2, 3, 5, 7, 8, 100, 127, 128, 129, 1000, 4096]:
        keys = np.sort(rng.integers(0, 2**63, n, dtype=np.uint64)
                       .astype(np.uint64))
        # queries: random, exact hits, 0, and above-all-keys extremes
        q = np.concatenate([
            rng.integers(0, 2**64, 5000, dtype=np.uint64),
            keys[rng.integers(0, n, min(n, 64))],
            np.array([0, keys[-1], np.uint64(2**64 - 1)], np.uint64),
        ])
        got = np.asarray(searchsorted_u64(jnp.asarray(keys), jnp.asarray(q)))
        want = np.searchsorted(keys, q, side="left")
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")
        assert got.max() <= n


@needs_mesh
@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_subtract_unequal_capacities(n_dev):
    """Round-4 advisor high finding: per-sample tables are independently
    shrink()-ed to different power-of-two capacities; the tagged
    sort-merge membership test must handle a control table narrower than
    the subject's (previously lax.sort rejected the mismatched shapes)."""
    k = 13
    rng = np.random.default_rng(21)
    # subject: many reads -> big table; control: few reads -> small table
    subj_reads = rng.choice(BASES, size=(16 * n_dev, 64)).astype(np.uint8)
    ctrl_reads = subj_reads[: 2 * n_dev].copy()
    mesh = make_mesh(n_dev)
    subj = _build_sharded(mesh, subj_reads, k, cap=16 * 64)
    ctrl = _build_sharded(mesh, ctrl_reads, k, cap=16 * 64)
    subj.shrink()
    ctrl.shrink()
    assert subj.capacity != ctrl.capacity, "fixture must exercise the case"
    step = sharded_subtract_step(mesh, 2)
    mk, mc = step([subj.keys, ctrl.keys], [subj.counts, ctrl.counts],
                  jnp.int64(1), jnp.int64(1), jnp.int64(10**6))
    got_keys = np.asarray(mk).ravel()
    got_cnts = np.asarray(mc).ravel()
    keep = got_keys != count.SENTINEL
    got = dict(zip(got_keys[keep].tolist(), got_cnts[keep].tolist()))
    hs = _host_table(subj_reads, k)
    hc = _host_table(ctrl_reads, k)
    ref = count.subtract_unique([hs, hc], merge_min=1)
    sc = hs.query(ref)
    sel = (sc >= 1) & (sc <= 10**6)
    want = dict(zip(ref[sel].tolist(), sc[sel].tolist()))
    assert got == want


def test_make_splitters_accepts_batch_list():
    """Splitters pooled over several spaced batches (round-4 advisor low
    finding): a list of key arrays must yield the quantiles of the POOLED
    distribution, not the first batch's locality."""
    from rufus_tpu.parallel import make_splitters

    # batch 0 is all-low keys, batch 1 all-high: single-batch splitters
    # would put everything on one shard
    lo = np.arange(0, 4096, dtype=np.uint64)
    hi = np.arange(2**40, 2**40 + 4096, dtype=np.uint64)
    s_pooled = make_splitters([jnp.asarray(lo), jnp.asarray(hi)], 2)
    assert s_pooled.shape == (1,)
    # the pooled median separates the two clouds
    assert lo.max() < s_pooled[0] <= hi.max()
    s_first = make_splitters(jnp.asarray(lo), 2)
    assert s_first[0] < 4096  # the locality skew the pooling avoids


@needs_mesh
@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_sharded_query_multi_matches_host(n_dev):
    """The single-dispatch multi-table genotyping pull: route once,
    answer against every sample's table, un-route — must equal per-table
    host queries exactly, incl. tables of unequal capacity and SENTINEL-
    padded query slots."""
    from rufus_tpu.parallel import sharded_query_multi

    k = 13
    rng = np.random.default_rng(31)
    reads = [rng.choice(BASES, size=(16 * n_dev, 64)).astype(np.uint8)
             for _ in range(3)]
    reads[2] = reads[2][: 4 * n_dev]  # third table smaller capacity
    mesh = make_mesh(n_dev)
    devs = [_build_sharded(mesh, r, k, cap=16 * 64) for r in reads]
    for d in devs:
        d.shrink()
    hosts = [d.to_host() for d in devs]
    # queries: hits from each table + randoms + explicit sentinels
    q = np.concatenate([
        hosts[0].keys[rng.integers(0, len(hosts[0].keys), 20)],
        hosts[2].keys[rng.integers(0, len(hosts[2].keys), 20)],
        np.asarray(codec.canonical_kmers(jnp.asarray(
            rng.integers(0, 1 << (2 * k), 24, dtype=np.uint64)), k)),
    ])
    qcap = -(-len(q) // n_dev)
    qcap = max(8, qcap)
    padded = np.full(n_dev * qcap, count.SENTINEL, np.uint64)
    padded[: len(q)] = q
    qd = _shard(mesh, padded.reshape(n_dev, qcap))
    step = sharded_query_multi(mesh, k, qcap, 3)
    out, dropped = step(qd, [d.keys for d in devs],
                        [d.counts for d in devs])
    assert int(np.asarray(dropped).sum()) == 0
    got = np.asarray(out).reshape(3, -1)[:, : len(q)]
    for t in range(3):
        np.testing.assert_array_equal(got[t], hosts[t].query(q))


def test_host_owner_mirror_is_bit_exact():
    """exact route sizing is only sound if the host owner function equals
    the device one bit-for-bit — hash partition and splitter partition,
    incl. SENTINEL handling."""
    from rufus_tpu.parallel.sharded import (_owners, _owners_by_splitters,
                                            exact_route_cap, host_owners)

    rng = np.random.default_rng(41)
    keys = rng.integers(0, 2**64, 5000, dtype=np.uint64)
    keys[::97] = count.SENTINEL
    for n in (2, 3, 8):
        dev = np.asarray(_owners(jnp.asarray(keys), n, 25))
        # device _owners has no sentinel special-case (count path filters
        # them upstream); compare non-sentinel lanes, and host must tag
        # sentinels with n
        host = host_owners(keys, n)
        m = keys != count.SENTINEL
        np.testing.assert_array_equal(host[m], dev[m])
        assert (host[~m] == n).all()
        spl = np.sort(rng.integers(0, 2**64, n - 1, dtype=np.uint64))
        dev_s = np.asarray(_owners_by_splitters(
            jnp.asarray(keys), jnp.asarray(spl), n))
        host_s = host_owners(keys, n, spl)
        np.testing.assert_array_equal(host_s, dev_s)
    # exact sizing: the max bin over (device row, owner), 128-aligned
    cap = exact_route_cap(keys[:4096].reshape(4, 1024), 4)
    owners = [host_owners(r, 4) for r in keys[:4096].reshape(4, 1024)]
    true_max = max(int(np.bincount(o[o < 4], minlength=4).max())
                   for o in owners)
    assert cap == max(128, -(-true_max // 128) * 128)


@needs_mesh
@pytest.mark.parametrize("n_dev", [1, 4])
def test_spill_to_flat_matches_to_host(n_dev):
    """Chunked device->flat spill (the jellyfish --disk role for the
    out-of-HBM WGS regime) must produce the identical sorted table a
    full host gather would — range partition, sentinel and zero-count
    masking, tiny chunk size to force many boundary crossings."""
    import tempfile

    from rufus_tpu.parallel import local_count_step, make_splitters

    k = 13
    rng = np.random.default_rng(51)
    reads = rng.choice(BASES, size=(16 * 8, 48)).astype(np.uint8)
    mesh = make_mesh(n_dev)
    if n_dev == 1:
        dev = _build_sharded(mesh, reads, k, cap=16 * 8 * 36)
    else:
        sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("d"))
        lstep = local_count_step(mesh, k)
        bk, _ = lstep(jax.device_put(jnp.asarray(reads), sh))
        dev = ShardedKmerTable(mesh, k, capacity=16 * 8 * 36)
        dev.splitters = make_splitters(bk, n_dev)
        dev.fold_batch(bk)
        dev.flush()
    want = dev.to_host()
    with tempfile.TemporaryDirectory() as td:
        flat = dev.to_flat(td + "/t.flat", chunk=257)  # odd, tiny
        np.testing.assert_array_equal(np.asarray(flat.keys), want.keys)
        np.testing.assert_array_equal(np.asarray(flat.counts), want.counts)
        np.testing.assert_array_equal(flat.histo(chunk=100), want.histo())
        q = np.concatenate([want.keys[::3],
                            rng.integers(0, 1 << 26, 50, dtype=np.uint64)])
        np.testing.assert_array_equal(flat.query(q), want.query(q))
    dev.release()
    assert dev.keys is None


def test_subtract_unique_stream_matches_dense():
    """The chunked fused subtract (spilled regime) equals the dense
    subtract_unique + subject pull at every chunk boundary case."""
    rng = np.random.default_rng(61)
    ks = np.sort(rng.choice(np.arange(1 << 20, dtype=np.uint64), 5000,
                            replace=False))
    subj = count.KmerTable(13, ks, rng.integers(1, 60, 5000))
    c1 = count.KmerTable(13, np.sort(rng.choice(ks, 2000, replace=False)),
                         np.full(2000, 3, np.int64))
    extra = rng.integers(0, 1 << 20, 1000).astype(np.uint64)
    c2k = np.unique(np.concatenate([rng.choice(ks, 500), extra]))
    c2 = count.KmerTable(13, c2k, np.full(len(c2k), 2, np.int64))
    for chunk in (100, 4096, 10**6):
        got_k, got_c = count.subtract_unique_stream(
            [subj, c1, c2], merge_min=5, min_cov=5, max_depth=40,
            chunk=chunk)
        ref = count.subtract_unique([subj, c1, c2], merge_min=5)
        sc = subj.query(ref)
        sel = (sc >= 5) & (sc <= 40)
        np.testing.assert_array_equal(got_k, ref[sel])
        np.testing.assert_array_equal(got_c, sc[sel])
