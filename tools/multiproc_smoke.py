#!/usr/bin/env python
"""Multi-process mesh smoke test: the N>=2 HOSTS axis of BASELINE.json.

Everything else in the repo exercises a single-process mesh; real pods
span processes, where collectives ride DCN and every array is only
partially addressable. This script runs the count -> fold -> subtract
chain on a 4-process x 2-virtual-CPU-device mesh (SMOKE_PROCS
overrides the process count) via jax.distributed.initialize, asserting
exact parity with the single-device host build — proving the process-
spanning local-aggregate flush (splitter-routed all_to_all of unique
pairs), subtract and routed query keep the table deterministic.

Run (single command; it spawns its own workers):
    python tools/multiproc_smoke.py
Exit code 0 + "MULTIPROC SMOKE PASS" on success.
"""

import os
import subprocess
import sys

N_PROC = int(os.environ.get("SMOKE_PROCS", "4"))
DEV_PER_PROC = 2
PORT = 17733


def worker(rank: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC,
        process_id=rank,
    )
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import rufus_tpu  # noqa: F401
    from rufus_tpu.ops import codec, count
    from rufus_tpu.parallel import (ShardedKmerTable, local_count_step,
                                    make_mesh, make_splitters,
                                    sharded_subtract_step)

    n_dev = len(jax.devices())
    assert n_dev == N_PROC * DEV_PER_PROC, jax.devices()
    mesh = make_mesh(n_dev)
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("d"))

    # planted trio, deterministic on every process
    k, B, L = 13, 16 * n_dev, 48
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(bases, size=(B, L))
    mother = np.repeat(base[: B // 2], 8, axis=0)[:B]
    father = np.repeat(base[B // 2:], 8, axis=0)[:B]
    subject = np.concatenate([mother[: B // 2], father[: B // 2]])
    mutant = rng.choice(bases, size=(L,))
    subject = np.concatenate([subject[:-8], np.tile(mutant, (8, 1))])
    mut_str = mutant.tobytes().decode()
    want_mut = sorted({codec.str_to_kmer(codec.canonical_str(mut_str[i:i + k]))
                       for i in range(L - k + 1)})

    bcap = (B // n_dev) * (L - k + 1)
    step = local_count_step(mesh, k)
    splitters = None
    tables = []
    for reads in (subject, mother, father):
        # each process owns its slice of the global batch
        local = reads.reshape(n_dev, B // n_dev, L)[
            rank * DEV_PER_PROC:(rank + 1) * DEV_PER_PROC].reshape(-1, L)
        g = jax.make_array_from_process_local_data(
            sharding, jnp.asarray(local), (B, L))
        t = ShardedKmerTable(mesh, k, capacity=max(256, bcap))
        bk, _nn = step(g)
        if splitters is None:
            # sampled device-side + process_allgather: identical on every
            # process (the partition must agree across the pod)
            splitters = make_splitters(bk, n_dev)
        t.splitters = splitters
        jax.block_until_ready(bk)
        t.fold_batch(bk)
        t.flush()
        tables.append(t)

    sub = sharded_subtract_step(mesh, 3)
    mut_d, scnt_d = sub([t.keys for t in tables], [t.counts for t in tables],
                        jnp.int64(5), jnp.int64(5), jnp.int64(10000))
    from jax.experimental import multihost_utils

    mut = np.asarray(multihost_utils.process_allgather(
        mut_d, tiled=True)).ravel()
    got = np.sort(mut[mut != count.SENTINEL])

    # parity with the single-device host build
    rk, rc, _ = count.count_reads_batch(jnp.asarray(subject), k)
    subj_tab = count.KmerTable.from_rle_chunks(
        k, [(np.asarray(rk), np.asarray(rc), 0)])
    tabs_host = []
    for reads in (subject, mother, father):
        rk, rc, _ = count.count_reads_batch(jnp.asarray(reads), k)
        tabs_host.append(count.KmerTable.from_rle_chunks(
            k, [(np.asarray(rk), np.asarray(rc), 0)]))
    ref = count.subtract_unique(tabs_host, merge_min=5)
    sc = tabs_host[0].query(ref)
    ref = ref[(sc >= 5) & (sc <= 10000)]
    assert np.array_equal(got, ref), (len(got), len(ref))
    assert set(want_mut) <= set(got.tolist())

    # routed genotype query across processes: look up a mix of present +
    # absent k-mers against the subject's device-resident table and
    # compare with the host table (the pipeline pull path,
    # driver._routed_query semantics)
    from rufus_tpu.parallel import sharded_query_step

    qcap = 128
    queries = np.full((n_dev, qcap), count.SENTINEL, np.uint64)
    probe = np.concatenate([ref[: qcap // 2],
                            np.arange(1, qcap, dtype=np.uint64)])[: qcap]
    for d in range(n_dev):
        queries[d, : len(probe)] = probe
    ql = jnp.asarray(queries[rank * DEV_PER_PROC:(rank + 1) * DEV_PER_PROC])
    qg = jax.make_array_from_process_local_data(sharding, ql, queries.shape)
    qstep = sharded_query_step(mesh, k, qcap, by_splitters=True)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    split_dev = jax.device_put(jnp.asarray(splitters, jnp.uint64), rep)
    out, dropped = qstep(qg, tables[0].keys, tables[0].counts, split_dev)
    assert int(np.asarray(dropped).sum()) == 0
    out_g = np.asarray(multihost_utils.process_allgather(out, tiled=True))
    assert out_g.shape == (n_dev, qcap), out_g.shape
    want_q = tabs_host[0].query(probe)
    for d in range(n_dev):
        assert np.array_equal(out_g[d, : len(probe)], want_q), d
    print(f"rank {rank}: parity ok, {len(got)} mutant kmers, "
          f"routed query ok", flush=True)


def main():
    if "MP_SMOKE_RANK" in os.environ:
        worker(int(os.environ["MP_SMOKE_RANK"]))
        return
    procs = []
    for r in range(N_PROC):
        env = dict(os.environ, MP_SMOKE_RANK=str(r),
                   PALLAS_AXON_POOL_IPS="")  # keep the TPU plugin out
        procs.append(subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                                      env=env))
    rcs = [p.wait(timeout=600) for p in procs]
    assert rcs == [0] * N_PROC, rcs
    print("MULTIPROC SMOKE PASS", flush=True)


if __name__ == "__main__":
    main()
