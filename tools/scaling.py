#!/usr/bin/env python
"""Multi-device scaling-efficiency measurement (BASELINE target: >=80%
linear reads/s from 1 chip to a multi-chip slice).

Real multi-chip TPU hardware is not reachable from this environment, so
this measures the sharded chain on a virtual CPU mesh (1/2/4/8 devices)
with a FIXED PER-DEVICE batch (weak scaling: perfect scaling = flat
time, linear reads/s). Writes SCALING_r{N}.json.

Round-4 additions (VERDICT r3 next #1):
* per-PHASE breakdown of the count step — encode-only vs +routing-sort
  vs +exchange vs fold — so the overhead has a name, not just a ratio;
* subtract and routed-query stages in the harness (previously count +
  filter only);
* coverage-style reads (sampled genome, like bench.py) so within-batch
  duplicate collapse behaves as on real data;
* efficiency is measured against the SAME code path at n=1 (the sharded
  chain on a 1-device mesh); the n=1 single-chip specialization (which
  skips routing entirely and defers all reduction to the fold) is
  reported separately as `count_reads_per_s_specialized`.

Caveat printed into the result: the host has few physical cores, so the
virtual devices oversubscribe them — wall-clock efficiency on this box
measures XLA collective overhead + host contention, not ICI. The numbers
still validate that per-device work is constant and the collective volume
per device is O(batch), which is what linear scaling on real chips needs.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/scaling.py [r04]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402

GENOME = 1_000_000
L, K = 160, 25


def _coverage_reads(rng, genome, n):
    starts = rng.integers(0, GENOME - L, size=n)
    idx = starts[:, None] + np.arange(L)[None, :]
    return genome[idx]


def bench_mesh(n_dev: int, per_dev_reads: int = 2048, iters: int = 2):
    import jax
    import jax.numpy as jnp

    import rufus_tpu  # noqa: F401
    from rufus_tpu.parallel import (ShardedKmerTable, make_mesh,
                                    route_capacity, sharded_count_step,
                                    sharded_filter_step,
                                    sharded_subtract_step,
                                    sharded_query_step)
    from rufus_tpu.parallel import sharded as shmod

    P = jax.sharding.PartitionSpec
    mesh = make_mesh(n_dev)
    axis = mesh.axis_names[0]
    sh = jax.sharding.NamedSharding(mesh, P(axis))
    rep = jax.sharding.NamedSharding(mesh, P())
    B = per_dev_reads * n_dev
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome = rng.choice(bases, size=GENOME)
    batches = [jax.device_put(jnp.asarray(_coverage_reads(rng, genome, B)), sh)
               for _ in range(iters)]
    quals = jax.device_put(jnp.full((B, L), ord("I"), jnp.uint8), sh)
    lens = jax.device_put(jnp.full((B,), L, jnp.int32), sh)
    table = jax.device_put(jnp.asarray(np.sort(
        rng.integers(0, 1 << 50, size=4096, dtype=np.uint64))), rep)

    bcap = per_dev_reads * (L - K + 1)
    rcap = route_capacity(bcap, n_dev)
    cstep = sharded_count_step(mesh, K, bcap, rcap)
    fstep = sharded_filter_step(mesh, K, 15, 1)
    dropped_boxes = []

    # ---- phase probes (separate jits sharing the count step's shape) ----
    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from rufus_tpu.ops import pallas_count

    def _encode_only(reads):
        hi, lo = pallas_count.encode_canon_hilo_xla(reads, K)
        return hi.ravel()[::997].sum()  # consume without materializing

    p_encode = jax.jit(shard_map(_encode_only, mesh=mesh, in_specs=P(axis),
                                 out_specs=P(axis), check_vma=False))
    p_route = shmod._count_local_probe(mesh, K, bcap, rcap)

    def count_epoch():
        dev = ShardedKmerTable(mesh, K, capacity=4 * bcap)
        for b in batches:
            bk, bc, _, dr = cstep(b)
            jax.block_until_ready(bk)
            dev.fold_batch(bk, bc)
            dropped_boxes.append(dr)
        dev.flush()
        return dev

    def timeit(fn, *a):
        jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 3

    # warm up compiles (count step + both fold shapes + filter)
    count_epoch()
    fstep(batches[0], quals, lens, table).block_until_ready()

    t0 = time.perf_counter()
    dev = count_epoch()
    jax.block_until_ready((dev.keys, dev.counts))
    count_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = [fstep(b, quals, lens, table) for b in batches]
    jax.block_until_ready(outs)
    filter_s = time.perf_counter() - t0

    # phase probes on one batch
    ph_encode = timeit(p_encode, batches[0])
    ph_local = timeit(p_route, batches[0])          # encode+collapse+route sort
    ph_step = timeit(lambda b: cstep(b)[0], batches[0])  # + exchange
    # fold alone at one batch's pending size
    dev2 = ShardedKmerTable(mesh, K, capacity=4 * bcap)
    bk, bc, _, _dr = cstep(batches[0])
    jax.block_until_ready(bk)

    def fold_once():
        dev2._pending = [(bk, bc)]
        dev2._pending_els = int(bk.shape[-1])
        dev2.flush()
        return dev2.keys

    ph_fold = timeit(fold_once)

    # ---- subtract (3 samples) + routed query ----
    sub = sharded_subtract_step(mesh, 3)
    tabs = []
    for s in range(3):
        d = ShardedKmerTable(mesh, K, capacity=4 * bcap)
        bk3, bc3, _, _ = cstep(batches[s % iters])
        jax.block_until_ready(bk3)
        d.fold_batch(bk3, bc3)
        d.flush()
        tabs.append(d)
    mm = jnp.asarray(2, jnp.int64)
    mc = jnp.asarray(2, jnp.int64)
    md = jnp.asarray(10 ** 9, jnp.int64)

    def sub_once():
        return sub([t.keys for t in tabs], [t.counts for t in tabs],
                   mm, mc, md)[0]

    ph_subtract = timeit(sub_once)

    qcap = 1 << 14
    qstep = sharded_query_step(mesh, K, qcap)
    queries = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 50, size=(n_dev, qcap),
                                 dtype=np.uint64)), sh)

    def q_once():
        return qstep(queries, tabs[0].keys, tabs[0].counts)[0]

    ph_query = timeit(q_once)
    n_queries = n_dev * qcap

    total = B * iters
    n_dropped = int(sum(int(np.asarray(d).sum()) for d in dropped_boxes))
    assert n_dropped == 0, f"routing bins overflowed ({n_dropped} keys)"
    return {
        "devices": n_dev,
        "reads": total,
        "count_reads_per_s": round(total / count_s, 1),
        "filter_reads_per_s": round(total / filter_s, 1),
        "subtract_ms": round(ph_subtract * 1e3, 2),
        "query_lookups_per_s": round(n_queries / ph_query, 1),
        "phase_ms_per_batch": {
            "encode": round(ph_encode * 1e3, 2),
            "routing_sort": round((ph_local - ph_encode) * 1e3, 2),
            "exchange": round((ph_step - ph_local) * 1e3, 2),
            "fold": round(ph_fold * 1e3, 2),
        },
        # checkable exchange-volume model: per-peer bin width is
        # O(bcap/n), so per-device all_to_all volume stays O(batch)
        "route_cap_per_peer": rcap,
        "exchanged_bytes_per_device_per_batch": n_dev * rcap * 12,
        "useful_payload_bytes_per_device_per_batch": bcap * 12,
    }


def bench_specialized_n1(per_dev_reads: int = 2048, iters: int = 2):
    """The true single-chip path (routing skipped, raw keys deferred to
    the fold) — the production n=1 configuration."""
    import jax
    import jax.numpy as jnp

    from rufus_tpu.parallel import (ShardedKmerTable, make_mesh,
                                    sharded_count_step)

    mesh = make_mesh(1)
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome = rng.choice(bases, size=GENOME)
    B = per_dev_reads
    batches = [jax.device_put(jnp.asarray(_coverage_reads(rng, genome, B)))
               for _ in range(iters)]
    bcap = B * (L - K + 1)
    cstep = sharded_count_step(mesh, K, bcap)

    def epoch():
        dev = ShardedKmerTable(mesh, K, capacity=4 * bcap)
        for b in batches:
            bk, bc, _, _dr = cstep(b)
            dev.fold_batch(bk, bc)
        dev.flush()
        return dev

    epoch()
    t0 = time.perf_counter()
    dev = epoch()
    import jax

    jax.block_until_ready((dev.keys, dev.counts))
    return round(B * iters / (time.perf_counter() - t0), 1)


def main():
    import multiprocessing

    results = [bench_mesh(n) for n in (1, 2, 4, 8)]
    spec1 = bench_specialized_n1()
    base_c = results[0]["count_reads_per_s"]
    base_f = results[0]["filter_reads_per_s"]
    base_q = results[0]["query_lookups_per_s"]
    for r in results:
        n = r["devices"]
        r["count_scaling_eff"] = round(r["count_reads_per_s"] / (base_c * n), 3)
        r["filter_scaling_eff"] = round(r["filter_reads_per_s"] / (base_f * n), 3)
        r["query_scaling_eff"] = round(
            r["query_lookups_per_s"] / (base_q * n), 3)
    ncpu = multiprocessing.cpu_count()
    for r in results:
        # with n virtual devices on ncpu cores and constant per-device
        # work, the compute-bound weak-scaling ceiling is ncpu/n
        ceil = min(1.0, ncpu / r["devices"])
        r["host_bound_ceiling"] = round(ceil, 3)
        r["count_eff_vs_host_ceiling"] = round(
            r["count_scaling_eff"] / ceil, 3)
        r["query_eff_vs_host_ceiling"] = round(
            r["query_scaling_eff"] / ceil, 3)
    out = {
        "mode": "weak scaling, fixed per-device batch (2048 reads x 160bp, "
                "coverage-sampled genome)",
        "host_physical_cores": ncpu,
        "count_reads_per_s_specialized_n1": spec1,
        "caveat": "virtual CPU devices oversubscribe the host cores: with "
                  "constant per-device work the wall-clock ceiling is "
                  "ncpu/n, so compare count_eff_vs_host_ceiling (collective "
                  "+ dispatch overhead), not raw efficiency, against the "
                  ">=80% ICI target; exchanged_bytes per device is constant "
                  "in n (the O(batch) routing model, checkable above); "
                  "efficiency baseline is the SAME sharded path at n=1 — "
                  "the n=1 routing-free specialization is reported "
                  "separately",
        "results": results,
    }
    print(json.dumps(out, indent=1))
    tag = sys.argv[1] if len(sys.argv) > 1 else "r04"
    with open(f"SCALING_{tag}.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
