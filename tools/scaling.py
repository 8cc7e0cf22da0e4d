#!/usr/bin/env python
"""Multi-device scaling-efficiency measurement (BASELINE target: >=80%
linear reads/s from 1 chip to a multi-chip slice).

Real multi-chip TPU hardware is not reachable from this environment, so
this measures the sharded count(+fold)+filter chain on a virtual CPU mesh
(1/2/4/8 devices) with a FIXED PER-DEVICE batch (weak scaling: perfect
scaling = flat time, linear reads/s). Writes SCALING_r{N}.json.

Caveat printed into the result: the host has few physical cores, so the
virtual devices oversubscribe them — wall-clock efficiency on this box
measures XLA collective overhead + host contention, not ICI. The numbers
still validate that per-device work is constant and the collective volume
per device is O(batch), which is what linear scaling on real chips needs.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/scaling.py
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


def bench_mesh(n_dev: int, per_dev_reads: int = 2048, L: int = 160,
               k: int = 25, iters: int = 2):
    import jax
    import jax.numpy as jnp

    from rufus_tpu.parallel import (ShardedKmerTable, make_mesh,
                                    route_capacity, sharded_count_step,
                                    sharded_filter_step)

    mesh = make_mesh(n_dev)
    axis = mesh.axis_names[0]
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(axis))
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    B = per_dev_reads * n_dev
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    batches = [jax.device_put(jnp.asarray(rng.choice(bases, size=(B, L))), sh)
               for _ in range(iters)]
    quals = jax.device_put(jnp.full((B, L), ord("I"), jnp.uint8), sh)
    lens = jax.device_put(jnp.full((B,), L, jnp.int32), sh)
    table = jax.device_put(jnp.asarray(np.sort(
        rng.integers(0, 1 << 50, size=4096, dtype=np.uint64))), rep)

    bcap = per_dev_reads * (L - k + 1)
    rcap = route_capacity(bcap, n_dev)
    cstep = sharded_count_step(mesh, k, bcap, rcap)
    fstep = sharded_filter_step(mesh, k, 15, 1)
    dropped_boxes = []

    def count_epoch():
        dev = ShardedKmerTable(mesh, k, capacity=4 * bcap)
        for b in batches:
            bk, bc, _, dr = cstep(b)
            # virtual CPU devices share one thread pool: force the
            # all_to_all to finish before fold partitions can occupy it
            jax.block_until_ready(bk)
            dev.fold_batch(bk, bc)
            dropped_boxes.append(dr)
        dev.flush()  # folds are buffered; charge them to the epoch
        return dev

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

    total = B * iters
    n_dropped = int(sum(int(np.asarray(d).sum()) for d in dropped_boxes))
    assert n_dropped == 0, f"routing bins overflowed ({n_dropped} keys)"
    return {
        "devices": n_dev,
        "reads": total,
        "count_reads_per_s": round(total / count_s, 1),
        "filter_reads_per_s": round(total / filter_s, 1),
        # checkable exchange-volume model: per-peer bin width is
        # O(bcap/n), so per-device all_to_all volume stays O(batch)
        "route_cap_per_peer": rcap,
        "exchanged_bytes_per_device_per_batch": n_dev * rcap * 12,
        "useful_payload_bytes_per_device_per_batch": bcap * 12,
    }


def main():
    import multiprocessing

    results = [bench_mesh(n) for n in (1, 2, 4, 8)]
    base_c = results[0]["count_reads_per_s"]
    base_f = results[0]["filter_reads_per_s"]
    for r in results:
        n = r["devices"]
        r["count_scaling_eff"] = round(r["count_reads_per_s"] / (base_c * n), 3)
        r["filter_scaling_eff"] = round(r["filter_reads_per_s"] / (base_f * n), 3)
    ncpu = multiprocessing.cpu_count()
    for r in results:
        # with n virtual devices on ncpu cores and constant per-device
        # work, the compute-bound weak-scaling ceiling is ncpu/n
        ceil = min(1.0, ncpu / r["devices"])
        r["host_bound_ceiling"] = round(ceil, 3)
        r["count_eff_vs_host_ceiling"] = round(
            r["count_scaling_eff"] / ceil, 3)
    out = {
        "mode": "weak scaling, fixed per-device batch (2048 reads x 160bp)",
        "host_physical_cores": ncpu,
        "caveat": "virtual CPU devices oversubscribe the host cores: with "
                  "constant per-device work the wall-clock ceiling is "
                  "ncpu/n, so compare count_eff_vs_host_ceiling (collective "
                  "+ dispatch overhead), not raw efficiency, against the "
                  ">=80% ICI target; exchanged_bytes per device is constant "
                  "in n (the O(batch) routing model, checkable above)",
        "results": results,
    }
    print(json.dumps(out, indent=1))
    tag = sys.argv[1] if len(sys.argv) > 1 else "r02"
    with open(f"SCALING_{tag}.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
