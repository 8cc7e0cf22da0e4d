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
    from rufus_tpu.parallel import (ShardedKmerTable, local_count_step,
                                    make_mesh, make_splitters,
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
    cstep = local_count_step(mesh, K)
    fstep = sharded_filter_step(mesh, K, 15, 1)

    # splitters from the first batch (the driver flow)
    bk0, _ = cstep(batches[0])
    splitters = make_splitters(bk0, n_dev)

    def mk_table():
        t = ShardedKmerTable(mesh, K, capacity=4 * bcap)
        t.splitters = splitters
        return t

    def count_epoch():
        dev = mk_table()
        for b in batches:
            bk, _nn = cstep(b)
            dev.fold_batch(bk)
        dev.flush()
        return dev

    # All timings are BEST-OF-N (min wall / min cpu): the harness shares
    # a 2-core host with itself (n virtual devices oversubscribe the
    # cores) plus whatever else the box runs, and single-shot walls
    # fluctuate 30%+ run to run; the min over repeats approximates the
    # uncontended time and is what the ceiling-normalized efficiencies
    # should compare.
    REPS = 5

    def timeit(fn, *a):
        jax.block_until_ready(fn(*a))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    def cpu_timeit(fn, *a):
        """(wall_s, cpu_s) per call, each the min over repeats —
        CPU-seconds are oversubscription-robust on a virtual mesh: if
        per-read CPU cost stays flat as n grows, the chain scales
        (collective/dispatch overhead is the only thing that could
        grow it)."""
        jax.block_until_ready(fn(*a))
        bw = bc = float("inf")
        for _ in range(REPS):
            c0, t0 = time.process_time(), time.perf_counter()
            jax.block_until_ready(fn(*a))
            bw = min(bw, time.perf_counter() - t0)
            bc = min(bc, time.process_time() - c0)
        return bw, bc

    # warm up compiles (count step + flush shapes + filter)
    count_epoch()
    fstep(batches[0], quals, lens, table).block_until_ready()

    def count_once():
        dev = count_epoch()
        jax.block_until_ready((dev.keys, dev.counts))
        return dev

    count_s, count_cpu_s = cpu_timeit(count_once)
    dev = count_once()

    def filter_once():
        return [fstep(b, quals, lens, table) for b in batches]

    filter_s, filter_cpu_s = cpu_timeit(filter_once)

    # phase probes: per-batch work is ENCODE ONLY under the combiner
    # flow; the flush splits into local partial sort+RLE, the routed
    # exchange of unique pairs, and the fold
    ph_encode = timeit(lambda b: cstep(b)[0], batches[0])
    dev2 = mk_table()
    for b in batches:
        bk, _nn = cstep(b)
        dev2.fold_batch(bk)
    bk_all = jnp.concatenate([k for k, _ in dev2._pending], axis=-1)
    per_dev = bk_all.shape[-1]
    part_cap = -(-per_dev // 128) * 128
    pstep = shmod._local_partial_step(mesh, part_cap)
    ph_partial = timeit(lambda: pstep(bk_all)[0])
    pk, pc, nu = pstep(bk_all)
    rcap = route_capacity(int(np.asarray(nu).max()), n_dev)
    rep = jax.sharding.NamedSharding(mesh, P())
    split_dev = jax.device_put(jnp.asarray(splitters, jnp.uint64), rep)
    rstep = shmod._route_partials_step(mesh, rcap)
    ph_route = timeit(lambda: rstep(pk, pc, split_dev)[0])
    rk, rc, dr = rstep(pk, pc, split_dev)
    assert int(np.asarray(dr).sum()) == 0
    fold = shmod.sharded_fold_step(mesh, dev.capacity, False)
    dev3 = mk_table()
    ph_fold = timeit(lambda: fold(dev3.keys, dev3.counts, rk, rc)[0])
    ph_local = ph_encode + ph_partial
    ph_step = ph_local + ph_route

    # ---- subtract (3 samples) + routed query ----
    sub = sharded_subtract_step(mesh, 3)
    tabs = []
    for s in range(3):
        d = mk_table()
        bk3, _nn3 = cstep(batches[s % iters])
        d.fold_batch(bk3)
        d.flush()
        tabs.append(d)
    mm = jnp.asarray(2, jnp.int64)
    mc = jnp.asarray(2, jnp.int64)
    md = jnp.asarray(10 ** 9, jnp.int64)

    def sub_once():
        return sub([t.keys for t in tabs], [t.counts for t in tabs],
                   mm, mc, md)[0]

    ph_subtract, ph_subtract_cpu = cpu_timeit(sub_once)

    # routed query = the trio genotyping pull: ONE dispatch answers all 3
    # sample tables (sharded_query_multi — route/return amortize over
    # samples). Phase probes are cumulative prefixes of the same traced
    # code: dispatch(owner+sort+cut)+exchange -> +answer(bisection) ->
    # +return+unroute.
    qcap = 1 << 14
    T = 3
    # realistic queries: genotype pulls look up CANONICAL k-mers (contig
    # + ref-context windows), i.e. the same distribution the range
    # splitters were built from — uniform-random u64 queries would pile
    # into whichever shard owns the key ranges canonicalization never
    # produces and route pathologically
    pool = np.asarray(bk0).ravel()
    pool = pool[pool != (np.uint64(0xFFFFFFFFFFFFFFFF))]
    q_host = pool[rng.integers(0, len(pool), size=n_dev * qcap)] \
        .reshape(n_dev, qcap)
    # exact per-peer bin width from the host owner mirror — the driver's
    # production sizing (no slack inflation, no overflow retry)
    rcap_q = shmod.exact_route_cap(q_host, n_dev, np.asarray(splitters))
    queries = jax.device_put(jnp.asarray(q_host), sh)
    tkeys = [t.keys for t in tabs]
    tcnts = [t.counts for t in tabs]
    qargs = (queries, tkeys, tcnts, split_dev)

    mstep = shmod._sharded_query_multi(mesh, K, qcap, T, rcap_q, True,
                                       upto="permuted")
    q_route = shmod._sharded_query_multi(mesh, K, qcap, T, rcap_q, True,
                                         upto="route")
    q_answer = shmod._sharded_query_multi(mesh, K, qcap, T, rcap_q, True,
                                          upto="answer")
    rows_idx = np.arange(n_dev)[:, None]

    def q_once():
        # the production pull: device route+answer+return, host unroute
        # (one vectorized copy — cheaper than a device payload sort)
        arr = np.asarray(mstep(*qargs)[0])
        idx = arr[0].astype(np.int64)
        res = np.empty((T, n_dev, qcap), arr.dtype)
        res[:, rows_idx, idx] = arr[1:]
        return res

    # honesty check: the measured dispatch must answer EVERY query
    assert int(np.asarray(mstep(*qargs)[1]).sum()) == 0, \
        "query benchmark dropped lookups — sizing bug"
    ph_query, ph_query_cpu = cpu_timeit(q_once)
    t_route = timeit(lambda: q_route(*qargs)[0])
    t_answer = timeit(lambda: q_answer(*qargs)[0])
    query_phase_ms = {
        "route_exchange": round(t_route * 1e3, 2),
        "answer_bisect": round((t_answer - t_route) * 1e3, 2),
        "return_unroute": round((ph_query - t_answer) * 1e3, 2),
        "note": "cumulative-prefix probes of the production "
                "sharded_query_multi trace (3-table trio pull); "
                "route/return are paid once per dispatch, answer once "
                "per sample table",
    }
    # lookups = queries x tables: the reference runs one jellyfish query
    # per sample (Overlap.shorter.sh:265-303), so a 3-table dispatch
    # performs 3 pulls' worth of lookups
    n_queries = n_dev * qcap * T

    # single-table routed query kept for continuity with r2-r4 numbers
    qstep = sharded_query_step(mesh, K, qcap, by_splitters=True)

    def q1_once():
        return qstep(queries, tabs[0].keys, tabs[0].counts, split_dev)[0]

    assert int(np.asarray(qstep(queries, tabs[0].keys, tabs[0].counts,
                                split_dev)[1]).sum()) == 0
    ph_q1, ph_q1_cpu = cpu_timeit(q1_once)

    total = B * iters
    return {
        "devices": n_dev,
        "reads": total,
        "count_reads_per_s": round(total / count_s, 1),
        "filter_reads_per_s": round(total / filter_s, 1),
        "count_cpu_us_per_read": round(count_cpu_s / total * 1e6, 2),
        "filter_cpu_us_per_read": round(filter_cpu_s / total * 1e6, 2),
        "subtract_ms": round(ph_subtract * 1e3, 2),
        "subtract_cpu_s_per_shard_slot": round(
            ph_subtract_cpu / n_dev, 4),
        "query_lookups_per_s": round(n_queries / ph_query, 1),
        "query_cpu_us_per_lookup": round(
            ph_query_cpu / n_queries * 1e6, 3),
        "query_phase_ms": query_phase_ms,
        "query_single_lookups_per_s": round(n_dev * qcap / ph_q1, 1),
        "query_single_cpu_us_per_lookup": round(
            ph_q1_cpu / (n_dev * qcap) * 1e6, 3),
        "phase_ms": {
            "encode_per_batch": round(ph_encode * 1e3, 2),
            "flush_partial_sort": round(ph_partial * 1e3, 2),
            "flush_route_exchange": round(ph_route * 1e3, 2),
            "flush_fold": round(ph_fold * 1e3, 2),
            "note": "per-batch work is encode-only under the "
                    "local-aggregate (combiner) flow; the three flush "
                    "phases amortize over every batch in the pending "
                    "buffer",
        },
        # the combiner payoff, checkable: the exchange moves O(unique)
        # slots per flush, not O(windows) per batch
        "flush_route_cap_per_peer": rcap,
        "exchanged_bytes_per_device_per_flush": n_dev * rcap * 12,
        "pending_window_keys_per_device_per_flush": per_dev,
        "unique_keys_per_device_at_flush": int(np.asarray(nu).max()),
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


def _merge_best(a, b):
    """Elementwise-best of two harness passes: throughputs take the max,
    times/costs the min, phase dicts follow the pass with the lower
    total. Run-to-run wall variance on the oversubscribed 2-core host is
    +-15%; the best-of statistic measures the chain's capability, not
    the box's ambient load."""
    out = dict(a)
    for k, va in a.items():
        vb = b[k]
        if isinstance(va, (int, float)) and not isinstance(va, bool):
            if k.endswith(("per_s",)):
                out[k] = max(va, vb)
            elif k.endswith(("_ms", "_us_per_read", "_us_per_lookup",
                             "_per_shard_slot")):
                out[k] = min(va, vb)
    for pk in ("phase_ms", "query_phase_ms"):
        if pk in a:
            ta = sum(v for v in a[pk].values() if isinstance(v, float))
            tb = sum(v for v in b[pk].values() if isinstance(v, float))
            out[pk] = a[pk] if ta <= tb else b[pk]
    return out


def main():
    import multiprocessing

    results = [_merge_best(bench_mesh(n), bench_mesh(n))
               for n in (1, 2, 4, 8)]
    spec1 = bench_specialized_n1()
    base_c = results[0]["count_reads_per_s"]
    base_f = results[0]["filter_reads_per_s"]
    base_q = results[0]["query_lookups_per_s"]
    base_ccpu = results[0]["count_cpu_us_per_read"]
    base_fcpu = results[0]["filter_cpu_us_per_read"]
    base_qcpu = results[0]["query_cpu_us_per_lookup"]
    base_scpu = results[0]["subtract_cpu_s_per_shard_slot"]
    for r in results:
        n = r["devices"]
        r["count_scaling_eff"] = round(r["count_reads_per_s"] / (base_c * n), 3)
        r["filter_scaling_eff"] = round(r["filter_reads_per_s"] / (base_f * n), 3)
        r["query_scaling_eff"] = round(
            r["query_lookups_per_s"] / (base_q * n), 3)
        # CPU-normalized weak-scaling efficiency: per-read CPU cost at
        # n=1 over at n. Oversubscription-robust (the wall-clock ceiling
        # on a 2-core host with n virtual devices is dominated by core
        # sharing, not by the collectives this target is about).
        r["count_eff_cpu"] = round(
            base_ccpu / r["count_cpu_us_per_read"], 3)
        r["filter_eff_cpu"] = round(
            base_fcpu / r["filter_cpu_us_per_read"], 3)
        r["query_eff_cpu"] = round(
            base_qcpu / r["query_cpu_us_per_lookup"], 3)
        r["subtract_eff_cpu"] = round(
            base_scpu / r["subtract_cpu_s_per_shard_slot"], 3)
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
