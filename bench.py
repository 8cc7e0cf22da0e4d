#!/usr/bin/env python
"""Benchmark: k-mer count + mutant-read filter throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is the BASELINE.json headline — reads/s/chip through the two
hot device kernels that replace Jellyfish `count -C` and RUFUS.Filter:
fused = 1 / (1/count_rps + 1/filter_rps).

vs_baseline compares against the reference toolchain measured on this
host (2 CPU threads, 200k x 150bp synthetic reads, 2026-08-17):
jellyfish count 20.4k reads/s + RUFUS.Filter 92k reads/s -> fused
16.6k reads/s (see tests/golden fixtures provenance; reference repo
publishes no numbers — BASELINE.md).
"""

import json
import sys
import time

import numpy as np

BASELINE_FUSED_READS_S = 16_600.0

B, L, K = 65536, 160, 25
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    import rufus_tpu  # noqa: F401  (enables x64)
    from rufus_tpu.ops import count, filter as rfilter

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    # DISTINCT batches per iteration: the axon relay can elide repeated
    # identical dispatches, which silently inflates throughput otherwise
    batches = [jax.device_put(jnp.asarray(rng.choice(bases, size=(B, L))))
               for _ in range(ITERS)]
    quals = jax.device_put(jnp.full((B, L), ord("I"), jnp.uint8))
    lens = jax.device_put(jnp.full((B,), 150, jnp.int32))
    table = np.sort(rng.integers(0, 1 << 50, size=65536, dtype=np.uint64))
    bloom = jax.device_put(jnp.asarray(rfilter.build_bloom(table)))

    def run_count(reads):
        keys, counts, n = count.count_reads_batch(reads, K)
        return n

    def run_filter(reads):
        # the pipeline filter hot path: device Bloom probe (candidates are
        # host-verified exactly; none arise on random data)
        return rfilter.window_candidate_hits(reads, quals, lens, bloom, K, 15)

    # Force uploads + compiles before timing; time with a single REDUCED
    # fetch over all outputs (block_until_ready alone under-reports through
    # the axon relay, and repeated identical dispatches can be elided).
    for b in batches:
        int(b.sum())
    int(run_count(batches[0]))
    int(run_filter(batches[0]).sum())

    t0 = time.perf_counter()
    outs = [run_count(b) for b in batches]
    acc = outs[0]
    for o in outs[1:]:
        acc = acc + o
    int(acc)
    count_rps = B * ITERS / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    outs = [run_filter(b).sum() for b in batches]
    acc = outs[0]
    for o in outs[1:]:
        acc = acc + o
    int(acc)
    filter_rps = B * ITERS / (time.perf_counter() - t0)

    fused = 1.0 / (1.0 / count_rps + 1.0 / filter_rps)
    print(json.dumps({
        "metric": "kmer count+filter throughput (k=25, 150bp reads)",
        "value": round(fused, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(fused / BASELINE_FUSED_READS_S, 2),
        "detail": {
            "count_reads_per_s": round(count_rps, 1),
            "filter_reads_per_s": round(filter_rps, 1),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
