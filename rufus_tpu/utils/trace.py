"""Tracing / profiling helpers.

The reference instruments its hot loops with ad-hoc wall/CPU timers and
reads-per-second prints (RUFUS.Filter.cpp:178-183, OverlapSam.cpp:879-882,
Overlap.cpp:952-964) and probes its own RSS/VM from /proc
(Util.cpp:224-261, used at RUFUS.interpret.cpp:5593-5597).  This module is
the structured equivalent: stage timers with throughput meters and a
process-memory probe, emitted through one logger so a whole pipeline run
yields a machine-readable trace.
"""

from __future__ import annotations

import json
import os
import sys
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


def rss_mb() -> float:
    """Current resident set size in MB (the reference parses
    /proc/self/stat in Util.cpp:224-261; status is the friendlier file)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def vm_mb() -> float:
    """Current virtual memory size in MB (Util.cpp vm_usage)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmSize:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def banner(msg: str, stream=None):
    """Stage banner line (runRufus.sh echoes one per stage, :390-419)."""
    stream = stream or sys.stderr
    print(f"~~~ {msg} ~~~", file=stream, flush=True)


@dataclass
class Throughput:
    """Items/second meter with periodic reporting, the structured form of
    the reference's `reads so far ... reads/sec` prints
    (RUFUS.Filter.cpp:178-183)."""

    name: str = "items"
    report_every: int = 1_000_000
    stream: object = None
    t0: float = field(default_factory=time.perf_counter)
    n: int = 0
    _next: int = 0

    def __post_init__(self):
        self._next = self.report_every

    def add(self, n: int):
        self.n += n
        if self.n >= self._next:
            self._next += self.report_every
            self.report()

    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.n / dt if dt > 0 else 0.0

    def report(self):
        print(f"{self.name}: {self.n} so far, {self.rate():.0f}/s, "
              f"rss={rss_mb():.0f}MB", file=self.stream or sys.stderr,
              flush=True)


class StageTimer:
    """Collects per-stage wall/CPU timings + memory high-water marks and
    can dump the whole trace as JSON (one object per stage)."""

    def __init__(self, log_path: str | None = None):
        self.stages: list[dict] = []
        self.log_path = log_path

    @contextmanager
    def stage(self, name: str, **meta):
        banner(name)
        w0, c0 = time.perf_counter(), time.process_time()
        rec = {"stage": name, **meta}
        try:
            yield rec
        finally:
            rec["wall_s"] = round(time.perf_counter() - w0, 3)
            rec["cpu_s"] = round(time.process_time() - c0, 3)
            rec["rss_mb"] = round(rss_mb(), 1)
            self.stages.append(rec)
            if self.log_path:
                with open(self.log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")

    def summary(self) -> str:
        lines = []
        for s in self.stages:
            lines.append(f"{s['stage']:<24} wall={s['wall_s']:>8.2f}s "
                         f"cpu={s['cpu_s']:>8.2f}s rss={s['rss_mb']:>7.1f}MB")
        return "\n".join(lines)


def progress_file(path: str):
    """Chromosome-progress writer: append each new reference name seen so a
    caller can verify a stream ran to completion (PassThroughSamCheck.cpp
    argv[1]; checked via `tail -n 1 ... = "booya"` RunRUFUS.Trio.sh:83).

    Returns (note(chr), done()) callables."""
    seen = set()
    f = open(path, "w")

    def note(chrom: str):
        if chrom not in seen:
            seen.add(chrom)
            f.write(chrom + "\n")
            f.flush()

    def done():
        f.write("booya\n")
        f.close()

    return note, done
