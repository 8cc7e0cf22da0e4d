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


def malloc_trim() -> bool:
    """Return freed-but-retained glibc arena pages to the OS. Host stages
    that churn millions of small objects (per-read str decode in the
    filter/count feeders) grow the heap arenas; glibc keeps the freed
    space resident, which reads as a leak in RSS. Safe no-op elsewhere."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        return bool(libc.malloc_trim(0))
    except OSError:  # non-glibc platform
        return False


def _mallinfo_mb():
    """(in_use_mb, free_retained_mb) from glibc mallinfo2 — attributes
    how much of RSS is live heap vs freed-but-retained arena space."""
    try:
        import ctypes

        class _MI2(ctypes.Structure):
            _fields_ = [(n, ctypes.c_size_t) for n in
                        ("arena", "ordblks", "smblks", "hblks", "hblkhd",
                         "usmblks", "fsmblks", "uordblks", "fordblks",
                         "keepcost")]

        libc = ctypes.CDLL("libc.so.6")
        libc.mallinfo2.restype = _MI2
        mi = libc.mallinfo2()
        return (round((mi.uordblks + mi.hblkhd) / 1e6, 1),
                round(mi.fordblks / 1e6, 1))
    except (OSError, AttributeError):
        return (0.0, 0.0)


def memory_attribution(trim: bool = False) -> dict:
    """RSS broken into named owners (the round-4 verdict's 'unattributed
    21 GB' directive):

    * jax_live_mb — bytes of live jax.Array buffers per platform. On the
      axon relay the client keeps a host-side mirror of device buffers,
      so device-resident tables SHOW UP IN HOST RSS here; on a local
      PCIe TPU they would not.
    * heap_in_use_mb / heap_retained_mb — glibc live allocations vs
      freed-but-kept arena pages (churn fragmentation; `trim` returns
      the latter to the OS).
    * rss_mb — the total the pieces must explain.
    """
    out = {"rss_mb": round(rss_mb(), 1)}
    try:
        import jax

        per: dict[str, float] = {}
        for a in jax.live_arrays():
            try:
                plat = a.devices().pop().platform
                per[plat] = per.get(plat, 0.0) + a.nbytes / 1e6
            except Exception:
                pass
        out["jax_live_mb"] = {k: round(v, 1) for k, v in per.items()}
    except Exception:
        out["jax_live_mb"] = {}
    in_use, retained = _mallinfo_mb()
    out["heap_in_use_mb"] = in_use
    out["heap_retained_mb"] = retained
    if trim:
        trimmed = malloc_trim()
        out["rss_after_trim_mb"] = round(rss_mb(), 1)
        out["trimmed"] = trimmed
    return out


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
        self.current: str = ""  # live stage name, readable by samplers

    @contextmanager
    def stage(self, name: str, **meta):
        banner(name)
        self.current = name
        w0, c0 = time.perf_counter(), time.process_time()
        rec = {"stage": name, **meta}
        try:
            yield rec
        finally:
            rec["wall_s"] = round(time.perf_counter() - w0, 3)
            rec["cpu_s"] = round(time.process_time() - c0, 3)
            rec["rss_mb"] = round(rss_mb(), 1)
            # attribute the stage-end RSS (jax buffers / heap / retained
            # arenas) and give freed arena pages back to the OS so one
            # stage's churn doesn't read as the next stage's footprint
            rec["mem"] = memory_attribution(trim=True)
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


class MemSampler:
    """Background thread recording memory_attribution() every `interval`
    seconds, tagged with the StageTimer's live stage — gives INTRA-stage
    peaks (stage-end RSS misses transient highs) with named owners.
    Writes one JSON object per sample to `path` when given."""

    def __init__(self, timer: "StageTimer", path: str | None = None,
                 interval: float = 10.0):
        import threading

        self.timer = timer
        self.path = path
        self.interval = interval
        self.samples: list[dict] = []
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.wait(self.interval):
            rec = {"t": round(time.time(), 1),
                   "stage": self.timer.current,
                   **memory_attribution()}
            self.samples.append(rec)
            if self.path:
                try:
                    with open(self.path, "a") as f:
                        f.write(json.dumps(rec) + "\n")
                except OSError:
                    pass

    def start(self):
        self._t.start()
        return self

    def stop(self):
        self._stop.set()
        self._t.join(timeout=2 * self.interval)

    def per_stage_peaks(self) -> dict:
        """stage -> the sample with the highest RSS seen in that stage."""
        peaks: dict[str, dict] = {}
        for s in self.samples:
            st = s.get("stage") or "(pre)"
            if st not in peaks or s["rss_mb"] > peaks[st]["rss_mb"]:
                peaks[st] = s
        return peaks


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
