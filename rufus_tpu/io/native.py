"""ctypes bindings for the native C++ I/O runtime (native/bamdecode.cpp).

`NativeBam` mirrors the Python reader's batch interface but decodes BGZF
blocks with a thread pool and parses records in C++ — the host-side
throughput path that keeps device batches fed. Falls back silently if the
shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "librufus_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        try:  # attempt an on-demand build (g++ is baked into the image)
            subprocess.run(["make", "-C", os.path.dirname(path)],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.bam_open.restype = ctypes.c_void_p
    lib.bam_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.bam_num_records.restype = ctypes.c_long
    lib.bam_num_records.argtypes = [ctypes.c_void_p]
    lib.bam_read_batch.restype = ctypes.c_long
    lib.bam_read_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_long,
    ]
    lib.bam_reset.argtypes = [ctypes.c_void_p]
    lib.bam_close.argtypes = [ctypes.c_void_p]
    try:
        lib.bam_read_pair_batch.restype = ctypes.c_long
        lib.bam_read_pair_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long, ctypes.c_long,
        ]
    except AttributeError:  # older .so without the pair API
        lib.bam_read_pair_batch = None
    try:
        lib.fastq_open.restype = ctypes.c_void_p
        lib.fastq_open.argtypes = [ctypes.c_char_p]
        lib.fastq_read_batch.restype = ctypes.c_long
        lib.fastq_read_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)]
        lib.fastq_close.argtypes = [ctypes.c_void_p]
        lib.fastq_pair_open.restype = ctypes.c_void_p
        lib.fastq_pair_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.fastq_pair_read_batch.restype = ctypes.c_long
        lib.fastq_pair_read_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32)]
        lib.fastq_pair_close.argtypes = [ctypes.c_void_p]
    except AttributeError:  # older .so without the fastq API
        lib.fastq_open = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeBam:
    """Batch reader over a BAM file using the native decoder."""

    def __init__(self, path: str, threads: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.bam_open(path.encode(), threads)
        if not self._h:
            raise IOError(f"failed to open {path}")

    def __len__(self):
        return int(self._lib.bam_num_records(self._h))

    def read_batch(self, capacity: int, pad_len: int,
                   exclude_flags: int = 0xD00):
        """-> (seq (n,pad) uint8, qual (n,pad) uint8, lens (n,) int32)."""
        seq = np.full((capacity, pad_len), ord("N"), np.uint8)
        qual = np.full((capacity, pad_len), ord("!"), np.uint8)
        lens = np.zeros(capacity, np.int32)
        n = self._lib.bam_read_batch(
            self._h, exclude_flags,
            seq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            qual.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            capacity, pad_len)
        return seq[:n], qual[:n], lens[:n]

    def read_pair_batch(self, capacity: int, pad_len: int,
                        exclude_flags: int = 0xD00):
        """Paired pass-through batch (PassThroughSamCheck.stranded role,
        same pairing/strand semantics as io.bam.bam_to_paired_fastq) ->
        (names list[str], s1, q1, l1, s2, q2, l2) numpy arrays."""
        if getattr(self._lib, "bam_read_pair_batch", None) is None:
            raise RuntimeError("native pair API unavailable")
        mk = lambda: np.full((capacity, pad_len), ord("N"), np.uint8)
        s1, s2 = mk(), mk()
        q1 = np.full((capacity, pad_len), ord("!"), np.uint8)
        q2 = np.full((capacity, pad_len), ord("!"), np.uint8)
        l1 = np.zeros(capacity, np.int32)
        l2 = np.zeros(capacity, np.int32)
        name_cap = capacity * 256
        names_buf = np.zeros(name_cap, np.uint8)
        name_lens = np.zeros(capacity, np.int32)
        u8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        n = self._lib.bam_read_pair_batch(
            self._h, exclude_flags, u8p(s1), u8p(q1), i32p(l1),
            u8p(s2), u8p(q2), i32p(l2), u8p(names_buf), name_cap,
            i32p(name_lens), capacity, pad_len)
        names = []
        off = 0
        raw = names_buf.tobytes()
        for i in range(n):
            ln = int(name_lens[i])
            names.append(raw[off : off + ln].decode())
            off += ln
        return names, s1[:n], q1[:n], l1[:n], s2[:n], q2[:n], l2[:n]

    def reset(self):
        self._lib.bam_reset(self._h)

    def close(self):
        if self._h:
            self._lib.bam_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeFastq:
    """Batch reader over a plain/gzip FASTQ using the native chunked
    scanner (fastqdecode.cpp) — the fastq counterpart of NativeBam."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None or getattr(lib, "fastq_open", None) is None:
            raise RuntimeError("native fastq decoder unavailable")
        self._lib = lib
        self._h = lib.fastq_open(path.encode())
        if not self._h:
            raise IOError(f"failed to open {path}")

    def read_batch(self, capacity: int, pad_len: int):
        seq = np.empty((capacity, pad_len), np.uint8)
        lens = np.zeros(capacity, np.int32)
        n = self._lib.fastq_read_batch(
            self._h, capacity, pad_len,
            seq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if n < 0:
            raise IOError("malformed FASTQ record")
        return seq[:n], lens[:n]

    def close(self):
        if self._h:
            self._lib.fastq_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeFastqPairs:
    """Lockstep paired-FASTQ batch reader (R1 + R2) — the filter stage's
    fast path for -q1/-q2 inputs (runRufus.sh:971-983 role)."""

    def __init__(self, path1: str, path2: str):
        lib = _load()
        if lib is None or getattr(lib, "fastq_open", None) is None:
            raise RuntimeError("native fastq decoder unavailable")
        self._lib = lib
        self._h = lib.fastq_pair_open(path1.encode(), path2.encode())
        if not self._h:
            raise IOError(f"failed to open {path1}/{path2}")
        self._name_cap = 1 << 20

    def read_pair_batch(self, capacity: int, pad_len: int):
        """-> (names list[str], s1, q1, l1, s2, q2, l2)."""
        mk = lambda: np.empty((capacity, pad_len), np.uint8)
        s1, q1, s2, q2 = mk(), mk(), mk(), mk()
        l1 = np.zeros(capacity, np.int32)
        l2 = np.zeros(capacity, np.int32)
        u8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        while True:
            names_buf = np.zeros(self._name_cap, np.uint8)
            name_off = np.zeros(capacity + 1, np.int32)
            n = self._lib.fastq_pair_read_batch(
                self._h, capacity, pad_len, u8p(s1), u8p(q1), i32p(l1),
                u8p(s2), u8p(q2), i32p(l2), u8p(names_buf), self._name_cap,
                i32p(name_off))
            if n == -2:
                self._name_cap *= 2
                continue
            if n < 0:
                raise IOError("malformed FASTQ pair stream")
            break
        raw = names_buf.tobytes()
        names = [raw[name_off[i]:name_off[i + 1] - 1].decode()
                 for i in range(n)]
        return names, s1[:n], q1[:n], l1[:n], s2[:n], q2[:n], l2[:n]

    def close(self):
        if self._h:
            self._lib.fastq_pair_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
