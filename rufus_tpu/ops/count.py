"""K-mer counting as device sort + run-length-encode over sorted tables.

TPU-native replacement for the reference's Jellyfish counting engine
(reference: src/modifiedJellyfish/include/jellyfish/large_hash_array.hpp
lock-free CAS hash + hash_counter.hpp cooperative resize).  TPUs have no
atomics, so instead of open addressing we use the hardware-friendly
formulation: pack -> canonicalize -> sort -> segment-reduce.  A sample's
count table is a sorted unique ``(kmer, count)`` pair of arrays; batches
are RLE'd on device and folded in LSM fashion.  This is deterministic and
independent of batch/shard boundaries, which the VCF-parity requirement
needs (SURVEY.md section 7.3).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import codec

# All-ones sentinel sorts last; valid for k <= 31 (k=32 poly-T would alias).
SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _next_head_after(head: jax.Array, n: int):
    """For each position i, the index of the next run head AFTER i (n if
    none) — a reverse cumulative min, no scatter."""
    idx = jnp.arange(n, dtype=jnp.int32)
    marks = jnp.where(head, idx, jnp.int32(n))
    nxt_ge = jnp.flip(jax.lax.cummin(jnp.flip(marks)))
    return jnp.concatenate([nxt_ge[1:], jnp.full((1,), n, jnp.int32)])


@jax.jit
def rle_sum(sorted_keys: jax.Array, values: jax.Array):
    """Run-length sum of `values` over equal runs of `sorted_keys`.

    Scatter-free (TPU scatters serialize): run boundaries come from a
    reverse scan, run sums from a cumsum difference. Output is NOT
    compacted — entry i holds (key, sum) iff i is the head of a non-
    sentinel run, else (SENTINEL, 0). n_unique counts the real runs;
    callers filter by key != SENTINEL.
    """
    n = sorted_keys.shape[0]
    head = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    nxt = _next_head_after(head, n)
    c = jnp.cumsum(values)
    c_prev = jnp.concatenate([jnp.zeros((1,), values.dtype), c[:-1]])
    end = jnp.minimum(nxt, n) - 1
    sums = c[end] - c_prev
    valid_head = head & (sorted_keys != SENTINEL)
    uniq = jnp.where(valid_head, sorted_keys, SENTINEL)
    sums = jnp.where(valid_head, sums, 0)
    return uniq, sums, valid_head.sum()


@jax.jit
def count_batch(kmers: jax.Array, valid: jax.Array):
    """Sort+RLE one flat batch of k-mers -> (unique_keys, counts, n_unique).

    Counting fast path: run length = next_head - index, entirely gather-
    and scatter-free. Same non-compacted output contract as rle_sum.
    """
    keys = jnp.where(valid, kmers, SENTINEL).ravel()
    s = jnp.sort(keys)
    n = s.shape[0]
    head = jnp.concatenate([jnp.ones((1,), dtype=bool), s[1:] != s[:-1]])
    nxt = _next_head_after(head, n)
    run_len = (nxt - jnp.arange(n, dtype=jnp.int32)).astype(jnp.int64)
    valid_head = head & (s != SENTINEL)
    uniq = jnp.where(valid_head, s, SENTINEL)
    counts = jnp.where(valid_head, run_len, 0)
    return uniq, counts, valid_head.sum()


@functools.partial(jax.jit, static_argnames=("k",))
def count_reads_batch(ascii_reads: jax.Array, k: int):
    """ASCII read batch (B, L) -> canonical-kmer RLE counts.

    The fused hot path of Jellyfish `count -C` (count_main.cc): encode,
    window, canonicalize, sort, segment-reduce.  Padding bytes / N map to
    invalid windows.
    """
    codes = codec.encode_bases(ascii_reads)
    kmers, valid = codec.pack_kmers(codes, k)
    canon = codec.canonical_kmers(kmers, k)
    return count_batch(canon, valid)


@jax.jit
def count_batch_hilo(hi, lo):
    """Sort+RLE canonical k-mers given as (B, W) u32 (hi, lo) planes (the
    pallas_count.encode_canon_hilo layout) -> (u64 keys, counts, n).

    Native u32 compares end to end: lax.sort(num_keys=2) avoids the
    emulated-u64 comparator and the u64 recombine happens once, after the
    sort, on the already-reduced output.
    """
    h = hi.ravel()
    l = lo.ravel()
    h, l = jax.lax.sort((h, l), num_keys=2)
    n = h.shape[0]
    ones = jnp.uint32(0xFFFFFFFF)
    neq = (h[1:] != h[:-1]) | (l[1:] != l[:-1])
    head = jnp.concatenate([jnp.ones((1,), bool), neq])
    nxt = _next_head_after(head, n)
    run_len = (nxt - jnp.arange(n, dtype=jnp.int32)).astype(jnp.int64)
    valid_head = head & ~((h == ones) & (l == ones))
    keys = (h.astype(jnp.uint64) << jnp.uint64(32)) | l.astype(jnp.uint64)
    uniq = jnp.where(valid_head, keys, SENTINEL)
    counts = jnp.where(valid_head, run_len, 0)
    return uniq, counts, valid_head.sum()


def count_reads_batch_fast(ascii_reads, k: int):
    """count_reads_batch with the fused pallas front end when the default
    backend is a TPU (B must be a multiple of pallas_count.BLK); identical
    output contract, bit-identical results (tested)."""
    from . import pallas_count

    B = ascii_reads.shape[0]
    use_pallas = (jax.default_backend() == "tpu"
                  and B % pallas_count.BLK == 0)
    if use_pallas:
        hi, lo = pallas_count.encode_canon_hilo(ascii_reads, k)
    else:
        hi, lo = pallas_count.encode_canon_hilo_xla(ascii_reads, k)
    return count_batch_hilo(hi, lo)


@jax.jit
def merge_sorted(a_keys, a_counts, b_keys, b_counts):
    """Merge two sorted unique (keys, counts) runs -> sorted RLE result."""
    keys = jnp.concatenate([a_keys, b_keys])
    cnts = jnp.concatenate([a_counts, b_counts])
    order = jnp.argsort(keys)
    return rle_sum(keys[order], cnts[order])


class KmerTable:
    """A sample's k-mer count table: host-resident sorted unique arrays.

    Equivalent role to a `.Jhash` file (reference: RunJellyForRUFUS.sh:29);
    serialization is npz + text dump (`kmer \\t count`, lexicographic order —
    numeric order of our packing IS lexicographic order).
    """

    def __init__(self, k: int, keys: np.ndarray, counts: np.ndarray):
        self.k = int(k)
        self.keys = np.asarray(keys, dtype=np.uint64)
        self.counts = np.asarray(counts, dtype=np.int64)

    def __len__(self):
        return len(self.keys)

    # -- construction -------------------------------------------------------

    @classmethod
    def from_rle_chunks(cls, k: int, chunks, lower_count: int = 0):
        """Fold per-batch RLE results (keys, counts, n) into one table.

        `lower_count` mirrors jellyfish `count -L`: k-mers with final count
        < L are dropped from the table (count_main.cc:320-330), which is
        load-bearing for merge "present in exactly one sample" semantics.
        """
        keys_list, cnt_list = [], []
        for keys, counts, n in chunks:
            keys = np.asarray(keys, dtype=np.uint64)
            counts = np.asarray(counts, dtype=np.int64)
            mask = keys != SENTINEL  # non-compacted device RLE output
            keys_list.append(keys[mask])
            cnt_list.append(counts[mask])
        if not keys_list:
            return cls(k, np.empty(0, np.uint64), np.empty(0, np.int64))
        keys = np.concatenate(keys_list)
        cnts = np.concatenate(cnt_list)
        order = np.argsort(keys, kind="stable")
        keys, cnts = keys[order], cnts[order]
        head = np.ones(len(keys), dtype=bool)
        head[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(head)
        sums = np.add.reduceat(cnts, starts) if len(cnts) else cnts
        ukeys = keys[starts]
        if lower_count > 1:
            keep = sums >= lower_count
            ukeys, sums = ukeys[keep], sums[keep]
        return cls(k, ukeys, sums)

    @classmethod
    def from_strings(cls, k: int, seqs, lower_count: int = 0, canonical: bool = True):
        """Count canonical k-mers of arbitrary host strings (testing/small)."""
        counts: dict[int, int] = {}
        for s in seqs:
            su = s.upper()
            for i in range(len(su) - k + 1):
                w = su[i : i + k]
                if any(c not in "ACGT" for c in w):
                    continue
                if canonical:
                    w = codec.canonical_str(w)
                v = codec.str_to_kmer(w)
                counts[v] = counts.get(v, 0) + 1
        items = sorted(counts.items())
        if lower_count > 1:
            items = [kv for kv in items if kv[1] >= lower_count]
        keys = np.array([kv[0] for kv in items], dtype=np.uint64)
        cnts = np.array([kv[1] for kv in items], dtype=np.int64)
        return cls(k, keys, cnts)

    # -- queries ------------------------------------------------------------

    def query(self, kmers: np.ndarray) -> np.ndarray:
        """Batched point lookup -> counts (0 when absent).

        Replaces `jellyfish query` (CheckJellyHashList.sh:12); caller is
        responsible for canonicalizing query k-mers.
        """
        kmers = np.asarray(kmers, dtype=np.uint64)
        idx = np.searchsorted(self.keys, kmers)
        idx_c = np.minimum(idx, max(len(self.keys) - 1, 0))
        if len(self.keys) == 0:
            return np.zeros(len(kmers), dtype=np.int64)
        hit = self.keys[idx_c] == kmers
        return np.where(hit, self.counts[idx_c], 0)

    def query_strs(self, seqs) -> np.ndarray:
        canon = [codec.canonical_str(s.upper()) for s in seqs]
        return self.query(codec.strs_to_kmers(canon, self.k))

    def histo(self, max_count: int = 10001,
              chunk: int = 1 << 26) -> np.ndarray:
        """Count histogram; bin i = #kmers with count i (i>=1), last bin
        accumulates the tail — matches `jellyfish histo` defaults
        (histo_main.cc: low=1, high=10000, increment=1). Chunked so a
        memmap-backed (spilled) WGS table histograms in O(chunk) RSS."""
        out = np.zeros(max_count + 1, np.int64)
        for off in range(0, len(self.counts), chunk):
            c = np.minimum(np.asarray(self.counts[off:off + chunk]),
                           max_count)
            out += np.bincount(c, minlength=max_count + 1)
        return out

    # -- serialization ------------------------------------------------------

    def save(self, path: str):
        np.savez(path, k=self.k, keys=self.keys, counts=self.counts)

    @classmethod
    def load(cls, path: str):
        z = np.load(path)
        return cls(int(z["k"]), z["keys"], z["counts"])

    def dump_text(self, path: str):
        with open(path, "w") as f:
            for s, c in zip(codec.kmers_to_strs(self.keys, self.k), self.counts):
                f.write(f"{s} {c}\n")

    # flat binary layout: 4-byte magic + 4 pad (8-ALIGNS the u64 planes:
    # a misaligned memmap sends np.searchsorted down a ~1000x slower
    # unaligned path), u64 k, u64 n, n*u64 keys, n*i64 counts
    FLAT_MAGIC = b"RTK2"

    def save_flat(self, path: str):
        """Page-aligned-friendly flat table for out-of-core queries
        (RUFUS.search.1kg.cpp role: its mmap+binary-search over a sorted
        hash file, checkPage:135 / search:214, becomes np.memmap +
        searchsorted — only O(log n) pages fault per lookup, so huge
        population tables (1000-Genomes) never need to fit in RAM)."""
        with open(path, "wb") as f:
            f.write(self.FLAT_MAGIC + b"\0\0\0\0")
            np.array([self.k, len(self.keys)], dtype="<u8").tofile(f)
            self.keys.astype("<u8").tofile(f)
            self.counts.astype("<i8").tofile(f)

    @classmethod
    def load_flat(cls, path: str, mmap: bool = True):
        """Open a flat table; with mmap=True the arrays are demand-paged
        (searchsorted in `query` works on memmaps unchanged)."""
        with open(path, "rb") as f:
            if f.read(4) != cls.FLAT_MAGIC:
                raise ValueError(f"{path}: not a flat k-mer table")
            f.read(4)
            k, n = (int(v) for v in np.fromfile(f, dtype="<u8", count=2))
        off = 8 + 16
        if mmap:
            keys = np.memmap(path, dtype="<u8", mode="r", offset=off, shape=(n,))
            counts = np.memmap(path, dtype="<i8", mode="r", offset=off + 8 * n,
                               shape=(n,))
        else:
            with open(path, "rb") as f:
                f.seek(off)
                keys = np.fromfile(f, dtype="<u8", count=n)
                counts = np.fromfile(f, dtype="<i8", count=n)
        t = cls.__new__(cls)
        t.k, t.keys, t.counts = k, keys.view(np.uint64), counts.view(np.int64)
        return t


def merge_flat_runs(run_paths: list[str], out_path: str,
                    lower_count: int = 0, chunk: int = 1 << 24):
    """Streaming k-way merge-SUM of sorted-unique flat runs into one
    flat table, applying the `-L` floor on the FINAL counts.

    The LSM spill regime (jellyfish --disk, count_main.cc:318-338): when
    one sample's table + fold transient exceed the HBM budget, counting
    spills the table as a sorted run and restarts empty; runs OVERLAP in
    key space, so the reduce is a merge-sum, not a concat. Chunks are
    cut at a key bound every active run is consumed to (side='right'),
    so each merged chunk's keys are FINAL — the floor applies per chunk.
    O(chunk) resident; runs stream from memmap."""
    tabs = [KmerTable.load_flat(p) for p in run_paths]
    k = tabs[0].k
    cursors = [0] * len(tabs)
    kf = open(out_path + ".keys.tmp", "wb")
    cf = open(out_path + ".counts.tmp", "wb")
    n_out = 0
    while True:
        bounds = []
        for t, c in zip(tabs, cursors):
            if c < len(t.keys):
                bounds.append(np.uint64(
                    t.keys[min(c + chunk, len(t.keys)) - 1]))
        if not bounds:
            break
        bound = min(bounds)
        parts_k, parts_c = [], []
        for i, t in enumerate(tabs):
            c = cursors[i]
            if c >= len(t.keys):
                continue
            win = np.asarray(t.keys[c:c + chunk])
            e = c + int(np.searchsorted(win, bound, side="right"))
            if e > c:
                parts_k.append(win[: e - c])
                parts_c.append(np.asarray(t.counts[c:e]))
                cursors[i] = e
        ks = np.concatenate(parts_k)
        cs = np.concatenate(parts_c)
        order = np.argsort(ks, kind="stable")
        ks, cs = ks[order], cs[order]
        head = np.ones(len(ks), bool)
        head[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(head)
        sums = np.add.reduceat(cs, starts) if len(cs) else cs
        uk = ks[starts]
        if lower_count > 1:
            keep = sums >= lower_count
            uk, sums = uk[keep], sums[keep]
        uk.astype("<u8").tofile(kf)
        sums.astype("<i8").tofile(cf)
        n_out += len(uk)
    kf.close()
    cf.close()
    with open(out_path, "wb") as f:
        f.write(KmerTable.FLAT_MAGIC + b"\0\0\0\0")
        np.array([k, n_out], dtype="<u8").tofile(f)
        for tmp in (out_path + ".keys.tmp", out_path + ".counts.tmp"):
            with open(tmp, "rb") as src:
                while True:
                    buf = src.read(1 << 24)
                    if not buf:
                        break
                    f.write(buf)
            os.remove(tmp)
    return KmerTable.load_flat(out_path)


def concat_flat(part_paths: list[str], out_path: str,
                chunk: int = 1 << 24):
    """Splice ordered flat-table runs into one flat table file.

    The multipass counting flow (jellyfish --disk's sorted-run dump,
    count_main.cc:318-338) writes one flat run per disjoint ascending
    key range; the final table is their byte-level concatenation —
    keys sections in order, then counts sections in order — with a
    summed header. O(chunk) memory."""
    heads = []
    for p in part_paths:
        with open(p, "rb") as f:
            if f.read(4) != KmerTable.FLAT_MAGIC:
                raise ValueError(f"{p}: not a flat k-mer table")
            f.read(4)
            k, n = (int(v) for v in np.fromfile(f, dtype="<u8", count=2))
            heads.append((k, n))
    k = heads[0][0]
    n_total = sum(n for _, n in heads)
    off0 = 8 + 16

    def copy_section(dst, src_path, src_off, nbytes):
        with open(src_path, "rb") as src:
            src.seek(src_off)
            left = nbytes
            while left > 0:
                buf = src.read(min(chunk, left))
                dst.write(buf)
                left -= len(buf)

    with open(out_path, "wb") as f:
        f.write(KmerTable.FLAT_MAGIC + b"\0\0\0\0")
        np.array([k, n_total], dtype="<u8").tofile(f)
        for p, (_, n) in zip(part_paths, heads):
            copy_section(f, p, off0, 8 * n)
        for p, (_, n) in zip(part_paths, heads):
            copy_section(f, p, off0 + 8 * n, 8 * n)
    return KmerTable.load_flat(out_path)


def build_hashlist_4col(subject: KmerTable, parents: list[KmerTable],
                        min_cov_subject: int, max_cov_control: int,
                        max_coverage: int = 1200):
    """Legacy RUFUS.Build path (RUFUS.Build.cpp:224-283): the streaming
    merge-join of subject vs parent dumps becomes vectorized table queries.

    Returns (keys, total_parent_depth, subject_count) for subject k-mers
    with count in [min_cov_subject, max_coverage] and summed parent count
    <= max_cov_control — rows of the 4-col HashList
    `longhash \\t parentDepth \\t subjCount \\t kmer`.
    """
    keep = (subject.counts >= min_cov_subject) & (subject.counts <= max_coverage)
    keys = subject.keys[keep]
    scnt = subject.counts[keep]
    total_par = np.zeros(len(keys), dtype=np.int64)
    for p in parents:
        total_par += p.query(keys)
    keep2 = total_par <= max_cov_control
    return keys[keep2], total_par[keep2], scnt[keep2]


def population_filter(mutant: KmerTable, population: KmerTable,
                      max_pop_depth: int):
    """RUFUS.1kg.filter role: drop mutant k-mers whose population-table
    count exceeds max_pop_depth (e.g. 1000-Genomes common k-mers)."""
    pop = population.query(mutant.keys)
    keep = pop <= max_pop_depth
    return KmerTable(mutant.k, mutant.keys[keep], mutant.counts[keep])


def subtract_unique(tables: list[KmerTable], merge_min: int = 5) -> np.ndarray:
    """K-mers present in EXACTLY ONE table with that table's count >= merge_min.

    The reference's modified-merge semantics (merge_files.cc:147-153): the
    k-way heap merge over sorted .Jhash streams becomes a vectorized
    concat + sort + run-length test over sorted tables.  Returns the sorted
    canonical k-mer keys (counts are re-pulled from the subject by the
    caller, mirroring CheckJellyHashList.sh:12).
    """
    if not tables:
        return np.empty(0, np.uint64)
    keys = np.concatenate([t.keys for t in tables])
    cnts = np.concatenate([t.counts for t in tables])
    order = np.argsort(keys, kind="stable")
    keys, cnts = keys[order], cnts[order]
    head = np.ones(len(keys), dtype=bool)
    if len(keys) > 1:
        head[1:] = keys[1:] != keys[:-1]
    tail = np.ones(len(keys), dtype=bool)
    if len(keys) > 1:
        tail[:-1] = keys[1:] != keys[:-1]
    singleton = head & tail
    keep = singleton & (cnts >= merge_min)
    return keys[keep]


def subtract_unique_stream(tables: list[KmerTable], merge_min: int,
                           min_cov: int, max_depth: int,
                           chunk: int = 1 << 24):
    """FUSED modified-merge + subject count-range pull, streaming over
    the subject in chunks — O(chunk) resident, memmap-friendly: the
    host-side counterpart of parallel.sharded_subtract_step for the
    spilled (out-of-HBM, WGS) regime.

    Semantics identical to the sharded step's fusion of
    merge_files.cc:147-153 with CheckJellyHashList.sh:12 (min_cov >= 1):
    SUBJECT keys absent from EVERY control with subject count in
    [max(merge_min, min_cov), max_depth]. Returns (keys, subject_counts),
    sorted."""
    subj = tables[0]
    lo = max(merge_min, min_cov)
    out_k, out_c = [], []
    n = len(subj.keys)
    for off in range(0, n, chunk):
        ks = np.asarray(subj.keys[off:off + chunk])
        cs = np.asarray(subj.counts[off:off + chunk])
        keep = (cs >= lo) & (cs <= max_depth)
        for t in tables[1:]:
            if len(t.keys) == 0 or not keep.any():
                continue
            idx = np.searchsorted(t.keys, ks)
            idxc = np.minimum(idx, len(t.keys) - 1)
            keep &= np.asarray(t.keys[idxc]) != ks
        out_k.append(ks[keep])
        out_c.append(cs[keep])
    if not out_k:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    return np.concatenate(out_k), np.concatenate(out_c)
