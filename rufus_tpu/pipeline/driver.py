"""The RUFUS pipeline: count -> model -> subtract -> filter -> assemble ->
align -> interpret -> polish (runRufus.sh + Overlap.shorter.sh equivalent).

Every stage writes its outputs into the workdir using the reference's file
naming and is skipped when the output already exists (the reference's
resume semantics, runRufus.sh:844-951), so stages can be re-run alone.
Device work (counting, filtering) is batched through the jit kernels in
ops/; host work (assembly, interpret) mirrors the reference semantics.
"""

from __future__ import annotations

import functools
import os
import queue
import threading
from dataclasses import dataclass

import numpy as np

from .config import RufusConfig
from .polish import polish_vcf
from ..align import Aligner, RefIndex
from ..align import sam as rsam
from ..assembly import annotate
from ..assembly.overlap_sam import overlap_sam
from ..assembly.overlap_rounds import overlap_round, overlap_region
from ..io import bam, bwaindex, fasta, fastq, hashlist as hio
from ..models import modeldist
from ..ops import codec, count
from ..interpret import run_interpret
from ..interpret.driver import load_mob_sam
from ..utils import shims
from ..utils.trace import StageTimer, Throughput


@dataclass
class SamLikeRec:
    flag: int
    seq: str
    qual: str
    tlen: int = 0


class RufusPipeline:
    def __init__(self, cfg: RufusConfig):
        self.cfg = cfg
        os.makedirs(cfg.workdir, exist_ok=True)
        os.makedirs(cfg.wpath("Intermediates"), exist_ok=True)
        os.makedirs(cfg.wpath("TempOverlap"), exist_ok=True)
        self._ref_contigs = None
        self._ref_index = None
        self._log = print
        self.trace = StageTimer(log_path=cfg.wpath("Intermediates",
                                                   "trace.jsonl"))
        # The device mesh: ALL stages' device work goes through the
        # parallel/ sharded chain. With one device the chain degenerates
        # to collective-free local kernels (all_to_all is skipped), so one
        # code path serves single-chip bench and multi-chip pods alike.
        import jax

        from ..parallel import make_mesh

        n = 1 if cfg.sharded == "off" else len(jax.devices())
        self.mesh = make_mesh(n)
        self.n_devices = n
        self._dev_tables: dict = {}  # stub -> ShardedKmerTable (resident)
        self._spill = None  # decided from the first table vs HBM budget
        self._pass_bounds = None  # multipass count key-range boundaries
        self._unpack_rq: dict = {}  # per-length packed-transport unpackers
        self._route_cap = None  # per-peer all_to_all bin width (grows on
        # overflow, the lossless retry protocol of sharded_count_step)
        self._splitters = None  # range-partition boundaries shared by
        # every sample's device table (local-aggregate count flow)

    # -- reference handling -------------------------------------------------

    def ref_contigs(self):
        if self._ref_contigs is None:
            path = self.cfg.ref
            if os.path.exists(path):
                fr = fasta.FastaReference(path)
                self._ref_contigs = {n: fr.seqs[n] for n in fr.names}
            elif os.path.exists(path + ".pac"):
                self._ref_contigs = bwaindex.load_pac_reference(path)
            else:
                raise FileNotFoundError(f"reference not found: {path}")
        return self._ref_contigs

    def ref_index(self):
        if self._ref_index is None:
            if self.cfg.flat_index:
                from ..align.aligner import build_flat_index, open_flat_index

                if not os.path.exists(self.cfg.flat_index):
                    self._log(f"building flat seed index "
                              f"{self.cfg.flat_index} (one-time)")
                    build_flat_index(self.ref_contigs(), self.cfg.flat_index)
                self._ref_index = open_flat_index(self.cfg.flat_index)
            else:
                self._ref_index = RefIndex(self.ref_contigs())
        return self._ref_index

    # -- stage 1: count -----------------------------------------------------

    def _read_stream(self, path: str, progress_path: str | None = None):
        # comma-separated fastq pairs are read in sequence (the reference's
        # FastqToSam generator shim, runRufus.sh:159-168)
        for part in path.split(","):
            if part.endswith((".fastq", ".fq", ".fastq.gz", ".fq.gz")):
                for _, s, _ in fastq.read_fastq(part):
                    yield s
            elif part.endswith(".cram"):
                from ..io import cram

                for _, s, _ in cram.cram_to_fastq(
                        part, self.ref_contigs(),
                        progress_path=progress_path):
                    yield s
                progress_path = None
            else:
                for _, s, _ in bam.bam_to_fastq(part,
                                                progress_path=progress_path):
                    yield s
                progress_path = None  # one progress file per stream

    def _batch_stream(self, path: str, progress_path: str | None = None):
        """Yield fixed-shape (batch_size, read_pad) uint8 base matrices
        (rows past the data are 'N' — invalid, produce no k-mers).

        progress_path writes the chromosome-progress / stream-completion
        file (PassThroughSamCheck.cpp:30-158 role, RunJellyForRUFUS.sh:28):
        the pure-Python decoder logs chromosome transitions; the native and
        fastq paths log the completion sentinel only."""
        cfg = self.cfg
        is_fastq = path.endswith((".fastq", ".fq", ".fastq.gz", ".fq.gz"))
        use_native = not is_fastq and not path.endswith(".cram")
        if use_native:
            try:
                from ..io import native

                nb = native.NativeBam(path, threads=cfg.threads)
            except Exception:
                use_native = False
        if use_native:
            while True:
                seq, _, _ = nb.read_batch(cfg.batch_size, cfg.read_pad)
                if len(seq) == 0:
                    break
                if len(seq) < cfg.batch_size:
                    pad = np.full((cfg.batch_size - len(seq), cfg.read_pad),
                                  ord("N"), np.uint8)
                    seq = np.concatenate([seq, pad])
                yield seq
            if progress_path:  # clean EOF from the native decoder
                with open(progress_path, "w") as pf:
                    pf.write("notachr\n" + bam.STREAM_SENTINEL + "\n")
        elif is_fastq:
            # native chunked-memchr fastq scanner (6.8M reads/s measured
            # vs ~0.5M for the python line parser) with python fallback;
            # comma-separated paths stream in sequence (counting R1,R2
            # without materializing a concatenated copy — at WGS scale
            # the .all file would double the fastq footprint on disk)
            for part in path.split(","):
                nf = None
                try:
                    from ..io import native

                    nf = native.NativeFastq(part)
                except Exception:
                    nf = None
                if nf is not None:
                    while True:
                        seq, lens = nf.read_batch(cfg.batch_size,
                                                  cfg.read_pad)
                        if len(seq) == 0:
                            break
                        if len(seq) < cfg.batch_size:
                            pad = np.full(
                                (cfg.batch_size - len(seq), cfg.read_pad),
                                ord("N"), np.uint8)
                            seq = np.concatenate([seq, pad])
                        yield seq
                    nf.close()
                else:
                    yield from self._python_fastq_batches(part)
            if progress_path:
                with open(progress_path, "w") as pf:
                    pf.write("notachr\n" + bam.STREAM_SENTINEL + "\n")
        else:
            batch: list[str] = []
            for s in self._read_stream(path, progress_path=progress_path):
                batch.append(s)
                if len(batch) >= cfg.batch_size:
                    r, _, _ = fastq.batch_reads(batch, pad_to=cfg.read_pad)
                    yield r
                    batch = []
            if batch:
                r, _, _ = fastq.batch_reads(batch, pad_to=cfg.read_pad)
                pad = np.full((cfg.batch_size - len(r), cfg.read_pad),
                              ord("N"), np.uint8)
                yield np.concatenate([r, pad])

    def _python_fastq_batches(self, path: str):
        cfg = self.cfg
        batch: list[str] = []
        for s in self._read_stream(path, progress_path=None):
            batch.append(s)
            if len(batch) >= cfg.batch_size:
                r, _, _ = fastq.batch_reads(batch, pad_to=cfg.read_pad)
                yield r
                batch = []
        if batch:
            r, _, _ = fastq.batch_reads(batch, pad_to=cfg.read_pad)
            pad = np.full((cfg.batch_size - len(r), cfg.read_pad),
                          ord("N"), np.uint8)
            yield np.concatenate([r, pad])

    @staticmethod
    def _prefetch(gen, depth: int = 3):
        """Run a generator in a background thread so host decode overlaps
        device work — the FIFO process-pipelining role (generator ->
        PassThroughSamCheck -> jellyfish, RunJellyForRUFUS.sh:23-29) and
        the single-chip answer to -pj per-sample jobs (runRufus.sh:766-797):
        sample N+1's BAM decode proceeds under sample N's device folds."""
        q: queue.Queue = queue.Queue(maxsize=depth)
        DONE = object()

        def worker():
            try:
                for item in gen:
                    q.put(item)
                q.put(DONE)
            except BaseException as e:  # surface decode errors in consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is DONE:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def _device_prefetch(self, stream, sharding, depth: int = 2):
        """Feed read batches to the device with (a) transfers issued a
        batch ahead from a feeder thread (h2d overlaps the fold — the
        FIFO role of runRufus.sh:924-927 at the h2d boundary) and (b)
        2-bit + N-mask PACKED transport (ops/pack.py): 3.56x fewer bytes
        cross the link, which converts a transport-bound feed into a
        compute-bound one (the bench relay moves ~56 MB/s; ASCII batches
        take 179 ms vs 66 ms of count compute — packed they fit under
        it). Unpack is a few fused u8 ops on device."""
        import jax
        import jax.numpy as jnp

        from ..ops import pack as rpack

        unpack: dict = {}

        def put(seq):
            packed, nmask = rpack.pack_reads(seq)
            return (jax.device_put(jnp.asarray(packed), sharding),
                    jax.device_put(jnp.asarray(nmask), sharding),
                    seq.shape[1])

        for pk, nm, L in self._prefetch((put(s) for s in stream),
                                        depth=depth):
            f = unpack.get(L)
            if f is None:
                f = jax.jit(functools.partial(rpack.unpack_reads_device,
                                              L=L))
                unpack[L] = f
            yield f(pk, nm)

    def count_sample(self, path: str, stub: str, lower: int, stream=None):
        """Count one sample's canonical k-mers into a device-resident
        prefix-sharded table (jellyfish `count -C -L lower` role,
        RunJellyForRUFUS.sh:28-29): stream batches -> sharded count step
        (one all_to_all) -> local LSM fold. Host memory stays O(batch);
        the table lives on device until gathered.

        Resume guard: outputs are only reused when the previous run's
        chromosome-progress file carries the completion sentinel — a
        crashed count leaves a truncated progress file and is redone
        (the RunRUFUS.Trio.sh:77 `tail -n 1 *.chr = booya` check)."""
        import jax
        import jax.numpy as jnp

        from ..parallel import (ShardedKmerTable, route_capacity,
                                sharded_count_step)

        cfg = self.cfg
        table_path = self.cfg.wpath(stub + ".table.npz")
        flat_path = self.cfg.wpath(stub + ".table.flat")
        histo_path = self.cfg.wpath(stub + ".Jhash.histo")
        progress_path = self.cfg.wpath(stub + ".Jelly.chr")
        if ((os.path.exists(table_path) or os.path.exists(flat_path))
                and os.path.exists(histo_path)):
            if (not os.path.exists(progress_path)
                    or bam.stream_complete(progress_path)):
                self._log(f"skipping count for {stub}")
                if os.path.exists(flat_path):
                    return count.KmerTable.load_flat(flat_path)
                return count.KmerTable.load(table_path)
            self._log(f"count for {stub}: outputs exist but the stream "
                      "never completed; recounting")
        mesh = self.mesh
        n_dev = self.n_devices
        bcap = (cfg.batch_size // n_dev) * (cfg.read_pad - cfg.k + 1)
        if self._route_cap is None:
            self._route_cap = route_capacity(bcap, n_dev)
        sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(mesh.axis_names[0]))
        if cfg.count_passes > 1:
            if n_dev != 1:
                raise NotImplementedError(
                    "count_passes>1 is single-device (a multi-chip mesh "
                    "already range-partitions the table across chips)")
            if stream is not None:
                raise ValueError("multipass counting re-streams the "
                                 "input; pass stream=None")
            return self._count_sample_multipass(
                path, stub, lower, cfg.count_passes, flat_path,
                histo_path, progress_path, sharding, bcap)
        meter = Throughput(name=f"count[{stub}] reads")
        if stream is None:
            stream = self._prefetch(
                self._batch_stream(path, progress_path=progress_path))
        dev = ShardedKmerTable(mesh, cfg.k, cfg.table_cap0)
        # out-of-HBM LSM guard: the fold's sort-merge transient costs
        # ~48 B/slot on top of the 16 B/slot table, so a per-shard
        # capacity past the budget would OOM the chip DURING the fold.
        # When a fold would need to grow past max_capacity, the
        # committed table spills to a sorted host run and counting
        # continues empty; runs merge-sum on host at the end (jellyfish
        # --disk's sorted-run regime, count_main.cc:245-246, 318-338).
        runs: list[str] = []
        if jax.default_backend() == "tpu" or cfg.spill_tables == "on":
            budget_slots = int(cfg.hbm_budget_gb * (1 << 30) / 64
                               / max(1, n_dev))
            max_cap = 1 << max(7, budget_slots.bit_length() - 1)
            dev.max_capacity = max(max_cap, cfg.table_cap0)

            def _spill_run(t):
                rp = flat_path + f".run{len(runs)}"
                t.to_flat(rp)
                t.reset()
                runs.append(rp)
                self._log(f"count[{stub}]: HBM budget reached — spilled "
                          f"run {len(runs)} ({t.capacity} slots/shard)")

            dev.overflow_spill = _spill_run
            # pending must flush before its unique count can exceed the
            # budget, or the spill-retry could never make progress
            dev._pending_budget = min(dev._pending_budget,
                                      dev.max_capacity // 2)
        if n_dev > 1:
            # LOCAL-AGGREGATE path (combiner idiom): batches stay device-
            # local with zero per-batch collectives — identical per-batch
            # work to the single-chip path — and the flush routes only
            # the locally-unique (key, count) pairs at the range
            # splitters. Flush-level route overflow is detected and
            # retried wider inside the table (lossless).
            from ..parallel import local_count_step, make_splitters

            lstep = local_count_step(mesh, cfg.k)
            # one partition for the whole run: every sample's table must
            # share it (the subtract is local per shard only because
            # partitions align). Splitters come from SEVERAL spaced
            # batches — coordinate-sorted BAM input makes any single
            # batch one genomic locality whose k-mer quantiles skew the
            # genome-wide partition — frozen before the first flush
            # needs them (folds only buffer until the pending budget).
            split_pool: list = []
            for reads_d in self._device_prefetch(stream, sharding):
                bk, _nn = lstep(reads_d)
                if self._splitters is None:
                    split_pool.append(bk)
                    if (len(split_pool) >= 16
                            or dev._pending_els + bk.shape[-1]
                            >= dev._pending_budget):
                        self._splitters = make_splitters(split_pool, n_dev)
                        self._log(f"count routing: {n_dev} shards, range "
                                  f"splitters from the first "
                                  f"{len(split_pool)} batches "
                                  f"(local-aggregate flush)")
                        split_pool = []
                dev.splitters = self._splitters
                dev.fold_batch(bk)
                meter.add(reads_d.shape[0])
            if self._splitters is None:
                # short stream: freeze from whatever was seen
                self._splitters = make_splitters(split_pool, n_dev)
                split_pool = []
                dev.splitters = self._splitters
        else:
            # single chip: raw keys defer everything to the fold
            step = sharded_count_step(mesh, cfg.k, bcap, self._route_cap)
            for reads_d in self._device_prefetch(stream, sharding):
                bk, bc, _, _dr = step(reads_d)
                dev.fold_batch(bk, bc)
                meter.add(reads_d.shape[0])
        if not bam.stream_complete(progress_path):
            raise RuntimeError(
                f"count stream for {path} ended without the completion "
                f"sentinel ({progress_path})")
        if runs:
            # LSM run mode: final table joins the runs, host merge-sums
            # with the -L floor applied on FINAL counts (count_main.cc
            # -L semantics; runs overlap in key space so per-run floors
            # would drop split counts)
            dev.flush()
            rp = flat_path + f".run{len(runs)}"
            dev.to_flat(rp)
            runs.append(rp)
            dev.release()
            table = count.merge_flat_runs(runs, flat_path,
                                          lower_count=lower)
            for rp in runs:
                os.remove(rp)
            self._spill = True
            if len(table) == 0:
                raise RuntimeError(f"counting produced no kmers for {path}")
            modeldist.write_histo(histo_path, table.histo())
            self._log(f"count[{stub}]: {len(table)} unique kmers "
                      f"({len(runs)} spilled runs merged), "
                      f"{meter.rate():.0f} reads/s")
            import gc

            from ..utils import trace as _trace

            gc.collect()
            _trace.malloc_trim()
            return table
        if lower > 1:
            dev.apply_lower_count(lower)
        # release the error-kmer headroom the -L floor freed: the
        # subtract stage concats all samples' tables shard-wise, so dead
        # padding would multiply across samples in HBM
        dev.shrink()
        if self._spill is None:
            # spill decision, made once from the first finished table:
            # N similar-size samples resident at once vs the HBM budget
            # (jellyfish --disk role — count_main.cc:245-246)
            per = dev.keys.shape[0] * dev.capacity * 16
            n_samples = 1 + len(cfg.controls)
            self._spill = (cfg.spill_tables == "on"
                           or (cfg.spill_tables == "auto"
                               and jax.default_backend() == "tpu"
                               and per * n_samples
                               > cfg.hbm_budget_gb * (1 << 30)))
            if self._spill:
                self._log(f"spilling count tables to host memmaps "
                          f"({per/2**30:.1f} GiB x {n_samples} samples "
                          f"> {cfg.hbm_budget_gb} GiB HBM budget)")
        if self._spill:
            table = dev.to_flat(flat_path)
            dev.release()
        else:
            table = dev.to_host()
            self._dev_tables[stub] = dev
            table.save(table_path)
        if len(table) == 0:
            raise RuntimeError(f"counting produced no kmers for {path}")
        modeldist.write_histo(histo_path, table.histo())
        self._log(f"count[{stub}]: {len(table)} unique kmers, "
                  f"{meter.rate():.0f} reads/s")
        if self._spill:
            import gc

            from ..utils import trace as _trace

            gc.collect()
            _trace.malloc_trim()
        return table

    def _count_sample_multipass(self, path, stub, lower, passes,
                                flat_path, histo_path, progress_path,
                                sharding, bcap):
        """P passes over the input; pass p folds only keys in ascending
        range p (quantile boundaries from the first batch), spilling one
        flat run per pass — the final table is the runs' concatenation.
        Device memory stays ~1/P of the single-pass table + transient:
        the whole-genome regime where one sample's table alone would not
        leave HBM room for the fold's sort buffers (jellyfish --disk
        role, count_main.cc:245-246, 318-338)."""
        import jax
        import jax.numpy as jnp

        from ..parallel import (ShardedKmerTable, make_splitters,
                                sharded_count_step)

        cfg = self.cfg
        step = sharded_count_step(self.mesh, cfg.k, bcap, self._route_cap)
        mask_fn = jax.jit(
            lambda k_, lo, hi: jnp.where((k_ >= lo) & (k_ < hi), k_,
                                         count.SENTINEL))
        part_paths = []
        for p in range(passes):
            meter = Throughput(name=f"count[{stub}] pass{p} reads")
            stream = self._prefetch(self._batch_stream(
                path, progress_path=progress_path if p == 0 else None))
            dev = ShardedKmerTable(self.mesh, cfg.k, cfg.table_cap0)
            for reads_d in self._device_prefetch(stream, sharding):
                bk, bc, _, _dr = step(reads_d)
                if self._pass_bounds is None:
                    qs = make_splitters(bk, passes)
                    self._pass_bounds = np.concatenate(
                        [[np.uint64(0)], qs,
                         [count.SENTINEL]]).astype(np.uint64)
                    self._log(f"count multipass: {passes} key ranges, "
                              f"bounds from the first batch")
                bk = mask_fn(bk, jnp.uint64(self._pass_bounds[p]),
                             jnp.uint64(self._pass_bounds[p + 1]))
                dev.fold_batch(bk, bc)
                meter.add(reads_d.shape[0])
            if p == 0 and not bam.stream_complete(progress_path):
                raise RuntimeError(
                    f"count stream for {path} ended without the "
                    f"completion sentinel ({progress_path})")
            if lower > 1:
                dev.apply_lower_count(lower)
            dev.shrink()
            pp = flat_path + f".pass{p}"
            dev.to_flat(pp)
            dev.release()
            part_paths.append(pp)
            self._log(f"count[{stub}] pass {p}: spilled "
                      f"{meter.rate():.0f} reads/s")
        table = count.concat_flat(part_paths, flat_path)
        for pp in part_paths:
            os.remove(pp)
        self._spill = True  # downstream: host-stream subtract + pulls
        # drop the sample's transfer/staging buffers before the next one
        # (the relay client holds host-side buffers keyed to device
        # arrays; collect + trim returns them between samples)
        import gc

        from ..utils import trace as _trace

        gc.collect()
        _trace.malloc_trim()
        if len(table) == 0:
            raise RuntimeError(f"counting produced no kmers for {path}")
        modeldist.write_histo(histo_path, table.histo())
        self._log(f"count[{stub}]: {len(table)} unique kmers "
                  f"({passes} passes)")
        return table

    def stage_count(self):
        """Count all samples. Decode of EVERY sample runs in its own
        prefetch thread from the start (the reference's -pj per-sample
        jellyfish jobs, runRufus.sh:766-797): sample N+1's BAM decode
        overlaps sample N's device folds, bounded by the prefetch depth."""
        cfg = self.cfg
        jobs = [(cfg.subject, cfg.subject_stub, cfg.subject_low_k)] + [
            (c, cfg.control_stub(c), cfg.par_low_k) for c in cfg.controls]
        with self.trace.stage("count", samples=len(jobs),
                              devices=self.n_devices):
            streams = {}
            for path, stub, _ in jobs:
                table_path = cfg.wpath(stub + ".table.npz")
                flat_path = cfg.wpath(stub + ".table.flat")
                if cfg.count_passes == 1 and not (
                        os.path.exists(table_path)
                        or os.path.exists(flat_path)):  # skip-resume
                    streams[stub] = self._prefetch(self._batch_stream(
                        path, progress_path=cfg.wpath(stub + ".Jelly.chr")))
            done = [self.count_sample(path, stub, low,
                                      stream=streams.get(stub))
                    for path, stub, low in jobs]
        return {"subject": done[0], "controls": done[1:]}

    # -- stage 2: model -----------------------------------------------------

    def stage_model(self):
        cfg = self.cfg
        histo_path = cfg.wpath(cfg.subject_stub + ".Jhash.histo")
        model_path = histo_path + ".7.7.model"
        if cfg.exome:
            # synthetic model, no fit (runRufus.sh:878-893); no .dist exists
            if not cfg.min_cov:
                raise RuntimeError("min coverage (-m) required for exome runs")
            with open(model_path, "w") as f:
                f.write(f"3\n{cfg.min_cov}\n3.1392e+09\n1000000\n")
            return cfg.min_cov, 100000000
        if not os.path.exists(model_path):
            # --haploid switches to the ModelDist.haploid fit
            # (ModelDist.haploid.cpp:29-30): halved 1x peak, no het column,
            # 0.9 cutoff rule. The .model line layout (cutoff at line 2,
            # rawSC at line 4) is shared, so the parse below is common.
            fit = modeldist.fit_model(histo_path, cfg.k, 150,
                                      haploid=cfg.haploid)
            modeldist.write_outputs(fit, histo_path, haploid=cfg.haploid)
        if cfg.min_cov:
            # ModelDist still runs (interpret needs the .dist) but the
            # cutoff is overridden and MaxHashDepth keeps its seed
            # (runRufus.sh:873-876, :27)
            return cfg.min_cov, cfg.max_hash_depth_seed
        with open(model_path) as f:
            lines = f.read().split("\n")
        kcutoff = int(lines[1])
        raw_sc = int(lines[3])
        mutant_min_cov = kcutoff
        max_hash_depth = raw_sc * 5
        if mutant_min_cov < 2:
            raise RuntimeError(
                f"model couldn't pick a sensible lower cutoff ({mutant_min_cov})")
        return mutant_min_cov, max_hash_depth

    # -- stage 3: subtract --------------------------------------------------

    def stage_hashlist(self, tables, mutant_min_cov: int, max_hash_depth: int):
        cfg = self.cfg
        hl_path = cfg.wpath(f"{cfg.subject_stub}.k{cfg.k}_c{mutant_min_cov}.HashList")
        if os.path.exists(hl_path):
            self._log("skipping hashlist")
            return hl_path
        stubs = [cfg.subject_stub] + [cfg.control_stub(c)
                                      for c in cfg.controls]
        with self.trace.stage("hashlist", devices=self.n_devices) as rec:
            if all(s in self._dev_tables for s in stubs):
                # device path: tables stayed resident after counting; the
                # modified-merge + subject range filter is collective-free
                # per shard (sharded_subtract_step docstring)
                import jax.numpy as jnp

                from ..parallel import sharded_subtract_step

                devs = [self._dev_tables[s] for s in stubs]
                sub = sharded_subtract_step(self.mesh, len(devs))
                mut_d, scnt_d = sub([d.keys for d in devs],
                                    [d.counts for d in devs],
                                    jnp.int64(cfg.merge_min),
                                    jnp.int64(mutant_min_cov),
                                    jnp.int64(max_hash_depth))
                mut = np.asarray(mut_d).ravel()
                scnt = np.asarray(scnt_d).ravel()
                mask = mut != count.SENTINEL
                mut, subj = mut[mask], scnt[mask]
                order = np.argsort(mut)
                mut, subj = mut[order], subj[order]
                rec["path"] = "sharded"
            else:
                # host path (spilled memmap tables, or resume from disk):
                # chunked fused subtract — O(chunk) resident, pages of
                # flat tables fault in on demand
                mut, subj = count.subtract_unique_stream(
                    [tables["subject"]] + tables["controls"],
                    cfg.merge_min, mutant_min_cov, max_hash_depth)
                rec["path"] = "host-stream"
            if cfg.exclude_hash and os.path.exists(cfg.exclude_hash):
                ex = count.KmerTable.load(cfg.exclude_hash)
                keep = ex.query(mut) == 0
                mut, subj = mut[keep], subj[keep]
            hio.write_hashlist(hl_path, mut, subj, cfg.k)
            rec["n_mutant"] = int(len(mut))
        if len(mut) == 0:
            raise RuntimeError("empty HashList: no subject-unique kmers")
        return hl_path

    # -- stage 4: filter ----------------------------------------------------

    def stage_filter_single(self, hl_path: str):
        """Single-end filter (PassThroughSamCheck.stranded.se +
        RUFUS.Filter.single, runRufus.sh:1016-1041)."""
        import jax.numpy as jnp
        from ..ops import filter as rfilter

        cfg = self.cfg
        out_path = cfg.wpath(cfg.subject_stub + ".Mutations.fastq")
        if os.path.exists(out_path):
            self._log("skipping filter (se)")
            return out_path
        keys_np = hio.hashlist_keys(hl_path, cfg.k)
        self._hl_keys = keys_np
        self._bloom = jnp.asarray(rfilter.build_bloom(keys_np))
        kept = 0
        thr = cfg.filter_k_threshold
        with open(out_path + ".tmp", "w") as out:
            buf = []

            def flush():
                nonlocal kept
                if not buf:
                    return
                r, q, l = fastq.batch_reads([b[1] for b in buf],
                                            [b[2] for b in buf],
                                            pad_to=cfg.read_pad)
                if self.n_devices > 1:
                    keep = self._filter_sharded(r, q, l)
                    idxs = np.nonzero(keep)[0]
                    verify = False
                elif len(keys_np) <= rfilter.SMALL_TABLE_MAX:
                    # pallas fused kernel on TPU, XLA broadcast elsewhere
                    h = rfilter.small_table_hits_auto(
                        r, q, l, keys_np, cfg.k, cfg.filter_min_q)
                    idxs = np.nonzero(h >= thr)[0]
                    verify = False
                else:
                    h = np.asarray(rfilter.window_candidate_hits(
                        jnp.asarray(r), jnp.asarray(q), jnp.asarray(l),
                        self._bloom, cfg.k, cfg.filter_min_q))
                    idxs = np.nonzero(h >= thr)[0]
                    verify = True
                for i in idxs:
                    n, s, qq = buf[i]
                    if verify and rfilter.exact_hits_host(
                            s, qq, keys_np, cfg.k, cfg.filter_min_q) < thr:
                        continue
                    out.write(f"@{n}\n{s}\n+\n{qq}\n")
                    kept += 1
                buf.clear()

            if cfg.subject.endswith(".cram"):
                from ..io import cram

                se_stream = cram.cram_to_single_fastq(cfg.subject,
                                                      self.ref_contigs())
            else:
                se_stream = bam.bam_to_single_fastq(cfg.subject)
            for rec in se_stream:
                buf.append(rec)
                if len(buf) >= cfg.batch_size:
                    flush()
            flush()
        os.rename(out_path + ".tmp", out_path)  # crash-safe skip-resume
        if kept == 0:
            raise RuntimeError("filter kept no reads")
        self._log(f"filter kept {kept} reads (single-end)")
        return out_path

    def stage_filter(self, hl_path: str):
        import jax.numpy as jnp
        from ..ops import filter as rfilter

        cfg = self.cfg
        m1_path = cfg.wpath(cfg.subject_stub + ".Mutations.Mate1.fastq")
        m2_path = cfg.wpath(cfg.subject_stub + ".Mutations.Mate2.fastq")
        if os.path.exists(m1_path):
            self._log("skipping filter")
            return m1_path, m2_path
        keys_np = hio.hashlist_keys(hl_path, cfg.k)
        keys = jnp.asarray(keys_np)
        self._bloom = jnp.asarray(rfilter.build_bloom(keys_np))
        self._hl_keys = keys_np
        progress = cfg.wpath(cfg.subject_stub + ".filter.chr")
        array_batches = None
        pair_stream = None
        if cfg.fastq_a:
            from ..io import native

            if native.available():
                # array-native fast path: no per-read str churn
                array_batches = self._fastq_pair_batches(cfg.fastq_a,
                                                         cfg.fastq_b)
            else:
                pair_stream = self._fastq_pair_stream(cfg.fastq_a,
                                                      cfg.fastq_b)
        elif cfg.subject.endswith(".cram"):
            from ..io import cram

            pair_stream = cram.cram_to_paired_fastq(
                cfg.subject, self.ref_contigs(), progress_path=progress)
        else:
            # <gen>.filter.chr progress file (runRufus.sh:966); the C++
            # decoder's pair stream when available (same pairing/strand
            # semantics as bam_to_paired_fastq — keep-set parity tested),
            # pure Python otherwise
            pair_stream = self._paired_stream(cfg.subject, progress)
        kept = 0

        def batches():
            buf = []
            for rec in pair_stream:
                buf.append(rec)
                if len(buf) >= cfg.batch_size:
                    yield buf
                    buf = []
            if buf:
                yield buf

        # tmp + rename: a crash mid-stage must not leave partial outputs
        # that the skip-resume logic would trust on the next run
        with open(m1_path + ".tmp", "w") as f1, \
                open(m2_path + ".tmp", "w") as f2:
            # decode thread overlaps the device filter (the FIFO
            # process-pipelining role, as in the count stage)
            if array_batches is not None:
                for tup in self._prefetch(array_batches, depth=2):
                    kept += self._filter_batch_np(tup, f1, f2)
            else:
                for buf in self._prefetch(batches(), depth=2):
                    kept += self._filter_batch(buf, keys, f1, f2)
        os.rename(m1_path + ".tmp", m1_path)
        os.rename(m2_path + ".tmp", m2_path)
        if not cfg.fastq_a and not bam.stream_complete(progress):
            raise RuntimeError(
                f"filter stream ended without the completion sentinel "
                f"({progress})")
        if kept == 0:
            raise RuntimeError("filter kept no reads")
        self._log(f"filter kept {kept} pairs")
        return m1_path, m2_path

    def _fastq_pair_batches(self, a, b):
        """Raw numpy batch stream from the native paired decoder — no
        per-read Python strings. The per-read str path materializes
        20M+ small objects per 5M pairs; the churn grows glibc arenas by
        gigabytes at WGS scale (SCALE_r04's unattributed filter RSS) and
        costs ~2 us/read of decode. Batches are exactly batch_size rows
        (accumulated across native calls) so the filter kernel compiles
        once; arrays are trimmed to read_pad when every read fits."""
        from ..io import native

        np_ = native.NativeFastqPairs(a, b)
        cfg = self.cfg
        pad = max(cfg.read_pad, 1024)  # never truncate real reads
        cap = cfg.batch_size
        acc: list = []
        have = 0

        def emit(parts):
            names = [n for p in parts for n in p[0]]
            arrs = [np.concatenate([p[i] for p in parts])
                    if len(parts) > 1 else parts[0][i] for i in range(1, 7)]
            s1, q1, l1, s2, q2, l2 = arrs
            W = cfg.read_pad
            if int(l1.max(initial=0)) <= W and int(l2.max(initial=0)) <= W:
                s1, q1, s2, q2 = (s1[:, :W], q1[:, :W], s2[:, :W],
                                  q2[:, :W])
            return names, s1, q1, l1, s2, q2, l2

        while True:
            names, s1, q1, l1, s2, q2, l2 = np_.read_pair_batch(cap - have,
                                                                pad)
            if not names:
                break
            acc.append((names, s1, q1, l1, s2, q2, l2))
            have += len(names)
            if have >= cap:
                yield emit(acc)
                acc, have = [], 0
        if acc:
            yield emit(acc)
        np_.close()

    def _fastq_pair_stream(self, a, b):
        try:
            from ..io import native

            np_ = native.NativeFastqPairs(a, b)
        except Exception:
            np_ = None
        if np_ is not None:
            pad = max(self.cfg.read_pad, 1024)  # never truncate real reads
            while True:
                names, s1, q1, l1, s2, q2, l2 = np_.read_pair_batch(
                    4096, pad)
                if not names:
                    break
                for i, nm in enumerate(names):
                    x, y = int(l1[i]), int(l2[i])
                    yield (nm, s1[i, :x].tobytes().decode(),
                           q1[i, :x].tobytes().decode(),
                           s2[i, :y].tobytes().decode(),
                           q2[i, :y].tobytes().decode())
            np_.close()
            return
        for (n1, s1, q1), (_, s2, q2) in zip(fastq.read_fastq(a), fastq.read_fastq(b)):
            yield n1.split()[0], s1, q1, s2, q2

    def _filter_sharded(self, r, q, l):
        """Data-parallel exact filter over the mesh (replicated HashList);
        returns per-read hit counts >= threshold as a bool mask."""
        import jax
        import jax.numpy as jnp

        from ..parallel import sharded_filter_step

        cfg = self.cfg
        if getattr(self, "_fstep", None) is None:
            self._fstep = sharded_filter_step(self.mesh, cfg.k,
                                              cfg.filter_min_q,
                                              cfg.filter_k_threshold)
        n = self.n_devices
        B = r.shape[0]
        pad = (-B) % n
        if pad:
            r = np.concatenate([r, np.full((pad, r.shape[1]), ord("N"),
                                           np.uint8)])
            q = np.concatenate([q, np.full((pad, q.shape[1]), ord("!"),
                                           np.uint8)])
            l = np.concatenate([l, np.zeros(pad, l.dtype)])
        sh = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(self.mesh.axis_names[0]))
        rep = jax.sharding.NamedSharding(self.mesh,
                                         jax.sharding.PartitionSpec())
        keep = np.asarray(self._fstep(
            jax.device_put(jnp.asarray(r), sh),
            jax.device_put(jnp.asarray(q), sh),
            jax.device_put(jnp.asarray(l), sh),
            jax.device_put(jnp.asarray(self._hl_keys), rep)))
        return keep[:B]

    def _paired_stream(self, path: str, progress_path: str | None):
        """(name, s1, q1, s2, q2) pair stream for a BAM subject: native
        C++ decoder (thread-pool BGZF inflate + in-C pair matching) with
        the pure-Python reader as fallback/reference."""
        nb = None
        got_any = False
        try:
            from ..io import native

            nb = native.NativeBam(path, threads=max(self.cfg.threads, 2))
            pad = max(self.cfg.read_pad, 1024)  # never truncate real reads
            while True:
                names, s1, q1, l1, s2, q2, l2 = nb.read_pair_batch(2048, pad)
                if not names:
                    break
                got_any = True
                for i, nm in enumerate(names):
                    a, b = int(l1[i]), int(l2[i])
                    yield (nm, s1[i, :a].tobytes().decode(),
                           q1[i, :a].tobytes().decode(),
                           s2[i, :b].tobytes().decode(),
                           q2[i, :b].tobytes().decode())
            if progress_path:
                with open(progress_path, "w") as pf:
                    pf.write("notachr\n" + bam.STREAM_SENTINEL + "\n")
            return
        except (RuntimeError, OSError):
            # Falling back after pairs were already yielded would replay
            # the stream from the start and duplicate them — only the
            # never-started case may fall back to the Python reader.
            if got_any:
                raise
        finally:
            if nb is not None:
                nb.close()
        yield from bam.bam_to_paired_fastq(path, progress_path=progress_path)

    def _filter_batch(self, buf, keys, f1, f2) -> int:
        import jax.numpy as jnp
        from ..ops import filter as rfilter

        cfg = self.cfg
        r1, q1, l1 = fastq.batch_reads([p[1] for p in buf], [p[2] for p in buf],
                                       pad_to=cfg.read_pad)
        r2, q2, l2 = fastq.batch_reads([p[3] for p in buf], [p[4] for p in buf],
                                       pad_to=cfg.read_pad)
        thr = cfg.filter_k_threshold
        if self.n_devices > 1:
            # multi-chip: exact data-parallel filter over the mesh
            keep_idx = np.nonzero(self._filter_sharded(r1, q1, l1)
                                  | self._filter_sharded(r2, q2, l2))[0]
            verify = False
        elif len(self._hl_keys) <= rfilter.SMALL_TABLE_MAX:
            # small HashList (the typical de novo case): exact on device —
            # the fused Pallas kernel on TPU, XLA broadcast-compare off it
            c1 = rfilter.small_table_hits_auto(
                r1, q1, l1, self._hl_keys, cfg.k, cfg.filter_min_q)
            c2 = rfilter.small_table_hits_auto(
                r2, q2, l2, self._hl_keys, cfg.k, cfg.filter_min_q)
            keep_idx = np.nonzero((c1 >= thr) | (c2 >= thr))[0]
            verify = False
        else:
            # device Bloom pre-filter (superset) + exact host verify of the
            # rare candidates — keep set identical to the exact kernel
            c1 = np.asarray(rfilter.window_candidate_hits(
                jnp.asarray(r1), jnp.asarray(q1), jnp.asarray(l1), self._bloom,
                cfg.k, cfg.filter_min_q))
            c2 = np.asarray(rfilter.window_candidate_hits(
                jnp.asarray(r2), jnp.asarray(q2), jnp.asarray(l2), self._bloom,
                cfg.k, cfg.filter_min_q))
            keep_idx = np.nonzero((c1 >= thr) | (c2 >= thr))[0]
            verify = True
        kept = 0
        for idx in keep_idx:
            p = buf[idx]
            if verify:
                h1 = rfilter.exact_hits_host(p[1], p[2], self._hl_keys, cfg.k,
                                             cfg.filter_min_q)
                ok = h1 >= thr
                if not ok:
                    h2 = rfilter.exact_hits_host(p[3], p[4], self._hl_keys,
                                                 cfg.k, cfg.filter_min_q)
                    ok = h2 >= thr
                if not ok:
                    continue
            f1.write(f"@{p[0]}\n{p[1]}\n+\n{p[2]}\n")
            f2.write(f"@{p[0]}\n{p[3]}\n+\n{p[4]}\n")
            kept += 1
        return kept

    def _reads_h2d(self, r, q):
        """Packed-transport h2d for a filter batch on TPU: 2-bit + N-mask
        reads and a 1-bit min-q qual plane cross the link (4.2x fewer
        bytes), unpacked by fused u8 ops on device. Matters twice here:
        the link is the slow resource, and the relay client RETAINS a
        host copy of every byte ever transferred (measured, unbounded) —
        packed transport shrinks both. Elsewhere returns host arrays
        (kernels upload them as before)."""
        import jax
        import jax.numpy as jnp

        if jax.default_backend() != "tpu":
            return r, q
        from ..ops import pack as rpack

        L = r.shape[1]
        f = self._unpack_rq.get(L)
        if f is None:
            f = jax.jit(lambda p, m, qm: (
                rpack.unpack_reads_device(p, m, L),
                rpack.unpack_qual_device(qm, L)))
            self._unpack_rq[L] = f
        pk, nm = rpack.pack_reads(r)
        qm = rpack.pack_qual_ok(q, self.cfg.filter_min_q)
        return f(jax.device_put(jnp.asarray(pk)),
                 jax.device_put(jnp.asarray(nm)),
                 jax.device_put(jnp.asarray(qm)))

    def _filter_batch_np(self, tup, f1, f2) -> int:
        """Array-native _filter_batch: the kernel runs on the decoder's
        numpy batches directly and only the (rare) kept rows are decoded
        to text — identical keep semantics, none of the per-read str
        churn."""
        import jax.numpy as jnp
        from ..ops import filter as rfilter

        cfg = self.cfg
        names, r1, q1, l1, r2, q2, l2 = tup
        thr = cfg.filter_k_threshold
        if self.n_devices > 1:
            keep_idx = np.nonzero(self._filter_sharded(r1, q1, l1)
                                  | self._filter_sharded(r2, q2, l2))[0]
            verify = False
        elif len(self._hl_keys) <= rfilter.SMALL_TABLE_MAX:
            r1d, q1d = self._reads_h2d(r1, q1)
            r2d, q2d = self._reads_h2d(r2, q2)
            c1 = rfilter.small_table_hits_auto(
                r1d, q1d, l1, self._hl_keys, cfg.k, cfg.filter_min_q)
            c2 = rfilter.small_table_hits_auto(
                r2d, q2d, l2, self._hl_keys, cfg.k, cfg.filter_min_q)
            keep_idx = np.nonzero((c1 >= thr) | (c2 >= thr))[0]
            verify = False
        else:
            r1d, q1d = self._reads_h2d(r1, q1)
            r2d, q2d = self._reads_h2d(r2, q2)
            c1 = np.asarray(rfilter.window_candidate_hits(
                jnp.asarray(r1d), jnp.asarray(q1d), jnp.asarray(l1),
                self._bloom, cfg.k, cfg.filter_min_q))
            c2 = np.asarray(rfilter.window_candidate_hits(
                jnp.asarray(r2d), jnp.asarray(q2d), jnp.asarray(l2),
                self._bloom, cfg.k, cfg.filter_min_q))
            keep_idx = np.nonzero((c1 >= thr) | (c2 >= thr))[0]
            verify = True
        kept = 0
        for idx in keep_idx:
            i = int(idx)
            a, b = int(l1[i]), int(l2[i])
            s1 = r1[i, :a].tobytes().decode()
            sq1 = q1[i, :a].tobytes().decode()
            s2 = r2[i, :b].tobytes().decode()
            sq2 = q2[i, :b].tobytes().decode()
            if verify:
                ok = rfilter.exact_hits_host(s1, sq1, self._hl_keys, cfg.k,
                                             cfg.filter_min_q) >= thr
                if not ok:
                    ok = rfilter.exact_hits_host(
                        s2, sq2, self._hl_keys, cfg.k,
                        cfg.filter_min_q) >= thr
                if not ok:
                    continue
            f1.write(f"@{names[i]}\n{s1}\n+\n{sq1}\n")
            f2.write(f"@{names[i]}\n{s2}\n+\n{sq2}\n")
            kept += 1
        return kept

    # -- stage 5: align mutant reads ---------------------------------------

    def stage_align_reads(self, m1_path: str, m2_path: str | None):
        cfg = self.cfg
        sam_path = cfg.wpath(cfg.subject_stub + ".Mutations.fastq.sam")
        if os.path.exists(sam_path):
            self._log("skipping read alignment")
            return sam_path
        al = Aligner(self.ref_index())
        if m2_path is None:  # single-end, batched device DP
            alns = [g[0]
                    for g in al.align_seqs(list(fastq.read_fastq(m1_path)))]
        else:
            pairs = [
                (n1, s1, qq1, s2, qq2)
                for (n1, s1, qq1), (_, s2, qq2) in zip(fastq.read_fastq(m1_path),
                                                       fastq.read_fastq(m2_path))
            ]
            alns = rsam.align_pairs(al, pairs)
            # samblaster's slot in the pipe (runRufus.sh:1000): mark PCR
            # duplicate pairs so assembly's dup rejection can fire
            alns, n_dup = rsam.mark_duplicates(alns)
            if n_dup:
                self._log(f"marked {n_dup} duplicate pairs")
        alns = rsam.sort_alignments(alns)
        if cfg.saliva:
            # aligned-only mutant reads for saliva samples
            # (runRufus.sh:1062-1076): keep the full alignment set as
            # *.FULL.sam, then drop records with read-or-mate unmapped
            # (`samtools view -F 12`)
            rsam.write_sam(sam_path[: -len(".sam")] + ".FULL.sam", alns,
                           self.ref_index())
            alns = [a for a in alns if not (a.flag & 0xC)]
            if not alns:
                raise RuntimeError("saliva filter removed every read")
        rsam.write_sam(sam_path, alns, self.ref_index())
        # the reference's user-facing artifact is a coordinate-sorted,
        # indexed BAM (runRufus.sh:1000-1001) — emit the real thing too
        rsam.write_bam(cfg.wpath(cfg.subject_stub + ".Mutations.fastq.bam"),
                       alns, self.ref_index())
        return sam_path

    # -- stage 6: assembly --------------------------------------------------

    def stage_assemble(self, sam_path: str, hl_path: str):
        cfg = self.cfg
        ns = cfg.name_stub
        out_path = cfg.wpath(ns + ".overlap.hashcount.fastq")
        if os.path.exists(out_path):
            self._log("skipping assembly")
            return out_path
        records = []
        for line in open(sam_path):
            if line.startswith("@"):
                continue
            f = line.rstrip("\n").split("\t")
            records.append(SamLikeRec(int(f[1]), f[9], f[10], int(f[8])))
        strs, cnts = hio.read_hashlist(hl_path)
        threads = max(cfg.threads, 1)
        if cfg.assembly_speed == "veryfast":
            # the veryfast path assembles long-insert pairs only
            # (Overlap.shorter.sh:98: samtools view | awk '$9>150||$9<-150').
            # Single-end records all carry TLEN=0 — the reference's awk
            # would empty the stream and exit 100 there; we keep them
            # instead of replicating that dead end.
            if any(r.flag & 0x1 for r in records):
                records = [r for r in records if abs(r.tlen) > 150]
            r0, _ = overlap_sam(records, strs, ns, 0.99, 25, 3, cfg.k)
            r4, _ = overlap_round(r0, ns, 0.99, 75, 5, 15, 1, 1,
                                  buffer_size=100 * threads)
        else:
            r0, _ = overlap_sam(records, strs, ns, 0.95, 20, 1, cfg.k)
            r1, _ = overlap_round(r0, "20", 0.98, 100, 1, 20, 1, 0,
                                  buffer_size=100 * threads)
            r2, _ = overlap_round(r1, "20", 0.98, 75, 2, 20, 1, 1,
                                  buffer_size=100 * threads)
            r3, _ = overlap_round(r2, "20", 0.98, 50, 2, 20, 1, 1,
                                  buffer_size=100 * threads)
            r4, _ = overlap_region(r3, ns, 0.98, 50, 5, 1)
        if not r4:
            raise RuntimeError("assembly produced no contigs")
        rq = annotate.replace_qual_with_depth(r4)
        fastq.write_fastqd(cfg.wpath(ns + ".overlap.fastqd"), rq)
        fq = annotate.fastqd_to_fastq(rq)
        with open(cfg.wpath(ns + ".overlap.fastq"), "w") as f:
            for n, s, q in fq:
                f.write(f"@{n}\n{s}\n+\n{q}\n")
        ann, side = annotate.annotate_overlap(list(zip(strs, cnts)), fq, cfg.k)
        with open(out_path, "w") as f:
            for n, s, q in ann:
                f.write(f"@{n}\n{s}\n+\n{q}\n")
        with open(cfg.wpath("TempOverlap", ns + ".overlap.asembly.hash.fastq"), "w") as f:
            for l in side:
                f.write(l + "\n")
        return out_path

    # -- stage 7: contig alignment + genotyping pulls ----------------------

    def _routed_query(self, dev, kmers: np.ndarray) -> np.ndarray:
        """Genotyping lookups against ONE device-resident table — a thin
        wrapper over the multi-table dispatch (same routed path, one
        table)."""
        return self._routed_query_multi([dev], kmers)[0]

    def _routed_query_multi(self, devs: list, kmers: np.ndarray):
        """One routed dispatch answering `kmers` against EVERY sample's
        device-resident table (parallel.sharded_query_multi): the route /
        exchange / un-route work is paid once, per-sample cost is only
        the local bisection. Returns a (n_samples, len(kmers)) array.
        qcap rounds up to a power of two so repeated pulls of different
        sizes reuse the same compiled step."""
        import jax
        import jax.numpy as jnp

        from ..parallel.sharded import _sharded_query_multi, exact_route_cap

        cfg = self.cfg
        n = self.n_devices
        Q = len(kmers)
        qcap = 128
        while qcap * n < Q:
            qcap *= 2
        padded = np.full(n * qcap, count.SENTINEL, np.uint64)
        padded[:Q] = kmers
        sh = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(self.mesh.axis_names[0]))
        q_dev = jax.device_put(jnp.asarray(padded.reshape(n, qcap)), sh)
        by_split = devs[0].splitters is not None and n > 1
        # exact per-peer bin width from the host-side owner mirror: no
        # slack inflation of the routed lookup volume, and the overflow
        # retry below can never fire (kept as a safety net)
        rcap = exact_route_cap(
            padded, n, devs[0].splitters if by_split else None)
        args = []
        if by_split:
            rep = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec())
            args = [jax.device_put(
                jnp.asarray(devs[0].splitters, jnp.uint64), rep)]
        keys = [d.keys for d in devs]
        cnts = [d.counts for d in devs]
        T = len(devs)
        while True:
            # 'permuted' skips the device-side unroute sort; the host
            # restores query order with one vectorized copy below
            step = _sharded_query_multi(self.mesh, cfg.k, qcap, T,
                                        rcap, by_split, upto="permuted")
            out, dropped = step(q_dev, keys, cnts, *args)
            if int(np.asarray(dropped).sum()) == 0:
                break
            rcap *= 2
            self._log(f"routed multi-query overflowed bins; retrying "
                      f"with route_cap={rcap}")
        arr = np.asarray(out)  # (T+1, n, qcap); plane 0 = permutation
        idx = arr[0].astype(np.int64)
        res = np.empty((T, n, qcap), arr.dtype)
        rows = np.arange(n)[:, None]
        res[:, rows, idx] = arr[1:]
        return res.reshape(T, -1)[:, :Q]

    def stage_contig_align(self, contigs_path: str, tables):
        cfg = self.cfg
        ns = cfg.name_stub
        inter = lambda *p: cfg.wpath("Intermediates", *p)
        al = Aligner(self.ref_index())
        recs = list(fastq.read_fastq(contigs_path))

        # contig alignments with splits (bwa mem -Y role), candidate DPs
        # batched on device (sw_device.sw_batch)
        alns = []
        for group in al.align_seqs(recs, splits=True):
            alns.extend(group)
        alns = rsam.sort_alignments(alns)
        stdin_lines = []
        by_name: dict[str, list] = {}
        for a in alns:
            by_name.setdefault(a.qname, []).append(a)
        for a in alns:
            if "chrUn" in a.ref_name:
                continue
            others = [x for x in by_name[a.qname] if x is not a and not x.is_unmapped]
            sa_tag = ""
            if others and not a.is_unmapped:
                entries = "".join(
                    f"{o.ref_name},{o.pos + 1},{'-' if o.is_reverse else '+'},"
                    f"{o.cigar_string()},{o.mapq},{o.nm};"
                    for o in others)
                sa_tag = f"\tSA:Z:{entries}"
            n_sa = len(others) if sa_tag else 0
            line = rsam.to_sam_line(a, tags=f"NM:i:{a.nm}\tAS:i:{a.score}" + sa_tag)
            f = line.split("\t")
            f[0] = f"{f[0]}:SA={n_sa}"
            stdin_lines.append("\t".join(f))
        sam_out = cfg.wpath(ns + ".overlap.hashcount.fastq.sam")
        rsam.write_sam(sam_out, alns, self.ref_index())
        # sorted+indexed contig BAM, the reference's published artifact
        # (Overlap.shorter.sh:209-218 `samtools sort` + `samtools index`)
        rsam.write_bam(cfg.wpath(ns + ".overlap.hashcount.fastq.bam"),
                       alns, self.ref_index())

        # MOB alignment
        mob_sam = inter(ns + ".overlap.hashcount.fastq.MOB.sam")
        mob_fasta_path = cfg.mob_fasta
        with open(mob_sam, "w") as f:
            f.write("@HD\tVN:1.6\tSO:coordinate\n")
            if mob_fasta_path and os.path.exists(mob_fasta_path):
                mob_ref = fasta.FastaReference(mob_fasta_path)
                mob_idx = RefIndex({n: mob_ref.seqs[n] for n in mob_ref.names})
                # MOB glocal profile: bwa mem -E 0,0 -O 6,6 -d 500 -w 500
                # -L 0,0 (Overlap.shorter.sh:225) — free gap extension and
                # free clipping change which MOB alignment wins, gating
                # checkMob (RUFUS.interpret.cpp:5442-5479)
                from ..align.aligner import MOB_SCORING

                mob_al = Aligner(mob_idx, scoring=MOB_SCORING)
                for n in mob_idx.names:
                    f.write(f"@SQ\tSN:{n}\tLN:{mob_idx.lengths[n]}\n")
                for n, s, q in recs:
                    a = mob_al.align_seq(n, s, q)[0]
                    f.write(rsam.to_sam_line(a, tags=f"AS:i:{a.score}") + "\n")

        # reference context fasta (bamtobed +-100 -> getfasta)
        contigs_ref = self.ref_contigs()
        ref_ctx_path = inter(ns + ".overlap.asembly.hash.fastq.ref.fastq")
        ref_seqs = []
        with open(ref_ctx_path, "w") as f:
            for a in alns:
                if a.is_unmapped:
                    continue
                s = max(0, a.pos - 100)
                e = a.pos + a.ref_span() + 100
                seq = contigs_ref[a.ref_name][s:e].tobytes().decode()
                f.write(f">{a.ref_name}:{s}-{e}\n{seq}\n")
                ref_seqs.append(seq)

        # kmer tabs (non-canonical forward counts) + per-sample pulls
        tab_alt = inter(ns + ".overlap.hashcount.fastq.Jhash.tab")
        tab_ref = inter(ns + ".overlap.asembly.hash.fastq.ref.fastq.Jhash.tab")
        t_alt = count.KmerTable.from_strings(cfg.k, [s for _, s, _ in recs],
                                             canonical=False)
        t_ref = count.KmerTable.from_strings(cfg.k, ref_seqs, canonical=False)
        for t, path in ((t_alt, tab_alt), (t_ref, tab_ref)):
            with open(path, "w") as f:
                for s, c in zip(codec.kmers_to_strs(t.keys, cfg.k), t.counts):
                    f.write(f"{s} {c}\n")

        # batched genotyping pulls: each tab's k-mer set is canonicalized
        # ONCE and — when every sample's table is device-resident — routed
        # in a SINGLE multi-table dispatch (route/return amortize over all
        # samples; the reference backgrounds one `jellyfish query` per
        # sample, Overlap.shorter.sh:265-303)
        stubs = [cfg.subject_stub] + [cfg.control_stub(c)
                                      for c in cfg.controls]
        host_tabs = [tables["subject"]] + list(tables["controls"])

        def pull_all(tab_path, out_paths):
            strs = [l.split()[0] for l in open(tab_path)]
            if strs:
                canon = [codec.canonical_str(s) for s in strs]
                km = codec.strs_to_kmers(canon, cfg.k)
                devs = [self._dev_tables.get(s) for s in stubs]
                if all(d is not None for d in devs):
                    # device-resident tables: one routed dispatch answers
                    # every sample — no host gather of any table, ever
                    cnts_all = self._routed_query_multi(devs, km)
                else:
                    cnts_all = [self._routed_query(d, km)
                                if d is not None else t.query(km)
                                for d, t in zip(devs, host_tabs)]
            else:
                cnts_all = [[] for _ in stubs]
            for out, cnts in zip(out_paths, cnts_all):
                with open(out, "w") as f:
                    for s, c in zip(strs, cnts):
                        if 0 <= c <= cfg.genotype_max_cov:
                            f.write(f"{s} {c}\n")

        subj_alt = inter(ns + ".overlap.asembly.hash.fastq.sample")
        subj_ref = inter(ns + ".overlap.asembly.hash.fastq.Ref.sample")
        par_alt_paths, par_ref_paths = [], []
        for c in cfg.controls:
            stub = cfg.control_stub(c)
            par_alt_paths.append(
                inter(f"{ns}.overlap.asembly.hash.fastq.{stub}.Jhash"))
            par_ref_paths.append(
                inter(f"{ns}.overlap.asembly.hash.fastq.Ref.{stub}.Jhash"))
        pull_all(tab_alt, [subj_alt] + par_alt_paths)
        pull_all(tab_ref, [subj_ref] + par_ref_paths)

        def pull(tab_path, table, out):
            # host-table point pull (exclude/repeat hashes)
            strs = [l.split()[0] for l in open(tab_path)]
            cnts = table.query(codec.strs_to_kmers(
                [codec.canonical_str(s) for s in strs], cfg.k)) if strs else []
            with open(out, "w") as f:
                for s, c in zip(strs, cnts):
                    if 0 <= c <= cfg.genotype_max_cov:
                        f.write(f"{s} {c}\n")

        # exclude / repeat reference hash
        rep_ref = inter(ns + ".ref.RepRefHash")
        if cfg.ref_hash and os.path.exists(cfg.ref_hash):
            ex = count.KmerTable.load(cfg.ref_hash)
            pull(tab_alt, ex, rep_ref)
        else:
            open(rep_ref, "w").close()

        return {
            "stdin_lines": stdin_lines,
            "mob_sam": mob_sam,
            "subj_alt": subj_alt,
            "subj_ref": subj_ref,
            "par_alt": par_alt_paths,
            "par_ref": par_ref_paths,
            "rep_ref": rep_ref,
        }

    # -- stage 8: interpret -------------------------------------------------

    def stage_interpret(self, inputs):
        cfg = self.cfg
        ns = cfg.name_stub

        class RefWrap:
            def __init__(self, contigs):
                self.seqs = contigs

            def contig_array(self, name):
                return self.seqs[name]

        out_stub = cfg.wpath(ns + ".overlap.hashcount.fastq.bam")
        dist_path = cfg.wpath(cfg.subject_stub + ".Jhash.histo.7.7.dist")
        hl = [p for p in os.listdir(cfg.workdir)
              if p.startswith(cfg.subject_stub + f".k{cfg.k}_c") and p.endswith(".HashList")]
        hl_path = cfg.wpath(sorted(hl)[0])
        return run_interpret(
            inputs["stdin_lines"], RefWrap(self.ref_contigs()), dist_path,
            hl_path, out_stub, inputs["par_alt"], inputs["par_ref"],
            inputs["subj_alt"], inputs["subj_ref"], inputs["rep_ref"],
            inputs["mob_sam"], min_map_qual=10,
            max_variant_size=cfg.max_allele_size,
        )

    # -- long-read (PacBio HiFi) path ---------------------------------------

    def stage_assemble_longread(self, contigs_fasta: str, hl_path: str):
        """Long-read contigs -> annotated hashcount fastq.

        Overlap.pacbio.sh role (scripts/Overlap.pacbio.sh:75-90): the
        short-read Overlap rounds are SKIPPED — HiFi contigs come from an
        external assembler (the reference shells out to canu, which we do
        not vendor; any assembly fasta works) or, failing that, the
        accurate HiFi reads themselves serve as single-read contigs.  The
        contigs go straight to AnnotateOverlap via the multiline-fasta ->
        singleline-fastq shim (Overlap.pacbio.sh:89 uses
        multiLineFastaToSingleLineFastq.pl exactly so).
        """
        cfg = self.cfg
        ns = cfg.name_stub
        out_path = cfg.wpath(ns + ".overlap.hashcount.fastq")
        if os.path.exists(out_path):
            self._log("skipping long-read annotate")
            return out_path
        if contigs_fasta.endswith((".fq", ".fastq")):
            fq = [(n, s, q) for n, s, q in fastq.read_fastq(contigs_fasta)]
        else:
            with open(contigs_fasta) as fh:
                fq_lines = list(shims.multiline_fasta_to_singleline_fastq(fh))
            fq = [(fq_lines[i][1:], fq_lines[i + 1], fq_lines[i + 3])
                  for i in range(0, len(fq_lines), 4)]
        strs, cnts = hio.read_hashlist(hl_path)
        ann, side = annotate.annotate_overlap(list(zip(strs, cnts)), fq, cfg.k)
        if not ann:
            raise RuntimeError("long-read assembly produced no contigs")
        with open(out_path, "w") as f:
            for n, s, q in ann:
                f.write(f"@{n}\n{s}\n+\n{q}\n")
        with open(cfg.wpath("TempOverlap", ns + ".overlap.asembly.hash.fastq"), "w") as f:
            for l in side:
                f.write(l + "\n")
        return out_path

    def run_longread(self, contigs_fasta: str | None = None) -> str:
        """Full long-read pipeline: count/model/subtract as usual, then the
        pacbio assembly+interpret variant (interpret runs with -mQ 1
        -as 1000, Overlap.pacbio.sh:243-256)."""
        cfg = self.cfg
        tables = self.stage_count()
        mutant_min_cov, max_hash_depth = self.stage_model()
        hl_path = self.stage_hashlist(tables, mutant_min_cov, max_hash_depth)
        if contigs_fasta is None:
            # no external assembly: filter mutant reads and use them as
            # single-read contigs (HiFi reads are accurate enough to call on)
            contigs_fasta = self.stage_filter_single(hl_path)
        contigs_path = self.stage_assemble_longread(contigs_fasta, hl_path)
        inputs = self.stage_contig_align(contigs_path, tables)
        out_stub = cfg.wpath(cfg.name_stub + ".overlap.hashcount.fastq.bam")
        dist_path = cfg.wpath(cfg.subject_stub + ".Jhash.histo.7.7.dist")

        class RefWrap:
            def __init__(self, contigs):
                self.seqs = contigs

            def contig_array(self, name):
                return self.seqs[name]

        vcf_path = run_interpret(
            inputs["stdin_lines"], RefWrap(self.ref_contigs()), dist_path,
            hl_path, out_stub, inputs["par_alt"], inputs["par_ref"],
            inputs["subj_alt"], inputs["subj_ref"], inputs["rep_ref"],
            inputs["mob_sam"], min_map_qual=1,
            max_variant_size=cfg.max_allele_size, seg_threshold=1000,
        )
        final = cfg.wpath(cfg.name_stub + ".overlap.hashcount.fastq.bam.FINAL.vcf")
        polish_vcf(vcf_path, final, with_mosaic=cfg.mosaic)
        return final

    def _load_table(self, stub: str):
        """Load a sample's saved count table — flat memmap (spilled WGS
        runs) or npz."""
        flat = self.cfg.wpath(stub + ".table.flat")
        if os.path.exists(flat):
            return count.KmerTable.load_flat(flat)
        return count.KmerTable.load(self.cfg.wpath(stub + ".table.npz"))

    def regenotype(self, control_tables: list) -> str:
        """Re-genotype existing contigs against new control tables
        (scripts/Genotype.sh role): reruns the pull + interpret + polish
        stages only, using the assembled contigs already in the workdir."""
        cfg = self.cfg
        contigs_path = cfg.wpath(cfg.name_stub + ".overlap.hashcount.fastq")
        if not os.path.exists(contigs_path):
            raise FileNotFoundError("no assembled contigs to regenotype; "
                                    "run the pipeline first")
        tables = {
            "subject": self._load_table(cfg.subject_stub),
            "controls": control_tables,
        }
        inputs = self.stage_contig_align(contigs_path, tables)
        vcf_path = self.stage_interpret(inputs)
        final = cfg.wpath(cfg.name_stub + ".overlap.hashcount.fastq.bam.FINAL.vcf")
        polish_vcf(vcf_path, final, with_mosaic=cfg.mosaic)
        return final

    # -- full run -----------------------------------------------------------

    def run(self) -> str:
        cfg = self.cfg
        t = self.trace
        tables = self.stage_count()
        if cfg.stop_after == "jhash":
            return ""
        with t.stage("model"):
            mutant_min_cov, max_hash_depth = self.stage_model()
        self._log(f"MutantMinCov={mutant_min_cov} MaxHashDepth={max_hash_depth}")
        hl_path = self.stage_hashlist(tables, mutant_min_cov, max_hash_depth)
        if cfg.stop_after == "hashlist":
            return hl_path
        with t.stage("filter", devices=self.n_devices):
            if cfg.single_end:
                m1 = self.stage_filter_single(hl_path)
                m2 = None
            else:
                m1, m2 = self.stage_filter(hl_path)
        if cfg.stop_after == "filter":
            return m1
        with t.stage("align_reads"):
            sam_path = self.stage_align_reads(m1, m2)
        with t.stage("assemble"):
            contigs_path = self.stage_assemble(sam_path, hl_path)
        with t.stage("contig_align"):
            inputs = self.stage_contig_align(contigs_path, tables)
        with t.stage("interpret"):
            vcf_path = self.stage_interpret(inputs)
        final = cfg.wpath(cfg.name_stub + ".overlap.hashcount.fastq.bam.FINAL.vcf")
        with t.stage("polish"):
            polish_vcf(vcf_path, final, with_mosaic=cfg.mosaic)
            # bgzip + tabix the final VCF (runRufus.sh:1127-1128); the
            # uncompressed file is kept for convenience (the reference's
            # bgzip -f deletes it)
            from ..io import bgzf

            bgzf.bgzip_tabix_vcf(final, keep_plain=True)
        if cfg.clean:
            self.clean()
        self._log(f"FINAL VCF: {final}")
        self._log(self.trace.summary())
        return final

    def clean(self):
        """-CLEAN: purge per-run intermediates (runRufus.sh:351-356's rm
        list, translated to this pipeline's artifact names). Final VCFs,
        trace files and the model stay."""
        import glob

        cfg = self.cfg
        patterns = [
            "*.generator.table.npz", "*.generator.table.flat",
            "*.generator.Jhash.histo",
            "*.generator.Jhash.histo.7.7.prob", "*.generator.Jelly.chr",
            "*.generator.filter.chr", "*.generator.k*_c*.HashList",
            "*.generator.Mutations.Mate1.fastq",
            "*.generator.Mutations.Mate2.fastq",
            "*.generator.Mutations.fastq",
            "*.generator.Mutations.fastq.sam",
            "*.generator.Mutations.fastq.FULL.sam",
            "*.generator.V2.overlap.fastq", "*.generator.V2.overlap.fastqd",
            "*.generator.V2.overlap.hashcount.fastq",
            "*.generator.V2.overlap.hashcount.fastq.sam",
            "*.generator.V2.overlap.hashcount.fastq.bam.vcf",
            "*.generator.V2.overlap.hashcount.fastq.bam.vcf.bed",
        ]
        removed = 0
        for pat in patterns:
            for p in glob.glob(cfg.wpath(pat)):
                os.remove(p)
                removed += 1
        self._log(f"clean: removed {removed} intermediates")
        return removed
