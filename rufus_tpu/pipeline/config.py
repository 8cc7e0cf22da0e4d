"""Typed pipeline configuration (replaces runRufus.sh's argbash parser,
reference: runRufus.sh:135-366 with defaults at 27, 61-69, 424-435)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class RufusConfig:
    subject: str = ""  # subject BAM (or fastq pair via fastq_a/fastq_b)
    controls: list = field(default_factory=list)
    ref: str = ""  # reference fasta path (or BWA index prefix to reconstruct)
    k: int = 25
    threads: int = 2
    workdir: str = "."
    min_cov: int | None = None  # -m fixed MutantMinCov override
    filter_min_q: int = 15  # -fq
    filter_k_threshold: int = 1  # -fK
    max_allele_size: int = 1000  # -L
    par_low_k: int = 2  # -pl parent jellyfish -L
    subject_low_k: int = 2
    max_hash_depth_seed: int = 1200  # runRufus.sh:27
    exome: bool = False
    mosaic: bool = False  # include Mosaic rows in FINAL.vcf
    single_end: bool = False
    fastq_a: str = ""
    fastq_b: str = ""
    exclude_hash: str = ""  # -e exclude Jhash table
    ref_hash: str = ""  # repeat reference hash for -e RepRefHash
    mob_fasta: str = ""  # mobile-element fasta (MOB pass)
    batch_size: int = 2048
    read_pad: int = 160
    merge_min: int = 5  # modified-merge count floor (merge_files.cc:149)
    genotype_max_cov: int = 100000  # Overlap.shorter.sh:20
    assembly_speed: str = "full"  # or "veryfast"
    stop_after: str = ""  # "jhash" | "hashlist" | "filter" (StJ/StH/StF)
    sharded: str = "auto"  # "auto" | "on" | "off": mesh-sharded count/
    # subtract/filter chain (auto = on when >1 jax device is visible)
    clean: bool = False  # -CLEAN: purge intermediates after the run
    # (runRufus.sh:351-356)
    flat_index: str = ""  # path to a build_flat_index seed index: built
    # on first use and memmapped thereafter, bounding aligner host RAM
    # for whole-genome references (align/aligner.py)
    saliva: bool = False  # aligned-only mutant-read filter for saliva
    # samples (runRufus.sh:1062-1076): drop unaligned reads before assembly
    haploid: bool = False  # ModelDist.haploid fit (ModelDist.haploid.cpp:29)
    table_cap0: int = 1 << 20  # initial per-shard device table capacity
    # (grows on overflow, jellyfish cooperative-resize role)
    count_passes: int = 1  # >1: multipass counting — pass p counts only
    # keys in disjoint ascending range p, each pass spilling a flat run;
    # bounds device memory to ~1/P of the single-pass table when one
    # sample's table + fold transient exceed HBM (jellyfish --disk's
    # sorted-run regime, count_main.cc:318-338). Single-device only (a
    # multi-chip mesh already range-partitions across chips).
    spill_tables: str = "auto"  # "auto" | "on" | "off": spill each
    # sample's finished count table to a host flat memmap and free the
    # device when all samples' tables can't share HBM (jellyfish --disk
    # role, count_main.cc:245-246; auto = spill on TPU when the
    # projected N-sample residency exceeds hbm_budget_gb)
    hbm_budget_gb: float = 12.0  # usable HBM for resident tables

    @property
    def subject_stub(self) -> str:
        # comma-separated multi-file inputs stub from the first file
        return os.path.basename(self.subject.split(",")[0]) + ".generator"

    @property
    def name_stub(self) -> str:
        return self.subject_stub + ".V2"

    def control_stub(self, path: str) -> str:
        return os.path.basename(path.split(",")[0]) + ".generator"

    def wpath(self, *parts) -> str:
        return os.path.join(self.workdir, *parts)
