"""Auxiliary utilities: tracing/profiling, VCF/QC analysis tools, format
shims, diagnostics, and model plots (reference scripts layer, SURVEY.md
section 2.4 + section 5.1)."""

from .trace import StageTimer, Throughput, rss_mb, banner  # noqa: F401
