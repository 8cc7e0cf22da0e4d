"""Variant interpretation: contig alignments -> VCF (RUFUS.interpret role)."""

from .driver import run_interpret  # noqa: F401
