"""Read/contig alignment: seed-and-extend local aligner (BWA-mem role).

The reference shells out to bwa (runRufus.sh:1000, Overlap.shorter.sh:209);
this environment has no bwa and a TPU-native rebuild wants alignment as a
batched device workload anyway: k-mer seed index + diagonal voting +
banded Smith-Waterman extension.
"""

from .aligner import Aligner, Alignment, RefIndex  # noqa: F401
