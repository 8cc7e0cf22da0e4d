"""rufus_tpu — a TPU-native, reference-free k-mer variant-calling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of RUFUS
(reference-free somatic/de-novo variant caller): k-mer counting, depth
modelling, subject-minus-control k-mer subtraction, mutant-read filtering,
greedy overlap assembly, contig alignment and k-mer Bayesian genotyping to
VCF — with the hot paths expressed as device kernels over 2-bit packed
sequence batches instead of CPU hash tables and process pipelines.

Design notes
------------
* K-mers are packed 2 bits/base (A=0, C=1, G=2, T=3) MSB-first into uint64,
  so numeric comparison == lexicographic string comparison and the canonical
  form is ``min(fwd, revcomp)`` (matches Jellyfish ``count -C`` semantics,
  reference: src/modifiedJellyfish/include/jellyfish/mer_dna.hpp).
* Count tables are *sorted* ``(kmer, count)`` columnar arrays ("KmerTable"),
  built by device sort + run-length-encode and merged LSM-style.  This is
  the TPU-native replacement for the reference's lock-free CAS open
  addressing hash (large_hash_array.hpp): deterministic, shard-count
  independent, and turns multi-sample subtraction into a vectorized merge
  and queries into batched binary searches.
* 64-bit integers are required for k<=32 packing, hence x64 is enabled
  process-wide; all floating point code states dtypes explicitly.
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
