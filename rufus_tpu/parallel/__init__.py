"""Multi-chip scaling: mesh-sharded counting/filtering over jax.sharding.

The reference's 'distribution' is hand-run cluster scripts and FIFO
pipelines (SURVEY.md section 2.5); here the equivalents are: data-parallel
read sharding, k-mer-prefix-sharded count tables with all_to_all
resharding, and replicated-HashList filtering (section 5.8 mapping).
"""

from .sharded import (make_mesh, sharded_count_step, sharded_filter_step,
                      sharded_subtract)  # noqa: F401
