"""Multi-chip scaling: mesh-sharded counting/subtract/query/filter over
jax.sharding (shard_map + XLA collectives over ICI).

The reference's 'distribution' is hand-run cluster scripts, fork-per-sample
jobs and FIFO pipelines (SURVEY.md section 2.5); here the equivalents are:
data-parallel read sharding, k-mer-prefix-sharded device-resident count
tables with all_to_all resharding, collective-free N-table subtraction,
routed genotype queries, and replicated-HashList filtering (section 5.8
mapping)."""

from .sharded import (ShardedKmerTable, local_count_step, make_mesh,
                      make_splitters, route_capacity,
                      sharded_count_step, sharded_fold_step,
                      sharded_filter_step, sharded_query_multi,
                      sharded_query_step,
                      sharded_subtract_step)  # noqa: F401
