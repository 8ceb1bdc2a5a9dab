"""Ray Data stages: map_batches kernels and actor-pool classes."""
