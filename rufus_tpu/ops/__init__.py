"""Device kernels: codec, counting, filtering, alignment scoring."""
