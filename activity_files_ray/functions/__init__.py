"""Pure vectorized kernels shared by all stages."""
