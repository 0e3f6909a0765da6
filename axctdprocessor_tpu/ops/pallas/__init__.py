"""Hand-written Pallas TPU kernels for the decode hot path."""
