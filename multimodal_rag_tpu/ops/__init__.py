"""TPU kernels: fused exact-MIPS top-k, IVF search, oracles."""
