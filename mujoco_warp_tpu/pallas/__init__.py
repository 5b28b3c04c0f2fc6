"""Pallas TPU kernels — the "native tier" of the engine, standing in for
the reference's Warp tile kernels and conditional CUDA graphs
(SURVEY §2: tiled Cholesky, Hessian assembly, fused solver loop)."""
