"""Shared compute kernels (reference L1 analog).

numpy paths are the bit-exact reference implementations; jax/pallas paths
are the TPU hot paths. Every device kernel has a numpy twin used for
verification (mirroring how the reference pairs C kernels with Asm/ ones,
e.g. C/LzFindOpt.c vs Asm/x86/LzFindOpt.asm).
"""
