"""tpu7z — TPU-native lossless compression framework.

A brand-new JAX/XLA/Pallas implementation of the mcmilk/7-Zip-zstd
capability set (see SURVEY.md): the codec family (Zstandard, LZ4/LZ5/Lizard,
LZMA/LZMA2/Fast-LZMA2, Brotli, BZip2, Deflate, PPMd, BCJ/Delta filters),
the hasher suite, container formats (.zst/.lz4/.xz/.7z) and a 7z-style CLI,
re-designed TPU-first:

- match finding   -> vectorized hash/sort kernels over HBM (tpu7z.ops)
- entropy coding  -> block-parallel multi-lane FSE/Huffman/range-coder lanes
- MtCoder/zstdmt  -> pod-slice data-parallel sharding over a jax Mesh with
                     ordered gather of compressed frames (tpu7z.parallel)

Layering (mirrors reference L0-L6, SURVEY.md section 1):
  utils/       L0  platform runtime (errors, buffers, config)
  ops/         L1a shared compute kernels (bitstream, hashing, histogram,
                   match finding) — numpy bit-exact paths + Pallas/JAX hot paths
  models/      L1b codec families (lz4, zstd, lzma, brotli, bzip2, deflate,
                   filters) — each exposes compress()/decompress()
  parallel/    L2  sharded block/frame schedulers (zstdmt/MtCoder analog)
  containers/  L4  archive formats (.zst, .lz4, .xz, skippable frames, .7z)
  cli/         L5/6 operation layer + 7z-style console frontend
"""

__version__ = "0.1.0"

# Version string mirrors the reference banner style
# (reference: C/7zVersion.h:4  "26.01 ZS v1.5.7 R1")
VERSION_BANNER = f"tpu7z {__version__} (TPU-native, JAX/Pallas)"
