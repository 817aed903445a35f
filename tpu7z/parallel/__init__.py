"""Sharded block/frame scheduling — the pod-slice analog of the
reference's MT layer (SURVEY.md section 2.2):

  MtCoder thread pool  (C/MtCoder.c:445)        -> blocks sharded over a
                                                   jax Mesh "data" axis
  zstdmt writelist     (C/zstdmt/*-mt_compress)  -> ordered host gather of
                                                   per-shard frames
  CMtProgress          (C/MtDec.h:24-37)         -> collective error/size
                                                   reduction (psum)
"""

from .mesh import make_mesh, data_axis
from .sharded import (shard_compress_lz4, shard_compress_lz4_device,
                      sharded_find_matches)

__all__ = ["make_mesh", "data_axis", "shard_compress_lz4",
           "shard_compress_lz4_device", "sharded_find_matches"]
