from .block import compress_block, decompress_block, max_compressed_size
from .frame import compress_frame, decompress_frame

__all__ = [
    "compress_block",
    "decompress_block",
    "max_compressed_size",
    "compress_frame",
    "decompress_frame",
]
