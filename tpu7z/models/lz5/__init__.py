from .codec import (compress_block, decompress_block, compress_frame,
                    decompress_frame, decompress)

__all__ = ["compress_block", "decompress_block", "compress_frame",
           "decompress_frame", "decompress"]
