from .decoder import decompress_raw, decompress_alone
from .encoder import compress_raw, compress_alone

__all__ = ["decompress_raw", "decompress_alone",
           "compress_raw", "compress_alone"]
