from .decoder import decompress, decompress_mt_container
from .encoder import compress, compress_mt_container

__all__ = ["decompress", "decompress_mt_container", "compress",
           "compress_mt_container"]
