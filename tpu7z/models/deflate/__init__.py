from .codec import compress, decompress, gzip_compress, gzip_decompress

__all__ = ["compress", "decompress", "gzip_compress", "gzip_decompress"]
