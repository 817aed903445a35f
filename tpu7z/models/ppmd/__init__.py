from .ppmd7 import decompress, compress

__all__ = ["decompress", "compress"]
