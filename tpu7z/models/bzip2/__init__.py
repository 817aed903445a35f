from .codec import compress, decompress

__all__ = ["compress", "decompress"]
