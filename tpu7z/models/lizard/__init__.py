from .codec import compress_frame, decompress_frame, decompress

__all__ = ["compress_frame", "decompress_frame", "decompress"]
