from .frame import compress, decompress, decompress_frame

__all__ = ["compress", "decompress", "decompress_frame"]
