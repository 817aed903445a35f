"""Codec registry — the RegisterCodec/ICompressCoder analog
(CPP/7zip/Common/RegisterCodec.h:22-104, CPP/7zip/ICoder.h).

Maps method names and 7z method IDs to stream codecs. Each entry is a
(compress, decompress) pair over whole byte streams; container formats
resolve coders through this table, like CreateCoder does in the
reference (CPP/7zip/Common/CreateCoder.cpp).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from ..utils.errors import UnsupportedError


@dataclass(frozen=True)
class CodecInfo:
    name: str
    method_id: int
    compress: Callable
    decompress: Callable
    levels: tuple  # (min, max)


def _lz4_c(data, level=1, **kw):
    from .lz4 import frame
    return frame.compress_frame(data)


def _lz4_d(data, **kw):
    from .lz4 import frame
    return frame.decompress(data)


def _zstd_c(data, level=3, **kw):
    from .zstd import frame
    return frame.compress(data, level=min(level, 22), **kw)


def _zstd_d(data, **kw):
    from .zstd import frame
    return frame.decompress(data)


def _lzma2_c(data, level=5, **kw):
    from .lzma import lzma2
    return lzma2.compress(data, level=level)


def _lzma2_d(data, out_size=None, **kw):
    from .lzma import lzma2
    return lzma2.decompress(data, out_size)


def _lzma_c(data, level=5, **kw):
    from .lzma import encoder
    stream, props = encoder.compress_raw(data)
    return stream  # props conveyed via container layer


def _bzip2_c(data, level=9, **kw):
    from . import bzip2
    return bzip2.compress(data, level=max(1, min(level, 9)))


def _bzip2_d(data, **kw):
    from . import bzip2
    return bzip2.decompress(data)


def _deflate_c(data, level=6, **kw):
    from . import deflate
    return deflate.compress(data)


def _deflate_d(data, out_size=None, **kw):
    from . import deflate
    return deflate.decompress(data, max_out=out_size)


def _xz_c(data, level=5, **kw):
    from ..containers import xz
    return xz.compress(data)


def _xz_d(data, **kw):
    from ..containers import xz
    return xz.decompress(data)


def _gzip_c(data, level=6, **kw):
    from . import deflate
    return deflate.gzip_compress(data)


def _gzip_d(data, **kw):
    from . import deflate
    return deflate.gzip_decompress(data)


def _copy(data, **kw):
    return data


CODECS: dict[str, CodecInfo] = {}


def _traced(name: str, op: str, fn: Callable) -> Callable:
    """Wrap a codec entry point in a trace span (ZSTD_trace analog,
    C/zstd/zstd_trace.h:12-44) — one central hook covers every codec
    instead of per-file instrumentation. Near-zero cost when no trace
    callback is attached."""
    def wrapped(data, *a, **kw):
        from ..utils import trace as _trace
        if not _trace.enabled():
            return fn(data, *a, **kw)
        with _trace.span(f"{name}.{op}", size=len(data),
                         level=kw.get("level")):
            return fn(data, *a, **kw)
    wrapped.__name__ = f"{name}_{op}"
    wrapped.__wrapped__ = fn
    return wrapped


def _register(name, mid, c, d, levels=(1, 9)):
    CODECS[name] = CodecInfo(name, mid, _traced(name, "compress", c),
                             _traced(name, "decompress", d), levels)


_register("copy", 0x00, _copy, _copy, (0, 0))
_register("lz4", 0x4F71104, _lz4_c, _lz4_d, (1, 12))
_register("zstd", 0x4F71101, _zstd_c, _zstd_d, (1, 22))
_register("lzma2", 0x21, _lzma2_c, _lzma2_d, (1, 9))
_register("bzip2", 0x040202, _bzip2_c, _bzip2_d, (1, 9))
_register("deflate", 0x040108, _deflate_c, _deflate_d, (1, 9))
# xz/gzip are container formats, not 7z coders: they have no 7z method
# ID of their own (the reference routes them through XzHandler/GzHandler,
# CPP/7zip/Archive/XzHandler.cpp — not through the codec registry).
# method_id 0 here means "container-level pseudo-codec, not addressable
# from a 7z folder"; SevenZipReader never dispatches on these names.
_register("xz", 0, _xz_c, _xz_d, (1, 9))
_register("gzip", 0, _gzip_c, _gzip_d, (1, 9))


def _brotli_c(data, level=5, **kw):
    from . import brotli
    return brotli.compress_mt_container(data, quality=min(level, 11))


def _brotli_d(data, **kw):
    from . import brotli
    return brotli.decompress_mt_container(data)


def _lz5_c(data, level=1, **kw):
    from . import lz5
    return lz5.compress_frame(data)


def _lz5_d(data, **kw):
    from . import lz5
    return lz5.decompress(data)


def _lizard_c(data, level=11, **kw):
    from . import lizard
    if not 10 <= level <= 49:
        # 7z-style levels 1..9 map into the LIZv1 family
        level = 20 + max(1, min(level, 9))
    return lizard.compress_frame(data, level=level)


def _lizard_d(data, **kw):
    from . import lizard
    return lizard.decompress(data)


def _z_c(data, level=16, **kw):
    from . import z_lzw
    return z_lzw.compress(data, maxbits=max(9, min(level, 16)))


def _z_d(data, **kw):
    from . import z_lzw
    return z_lzw.decompress(data)


def _lzip_c(data, level=5, **kw):
    from ..containers import lzip
    return lzip.compress(data)


def _lzip_d(data, **kw):
    from ..containers import lzip
    return lzip.decompress(data)


_register("brotli", 0x4F71102, _brotli_c, _brotli_d, (0, 11))
# lzip is a container-level format like xz/gzip (decode support in the
# reference is the fork's LzHandler patch, README.md:147)
_register("lzip", 0, _lzip_c, _lzip_d, (1, 9))
_register("z", 0x30500, _z_c, _z_d, (9, 16))
_register("lz5", 0x4F71105, _lz5_c, _lz5_d, (1, 15))
_register("lizard", 0x4F71106, _lizard_c, _lizard_d, (10, 49))


def get_codec(name: str) -> CodecInfo:
    try:
        return CODECS[name.lower()]
    except KeyError:
        raise UnsupportedError(f"unknown codec {name!r}; "
                               f"available: {sorted(CODECS)}")
