"""NSIS installer (partial reader).

Behavioral reference: CPP/7zip/Archive/Nsis/NsisIn.cpp — firstheader
scan at 512-byte steps (0xDEADBEEF + "NullsoftInst"), the
solid/non-solid × lzma/bzip2/deflate/zstd stream-shape detection table
(NsisIn.cpp:5777-5820), and block extraction.  Partial: members are
exposed by data index with the decoded install header as
`[NSIS].nsi-header` — the reference's full script interpreter
(EW_EXTRACTFILE name recovery over the entries/string tables) is not
implemented; NSIS-flavored bzip2 payloads are rejected with a clear
error.
"""

from __future__ import annotations

import struct

from ..utils.errors import CorruptError, UnsupportedError

_MAGIC = b"\xef\xbe\xad\xdeNullsoftInst"
_COMPRESSED = 0x80000000


def find_firstheader(raw: bytes):
    for off in range(0, max(len(raw) - 28, 0) + 1, 512):
        if raw[off + 4:off + 20] == _MAGIC:
            flags, = struct.unpack_from("<I", raw, off)
            hdr_size, arc_size = struct.unpack_from("<II", raw,
                                                    off + 20)
            return {"offset": off, "flags": flags,
                    "header_size": hdr_size, "arc_size": arc_size,
                    "data_offset": off + 28}
    return None


def is_nsis(raw: bytes) -> bool:
    return find_firstheader(raw) is not None


def _is_lzma(p: bytes):
    """(is_lzma, filter_flag_present) — NsisIn.cpp IsLZMA."""
    def plain(q):
        return (len(q) >= 7 and q[0] == 0x5D and q[1] == 0 and
                q[2] == 0 and q[5] == 0 and not q[6] & 0x80)
    if plain(p):
        return True, False
    if p and p[0] <= 1 and plain(p[1:]):
        return True, True
    return False, False


def _decompress(method: str, data: bytes, out_size=None) -> bytes:
    if method == "lzma":
        flt, props_off = ((True, 1) if data and data[0] <= 1 and
                          data[1:2] == b"\x5d" else (False, 0))
        if flt and data[0] == 1:
            raise UnsupportedError("nsis: BCJ-filtered LZMA stream")
        props = data[props_off:props_off + 5]
        from ..models.lzma import decoder
        if out_size is not None:
            return decoder.decompress_raw(data[props_off + 5:], props,
                                          out_size)
        # solid stream of unknown total size: end-marker terminated
        lc, lp, pb = decoder.parse_props_byte(props[0])
        dec = decoder.LzmaDecoder(lc, lp, pb, 1 << 16)
        dec.decode_chunk(data[props_off + 5:], None,
                         expect_end_marker=True)
        return dec.out[:dec.pos].tobytes()
    if method == "deflate":
        from ..models import deflate
        return deflate.decompress(data, max_out=out_size)
    if method == "zstd":
        from ..models.zstd import frame
        return frame.decompress(data)
    raise UnsupportedError(f"nsis: {method} streams not supported")


def _detect(sig: bytes, header_size: int):
    """(method, solid) per the NsisIn.cpp:5777 shape table."""
    csize, = struct.unpack_from("<I", sig, 0)
    if csize == header_size:
        return "copy", False
    if _is_lzma(sig)[0]:
        return "lzma", True
    if sig[3] == 0x80:
        if _is_lzma(sig[4:])[0]:
            return "lzma", False
        if sig[4] == 0x31 and sig[5] < 14:
            return "bzip2", False
        if sig[4:8] == b"\x28\xb5\x2f\xfd":
            return "zstd", False
        return "deflate", False
    if sig[0] == 0x31 and sig[1] < 14:
        return "bzip2", True
    if sig[:4] == b"\x28\xb5\x2f\xfd":
        return "zstd", True
    return "deflate", True


def read_nsis(raw: bytes) -> dict:
    fh = find_firstheader(raw)
    if fh is None:
        raise CorruptError("nsis: no firstheader found")
    dpos = fh["data_offset"]
    sig = raw[dpos:dpos + 12]
    if len(sig) < 12:
        raise CorruptError("nsis: truncated data stream")
    method, solid = _detect(sig, fh["header_size"])
    files: dict = {}
    if solid:
        blob = _decompress(method, raw[dpos:fh["offset"]
                                       + fh["arc_size"] or None])
        header = blob[:fh["header_size"]]
        files["[NSIS].nsi-header"] = header
        pos = fh["header_size"]
        idx = 0
        while pos + 4 <= len(blob):
            size, = struct.unpack_from("<I", blob, pos)
            pos += 4
            size &= ~_COMPRESSED  # solid: already decompressed
            body = blob[pos:pos + size]
            if len(body) != size:
                raise CorruptError("nsis: truncated solid member")
            files[f"data_{idx:04d}.bin"] = body
            pos += size
            idx += 1
        return files
    # non-solid: header block first, then independent blocks
    chs, = struct.unpack_from("<I", raw, dpos)
    compressed = bool(chs & _COMPRESSED)
    chs &= ~_COMPRESSED
    hdr_raw = raw[dpos + 4:dpos + 4 + chs]
    if len(hdr_raw) != chs:
        raise CorruptError("nsis: truncated header block")
    header = _decompress(method, hdr_raw, fh["header_size"]) \
        if compressed else hdr_raw
    if len(header) != fh["header_size"]:
        raise CorruptError("nsis: header size mismatch")
    files["[NSIS].nsi-header"] = header
    pos = dpos + 4 + chs
    end = fh["offset"] + fh["arc_size"]
    idx = 0
    while pos + 4 <= min(end, len(raw)):
        size, = struct.unpack_from("<I", raw, pos)
        pos += 4
        comp = bool(size & _COMPRESSED)
        size &= ~_COMPRESSED
        body = raw[pos:pos + size]
        if len(body) != size:
            raise CorruptError("nsis: truncated member block")
        files[f"data_{idx:04d}.bin"] = _decompress(method, body) \
            if comp else body
        pos += size
        idx += 1
    return files
