"""Skippable-frame MT container.

Behavioral reference: C/zstdmt/README.md:9-29 — each worker's compressed
frame is preceded by a 12-byte skippable frame carrying the compressed
size, so a parallel decoder can locate frame boundaries without parsing
codec payloads. The same magic range (0x184D2A50..5F) is shared by zstd
and lz4 frame parsers, which skip them transparently — the container is
therefore also decodable by any standard single-threaded decoder.

This is tpu7z's shard boundary: one payload frame per mesh shard.
"""

from __future__ import annotations

from ..utils.errors import CorruptError

MAGIC = 0x184D2A50


def write_container(frames: list[bytes]) -> bytes:
    out = bytearray()
    for f in frames:
        out += MAGIC.to_bytes(4, "little")
        out += (4).to_bytes(4, "little")
        out += len(f).to_bytes(4, "little")
        out += f
    return bytes(out)


def parse_container(data: bytes):
    """Return [(offset, size)] of payload frames; tolerates a bare stream
    (no skippable headers) by returning a single full-span entry."""
    spans = []
    pos = 0
    n = len(data)
    while pos + 12 <= n:
        magic = int.from_bytes(data[pos:pos + 4], "little")
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        if magic != MAGIC or size != 4:
            break
        flen = int.from_bytes(data[pos + 8:pos + 12], "little")
        if pos + 12 + flen > n:
            raise CorruptError("skippable container: frame overruns input")
        spans.append((pos + 12, flen))
        pos += 12 + flen
    if not spans or pos != n:
        return [(0, n)]
    return spans
