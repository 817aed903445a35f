"""Disk image containers: MBR / GPT partition schemes and VHD images.

Behavioral references: CPP/7zip/Archive/MbrHandler.cpp (partition table
at 0x1BE, EBR chains for extended partitions), GptHandler.cpp ("EFI
PART" header at LBA 1, CRC-checked entry array), VhdHandler.cpp
("conectix" footer; fixed and dynamic/"cxsparse" BAT layouts).  Each
reader exposes partitions / the virtual disk as extractable members,
like the reference's read-only disk handlers.
"""

from __future__ import annotations

import struct
import zlib

from ..utils.errors import CorruptError

_SECTOR = 512

_MBR_TYPES = {
    0x01: "FAT12", 0x04: "FAT16", 0x05: "Extended", 0x06: "FAT16B",
    0x07: "NTFS", 0x0B: "FAT32", 0x0C: "FAT32-LBA", 0x0E: "FAT16-LBA",
    0x0F: "Extended-LBA", 0x82: "Linux-swap", 0x83: "Linux",
    0x8E: "Linux-LVM", 0xA5: "FreeBSD", 0xEE: "GPT-protective",
    0xEF: "EFI",
}


def is_mbr(raw: bytes) -> bool:
    if len(raw) < _SECTOR or raw[510:512] != b"\x55\xaa":
        return False
    # at least one plausible partition entry
    for k in range(4):
        e = raw[0x1BE + 16 * k:0x1BE + 16 * k + 16]
        status, ptype = e[0], e[4]
        lba, count = struct.unpack_from("<II", e, 8)
        if ptype and status in (0x00, 0x80) and count and \
                (lba + count) * _SECTOR <= len(raw) + (32 << 20):
            return True
    return False


def read_mbr(raw: bytes) -> dict:
    """Partitions as members named '<index>.<type>' (MbrHandler.cpp
    naming by partition kind).  Extended partitions are walked through
    their EBR chain."""
    if len(raw) < _SECTOR or raw[510:512] != b"\x55\xaa":
        raise CorruptError("mbr: missing boot signature")
    files: dict = {}

    def add(idx, ptype, lba, count):
        start = lba * _SECTOR
        size = count * _SECTOR
        if start + size > len(raw):
            raise CorruptError("mbr: partition outside image")
        tname = _MBR_TYPES.get(ptype, f"{ptype:02x}")
        files[f"{idx}.{tname}"] = raw[start:start + size]

    idx = 0
    ext_base = None
    for k in range(4):
        e = raw[0x1BE + 16 * k:0x1BE + 16 * k + 16]
        ptype = e[4]
        if ptype == 0:
            continue
        lba, count = struct.unpack_from("<II", e, 8)
        if ptype in (0x05, 0x0F):
            ext_base = lba
        else:
            add(idx, ptype, lba, count)
        idx += 1
    # EBR chain
    if ext_base is not None:
        ebr_lba = ext_base
        for _ in range(128):  # chain bound
            off = ebr_lba * _SECTOR
            if off + _SECTOR > len(raw):
                raise CorruptError("mbr: EBR outside image")
            sec = raw[off:off + _SECTOR]
            if sec[510:512] != b"\x55\xaa":
                raise CorruptError("mbr: bad EBR signature")
            e0 = sec[0x1BE:0x1BE + 16]
            if e0[4]:
                lba, count = struct.unpack_from("<II", e0, 8)
                add(idx, e0[4], ebr_lba + lba, count)
                idx += 1
            e1 = sec[0x1CE:0x1CE + 16]
            if e1[4] in (0x05, 0x0F):
                nxt = struct.unpack_from("<I", e1, 8)[0]
                ebr_lba = ext_base + nxt
            else:
                break
    return files


def is_gpt(raw: bytes) -> bool:
    return len(raw) >= 2 * _SECTOR and \
        raw[_SECTOR:_SECTOR + 8] == b"EFI PART"


def read_gpt(raw: bytes) -> dict:
    """GPT partitions as members named by their UTF-16 label (or index).

    Header and entry-array CRC32s are enforced (GptHandler.cpp)."""
    if not is_gpt(raw):
        raise CorruptError("gpt: missing EFI PART header")
    hdr = raw[_SECTOR:2 * _SECTOR]
    (hsize, hcrc) = struct.unpack_from("<II", hdr, 12)
    if hsize < 92 or hsize > _SECTOR:
        raise CorruptError("gpt: bad header size")
    calc = zlib.crc32(hdr[:16] + b"\0\0\0\0" + hdr[20:hsize])
    if calc != hcrc:
        raise CorruptError("gpt: header CRC mismatch")
    entries_lba, nentries, esize, ecrc = struct.unpack_from("<QIII",
                                                            hdr, 72)
    if esize < 128 or nentries > 1024:
        raise CorruptError("gpt: bad entry geometry")
    eoff = entries_lba * _SECTOR
    earr = raw[eoff:eoff + nentries * esize]
    if len(earr) != nentries * esize:
        raise CorruptError("gpt: entry array outside image")
    if zlib.crc32(earr) != ecrc:
        raise CorruptError("gpt: entry array CRC mismatch")
    files: dict = {}
    for k in range(nentries):
        e = earr[k * esize:(k + 1) * esize]
        if e[:16] == b"\0" * 16:
            continue
        first, last = struct.unpack_from("<QQ", e, 32)
        name = e[56:56 + 72].decode("utf-16-le").rstrip("\0")
        start = first * _SECTOR
        size = (last - first + 1) * _SECTOR
        if last < first or start + size > len(raw):
            raise CorruptError("gpt: partition outside image")
        files[name or f"part{k}"] = raw[start:start + size]
    return files


# ----------------------------------------------------------------- vhd ---

def is_vhd(raw: bytes) -> bool:
    return (len(raw) >= _SECTOR and
            (raw[-512:-504] == b"conectix" or raw[:8] == b"conectix"))


def _vhd_footer(raw: bytes) -> dict:
    ft = raw[-512:]
    if ft[:8] != b"conectix":
        ft = raw[:512]  # dynamic disks carry a copy up front
        if ft[:8] != b"conectix":
            raise CorruptError("vhd: missing footer cookie")
    csum = struct.unpack_from(">I", ft, 64)[0]
    calc = (~sum(ft[:64] + ft[68:512])) & 0xFFFFFFFF
    if calc != csum:
        raise CorruptError("vhd: footer checksum mismatch")
    data_offset, = struct.unpack_from(">Q", ft, 16)
    cur_size, = struct.unpack_from(">Q", ft, 48)
    dtype, = struct.unpack_from(">I", ft, 60)
    return {"data_offset": data_offset, "size": cur_size, "type": dtype}


def read_vhd(raw: bytes) -> dict:
    """VHD virtual disk content as a single member 'disk.img' (fixed and
    dynamic layouts; VhdHandler.cpp)."""
    ft = _vhd_footer(raw)
    if ft["type"] == 2:  # fixed
        return {"disk.img": raw[:ft["size"]]}
    if ft["type"] != 3:
        raise CorruptError(f"vhd: unsupported disk type {ft['type']}")
    # dynamic: sparse header at data_offset
    dh_off = ft["data_offset"]
    dh = raw[dh_off:dh_off + 1024]
    if dh[:8] != b"cxsparse":
        raise CorruptError("vhd: missing dynamic header cookie")
    table_offset, = struct.unpack_from(">Q", dh, 16)
    max_entries, = struct.unpack_from(">I", dh, 28)
    block_size, = struct.unpack_from(">I", dh, 32)
    if block_size == 0 or block_size % _SECTOR:
        raise CorruptError("vhd: bad block size")
    bitmap_sectors = -(-(block_size // _SECTOR) // (8 * _SECTOR))
    out = bytearray(ft["size"])
    bat = struct.unpack_from(f">{max_entries}I", raw, table_offset)
    for bi, entry in enumerate(bat):
        if entry == 0xFFFFFFFF:
            continue  # unallocated block reads as zeros
        src = (entry + bitmap_sectors) * _SECTOR
        dst = bi * block_size
        take = min(block_size, len(out) - dst)
        if take <= 0:
            break
        if src + take > len(raw):
            raise CorruptError("vhd: block outside image")
        out[dst:dst + take] = raw[src:src + take]
    return {"disk.img": bytes(out)}


def write_vhd_fixed(disk: bytes) -> bytes:
    """Produce a fixed VHD (footer only) — the writer counterpart used
    by tests and the CLI 'a -tvhd' verb."""
    size = len(disk)
    if size % _SECTOR:
        disk = disk + b"\0" * (_SECTOR - size % _SECTOR)
        size = len(disk)
    ft = bytearray(512)
    ft[0:8] = b"conectix"
    struct.pack_into(">I", ft, 8, 2)          # features: reserved bit
    struct.pack_into(">I", ft, 12, 0x00010000)  # version 1.0
    struct.pack_into(">Q", ft, 16, 0xFFFFFFFFFFFFFFFF)  # fixed: no data
    struct.pack_into(">I", ft, 28, 0x74707A37)  # creator 'tpz7'
    struct.pack_into(">Q", ft, 40, size)      # original size
    struct.pack_into(">Q", ft, 48, size)      # current size
    # CHS geometry (simplified cylinder math, ATA spec appendix style)
    sectors = size // _SECTOR
    spt, heads = 17, 4
    cyls = min(0xFFFF, sectors // (spt * heads) or 1)
    struct.pack_into(">HBB", ft, 56, cyls, heads, spt)
    struct.pack_into(">I", ft, 60, 2)         # type: fixed
    csum = (~sum(ft[:64] + ft[68:512])) & 0xFFFFFFFF
    struct.pack_into(">I", ft, 64, csum)
    return disk + bytes(ft)
