"""Disk-image (MBR/GPT/VHD/qcow2/VDI/VMDK) and misc handler tests.

Strategy follows the reference's handler tests: synthesize a minimal
valid image per format, read it back, and probe corrupt variants
(tests/main.test style golden checks).
"""

import struct
import zlib

import pytest

from tpu7z.containers import disk, fat, misc
from tpu7z.utils.errors import CorruptError


# ------------------------------------------------------------- mbr/gpt ---

def _mk_mbr():
    img = bytearray(512 * 64)
    payload = b"PARTDATA" * 64
    img[512 * 8:512 * 8 + len(payload)] = payload
    e = struct.pack("<BBHBBH II", 0x80, 0, 0, 0x83, 0, 0, 8, 16)
    img[0x1BE:0x1BE + 16] = e
    img[510:512] = b"\x55\xaa"
    return bytes(img), payload


def test_mbr_roundtrip():
    img, payload = _mk_mbr()
    assert disk.is_mbr(img)
    parts = disk.read_mbr(img)
    assert len(parts) == 1
    (name, content), = parts.items()
    assert "Linux" in name
    assert content[:len(payload)] == payload
    assert len(content) == 16 * 512


def test_mbr_corrupt():
    img, _ = _mk_mbr()
    bad = img[:510] + b"\0\0" + img[512:]
    with pytest.raises(CorruptError):
        disk.read_mbr(bad)


def _mk_gpt():
    nsec = 128
    img = bytearray(512 * nsec)
    # protective MBR
    img[510:512] = b"\x55\xaa"
    # one entry at LBA 2, partition sectors 34..37
    entry = bytearray(128)
    entry[0:16] = b"\x01" * 16
    struct.pack_into("<QQ", entry, 32, 34, 37)
    entry[56:56 + 8] = "DATA".encode("utf-16-le")
    earr = bytes(entry) + b"\0" * 128 * 127
    img[1024:1024 + len(earr)] = earr
    payload = b"gptpart!" * 256
    img[34 * 512:34 * 512 + len(payload)] = payload
    hdr = bytearray(92)
    hdr[0:8] = b"EFI PART"
    struct.pack_into("<I", hdr, 8, 0x00010000)
    struct.pack_into("<I", hdr, 12, 92)
    struct.pack_into("<QIII", hdr, 72, 2, 128, 128, zlib.crc32(earr))
    crc = zlib.crc32(bytes(hdr[:16]) + b"\0\0\0\0" + bytes(hdr[20:92]))
    struct.pack_into("<I", hdr, 16, crc)
    img[512:512 + 92] = hdr
    return bytes(img), payload


def test_gpt_roundtrip():
    img, payload = _mk_gpt()
    assert disk.is_gpt(img)
    parts = disk.read_gpt(img)
    assert list(parts) == ["DATA"]
    assert parts["DATA"][:len(payload)] == payload
    assert len(parts["DATA"]) == 4 * 512


def test_gpt_crc_enforced():
    img, _ = _mk_gpt()
    bad = bytearray(img)
    bad[34 * 512 - 512 * 32] ^= 0  # keep header, corrupt entry array
    bad[1024] ^= 0xFF
    with pytest.raises(CorruptError):
        disk.read_gpt(bytes(bad))


# ----------------------------------------------------------------- vhd ---

def test_vhd_fixed_roundtrip():
    payload = b"virtual-disk-bytes" * 100
    img = disk.write_vhd_fixed(payload)
    assert disk.is_vhd(img)
    out = disk.read_vhd(img)["disk.img"]
    assert out[:len(payload)] == payload


def test_vhd_checksum_enforced():
    img = bytearray(disk.write_vhd_fixed(b"x" * 512))
    img[-512 + 20] ^= 0xFF
    with pytest.raises(CorruptError):
        disk.read_vhd(bytes(img))


# --------------------------------------------------------------- qcow2 ---

def _mk_qcow2(payload: bytes):
    cb = 16  # 64KB clusters
    csize = 1 << cb
    size = csize  # one-cluster disk
    hdr = bytearray(csize)
    hdr[0:4] = b"QFI\xfb"
    struct.pack_into(">I", hdr, 4, 2)
    struct.pack_into(">I", hdr, 20, cb)
    struct.pack_into(">Q", hdr, 24, size)
    struct.pack_into(">I", hdr, 36, 1)          # l1 size
    struct.pack_into(">Q", hdr, 40, csize)      # l1 offset
    l1 = bytearray(csize)
    struct.pack_into(">Q", l1, 0, 2 * csize)    # -> L2 at cluster 2
    l2 = bytearray(csize)
    struct.pack_into(">Q", l2, 0, 3 * csize)    # data at cluster 3
    data = payload.ljust(csize, b"\0")
    return bytes(hdr) + bytes(l1) + bytes(l2) + data


def test_qcow2_roundtrip():
    payload = b"qcow2 cluster payload " * 10
    img = _mk_qcow2(payload)
    assert disk.is_qcow(img)
    out = disk.read_qcow(img)["disk.img"]
    assert out[:len(payload)] == payload
    assert len(out) == 1 << 16


def test_qcow2_rejects_encryption():
    img = bytearray(_mk_qcow2(b"x"))
    struct.pack_into(">I", img, 32, 1)
    with pytest.raises(CorruptError):
        disk.read_qcow(bytes(img))


# ----------------------------------------------------------------- vdi ---

def test_vdi_roundtrip():
    bs = 1 << 20
    payload = b"vdi block zero" * 9
    hdr = bytearray(512)
    hdr[64:68] = b"\x7f\x10\xda\xbe"
    struct.pack_into("<II", hdr, 340, 512, 512 + 4 * 2)  # maps, data
    struct.pack_into("<Q", hdr, 368, 2 * bs)
    struct.pack_into("<I", hdr, 376, bs)   # cbBlock @ 0x178
    struct.pack_into("<I", hdr, 384, 2)    # cBlocks @ 0x180
    bmap = struct.pack("<II", 0, 0xFFFFFFFF)  # blk0 alloc'd, blk1 sparse
    img = bytes(hdr)[:340 + 8] + b""  # rebuild precisely below
    base = bytearray(600)
    base[:512] = hdr
    base[512:512 + 8] = bmap
    data0 = payload.ljust(bs, b"\0")
    img = bytes(base[:520]) + data0
    out = disk.read_vdi(img)["disk.img"]
    assert out[:len(payload)] == payload
    assert len(out) == 2 * bs
    assert out[bs:] == b"\0" * bs


# ---------------------------------------------------------------- vmdk ---

def test_vmdk_sparse_roundtrip():
    grain = 128  # sectors
    gb = grain * 512
    cap = grain * 2  # two grains
    hdr = bytearray(512)
    hdr[0:4] = b"KDMV"
    struct.pack_into("<IIQQQQIQQQ", hdr, 4,
                     1, 0, cap, grain, 0, 0, 512, 0, 1, 0)
    gd = struct.pack("<I", 2) + b"\0" * 508       # GT at sector 2
    gt = struct.pack("<I", 3) + b"\0" * 508       # grain 0 at sector 3
    payload = b"vmdk grain data" * 32
    data = payload.ljust(gb, b"\0")
    img = bytes(hdr) + gd + gt + data
    out = disk.read_vmdk(img)["disk.img"]
    assert out[:len(payload)] == payload
    assert len(out) == cap * 512
    assert out[gb:] == b"\0" * gb


# ----------------------------------------------------------------- fat ---

def test_fat16_roundtrip():
    files = {"HELLO.TXT": b"hello fat world" * 100,
             "B.BIN": bytes(range(256)) * 40}
    img = fat.write_fat16(files)
    assert fat.is_fat(img)
    out = fat.read_fat(img)
    assert out["HELLO.TXT"] == files["HELLO.TXT"]
    assert out["B.BIN"] == files["B.BIN"]


def test_fat_corrupt():
    with pytest.raises(CorruptError):
        fat.read_fat(b"\0" * 1024)


# ----------------------------------------------------------------- swf ---

def test_swf_cws_roundtrip():
    body = b"\x78\x00" + b"swf tag soup " * 50
    movie = b"FWS\x06" + struct.pack("<I", 8 + len(body)) + body
    cws = misc.write_swf_cws(movie)
    assert misc.is_swf(cws)
    out = misc.read_swf(cws)
    assert out["movie.swf"] == movie
    # plain FWS passes through
    assert misc.read_swf(movie)["movie.swf"] == movie


def test_swf_corrupt():
    with pytest.raises(CorruptError):
        misc.read_swf(b"CWS\x06\x20\x00\x00\x00garbage-not-zlib")


# ----------------------------------------------------------------- flv ---

def test_flv_streams():
    hdr = b"FLV\x01\x05" + struct.pack(">I", 9) + b"\0\0\0\0"
    a = b"\xafAUDIO"
    v = b"\x17VIDEO"
    tag_a = bytes([8]) + len(a).to_bytes(3, "big") + b"\0" * 7 + a \
        + struct.pack(">I", 11 + len(a))
    tag_v = bytes([9]) + len(v).to_bytes(3, "big") + b"\0" * 7 + v \
        + struct.pack(">I", 11 + len(v))
    out = misc.read_flv(hdr + tag_a + tag_v)
    assert out["audio"] == a
    assert out["video"] == v


# ---------------------------------------------------------------- ihex ---

def test_ihex_roundtrip():
    image = bytes(range(256)) * 300  # crosses a 64KB upper boundary
    txt = misc.write_ihex(image)
    assert misc.is_ihex(txt)
    assert misc.read_ihex(txt)["image.bin"] == image


def test_ihex_checksum():
    bad = b":0400000001020304FF\n"  # wrong checksum
    with pytest.raises(CorruptError):
        misc.read_ihex(bad)


# -------------------------------------------------------------- base64 ---

def test_base64():
    import base64 as b64
    data = bytes(range(256))
    txt = b64.encodebytes(data)
    assert misc.is_base64(txt)
    assert misc.read_base64(txt)["data.bin"] == data


# ------------------------------------------------------------ pe / elf ---

def test_elf_sections_of_real_binary():
    import sys
    exe = open(sys.executable, "rb").read()
    if not misc.is_elf(exe):
        pytest.skip("host python is not ELF")
    sects = misc.read_elf(exe)
    assert any(n.startswith(".text") for n in sects)


def test_pe_minimal():
    # handcrafted single-section PE
    dos = bytearray(0x40)
    dos[0:2] = b"MZ"
    struct.pack_into("<I", dos, 0x3C, 0x40)
    coff = b"PE\0\0" + struct.pack("<HHIIIHH", 0x8664, 1, 0, 0, 0, 0, 0)
    sect = (b".data\0\0\0" + struct.pack("<IIII", 16, 0x1000, 16, 0x80)
            + b"\0" * 16)
    img = bytes(dos) + coff + sect
    img = img.ljust(0x80, b"\0") + b"SECTION-CONTENT!"
    assert misc.is_pe(img)
    out = misc.read_pe(img)
    assert out[".data"] == b"SECTION-CONTENT!"


def test_macho_minimal():
    seg = (struct.pack("<II", 0x19, 72) + b"__TEXT".ljust(16, b"\0")
           + b"\0" * 16 + struct.pack("<QQ", 0x70, 8) + b"\0" * 16)
    hdr = b"\xcf\xfa\xed\xfe" + struct.pack("<iiIIIII", 0x0100000c, 0,
                                            2, 1, len(seg), 0, 0)
    img = (hdr + seg).ljust(0x70, b"\0") + b"machtext"
    assert misc.is_macho(img)
    out = misc.read_macho(img)
    assert out["__TEXT"] == b"machtext"


# ----------------------------------------------------------------- arj ---

def test_arj_roundtrip():
    files = {"a.txt": b"arj stored payload" * 20, "b.bin": b"\x00\xff" * 99}
    arc = misc.write_arj(files)
    assert misc.is_arj(arc)
    assert misc.read_arj(arc) == files


def test_arj_header_crc():
    arc = bytearray(misc.write_arj({"x": b"y"}))
    arc[10] ^= 0xFF
    with pytest.raises(CorruptError):
        misc.read_arj(bytes(arc))


# ---------------------------------------------------------------- apfs ---

def test_apfs_roundtrip_and_cli():
    from tpu7z.containers import apfs
    files = {"a.txt": b"alpha beta gamma " * 50, "sub.bin": bytes(range(200)),
             "empty": b""}
    img = apfs.write_apfs(files)
    assert apfs.read_apfs(img) == files
    # corrupt object checksum detected
    bad = bytearray(img)
    bad[64] ^= 0x55
    with pytest.raises(CorruptError):
        apfs.read_apfs(bytes(bad))
    # CLI sniff + list
    import subprocess, sys, tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "disk.apfs")
        open(p, "wb").write(img)
        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        r = subprocess.run([sys.executable, "-m", "tpu7z.cli", "l", p],
                           capture_output=True, env=env, timeout=120)
        assert r.returncode == 0, r.stdout + r.stderr
        assert b"a.txt" in r.stdout
