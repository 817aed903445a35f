"""NTFS reader tests over a synthesized minimal volume.

Mirrors the reference handler-test style (tests/main.test): build a
tiny valid image, read it back, probe torn/corrupt records.
"""

import struct

import pytest

from tpu7z.containers import ntfs
from tpu7z.utils.errors import CorruptError

BPS = 512
SPC = 8            # 4KB clusters
CB = BPS * SPC
REC = 1024


def _usa_record(body: bytes, usn=b"\x99\x99") -> bytes:
    """Install the update sequence array over a REC-byte FILE record."""
    rec = bytearray(body.ljust(REC, b"\0"))
    usa_off, usa_count = 0x30, 1 + REC // BPS
    struct.pack_into("<HH", rec, 4, usa_off, usa_count)
    rec[usa_off:usa_off + 2] = usn
    for k in range(1, usa_count):
        pos = k * BPS - 2
        rec[usa_off + 2 * k:usa_off + 2 * k + 2] = rec[pos:pos + 2]
        rec[pos:pos + 2] = usn
    return bytes(rec)


def _attr_resident(atype: int, value: bytes, name_len=0) -> bytes:
    hdr_len = 24
    alen = (hdr_len + len(value) + 7) & ~7
    a = bytearray(alen)
    struct.pack_into("<II", a, 0, atype, alen)
    a[8] = 0            # resident
    a[9] = name_len
    struct.pack_into("<IH", a, 16, len(value), hdr_len)
    a[hdr_len:hdr_len + len(value)] = value
    return bytes(a)


def _attr_nonres(atype: int, runs: bytes, vcns: int, real: int) -> bytes:
    hdr_len = 0x40
    alen = (hdr_len + len(runs) + 7) & ~7
    a = bytearray(alen)
    struct.pack_into("<II", a, 0, atype, alen)
    a[8] = 1            # non-resident
    struct.pack_into("<QQ", a, 16, 0, vcns - 1)
    struct.pack_into("<H", a, 32, hdr_len)
    struct.pack_into("<Q", a, 40, vcns * CB)   # allocated
    struct.pack_into("<Q", a, 48, real)        # real size
    struct.pack_into("<Q", a, 56, real)        # initialized
    a[hdr_len:hdr_len + len(runs)] = runs
    return bytes(a)


def _file_record(attrs: list, flags=1) -> bytes:
    rec = bytearray(0x38)
    rec[0:4] = b"FILE"
    struct.pack_into("<H", rec, 20, 0x38)      # first attr offset
    struct.pack_into("<H", rec, 22, flags)
    body = bytes(rec)
    for a in attrs:
        body += a
    body += b"\xff\xff\xff\xff\0\0\0\0"
    return _usa_record(body)


def _fname(parent: int, name: str, ns=1) -> bytes:
    enc = name.encode("utf-16-le")
    v = bytearray(66 + len(enc))
    struct.pack_into("<Q", v, 0, parent)
    v[64] = len(name)
    v[65] = ns
    v[66:] = enc
    return bytes(v)


def _mk_volume():
    """Layout: cluster 0-1 boot/padding, MFT at cluster 2 (4 records),
    file data at cluster 4."""
    nclusters = 16
    img = bytearray(nclusters * CB)
    # boot sector
    img[3:11] = b"NTFS    "
    struct.pack_into("<H", img, 11, BPS)
    img[13] = SPC
    struct.pack_into("<Q", img, 40, nclusters)   # total sectors field
    struct.pack_into("<Q", img, 48, 2)           # MFT LCN
    struct.pack_into("<b", img, 64, -10)         # 2^10 = 1KB records
    img[510:512] = b"\x55\xaa"

    big = b"NONRES-" * 700                       # ~4.9KB, 2 clusters
    # MFT records
    recs = []
    # rec 0: $MFT itself — $DATA run list: 1 cluster at LCN 2
    mft_runs = bytes([0x11, 0x01, 0x02])         # len=1, lcn=+2
    recs.append(_file_record([
        _attr_resident(0x30, _fname(5, "$MFT")),
        _attr_nonres(0x80, mft_runs, 1, 4 * REC)]))
    # indices 1-4 meta placeholders, 5 root, 6 resident file,
    # 7 dir, 8 file-in-dir, 9 non-resident file
    for _ in range(1, 5):
        recs.append(_file_record([
            _attr_resident(0x30, _fname(5, "$Meta"))]))
    recs.append(_file_record([_attr_resident(0x30, _fname(5, "."))],
                             flags=3))
    recs.append(_file_record([
        _attr_resident(0x30, _fname(5, "hello.txt")),
        _attr_resident(0x80, b"resident file content")]))
    recs.append(_file_record([_attr_resident(0x30, _fname(5, "sub"))],
                             flags=3))
    recs.append(_file_record([
        _attr_resident(0x30, _fname(7, "inner.bin")),
        _attr_resident(0x80, b"\x01\x02\x03\x04")]))
    data_runs = bytes([0x11, 0x02, 0x06])        # 2 clusters at LCN 6
    recs.append(_file_record([
        _attr_resident(0x30, _fname(5, "big.dat")),
        _attr_nonres(0x80, data_runs, 2, len(big))]))

    # MFT needs to cover 10 records = 10KB = 3 clusters at LCN 2
    mft_bytes = b"".join(recs)
    nmft_clusters = -(-len(mft_bytes) // CB)
    recs[0] = _file_record([
        _attr_resident(0x30, _fname(5, "$MFT")),
        _attr_nonres(0x80, bytes([0x11, nmft_clusters, 0x02]),
                     nmft_clusters, len(mft_bytes))])
    mft_bytes = b"".join(recs)
    img[2 * CB:2 * CB + len(mft_bytes)] = mft_bytes
    img[6 * CB:6 * CB + len(big)] = big
    return bytes(img), big


def test_ntfs_read():
    img, big = _mk_volume()
    assert ntfs.is_ntfs(img)
    files = ntfs.read_ntfs(img)
    assert files["hello.txt"] == b"resident file content"
    assert files["sub/inner.bin"] == b"\x01\x02\x03\x04"
    assert files["big.dat"] == big


def test_ntfs_torn_record_rejected():
    img, _ = _mk_volume()
    bad = bytearray(img)
    # corrupt a sector-end check word inside MFT record 0
    bad[2 * CB + 510] ^= 0xFF
    with pytest.raises(CorruptError):
        ntfs.read_ntfs(bytes(bad))


def test_ntfs_bad_boot():
    with pytest.raises(CorruptError):
        ntfs.read_ntfs(b"\0" * 8192)


def _attr_nonres_comp(atype: int, runs: bytes, vcns: int, real: int,
                      cu_field: int = 4) -> bytes:
    """Non-resident attribute with the compressed flag + compression
    unit field (NtfsHandler.cpp compressed $DATA layout)."""
    a = bytearray(_attr_nonres(atype, runs, vcns, real))
    struct.pack_into("<H", a, 12, 0x0001)     # flags: compressed
    struct.pack_into("<H", a, 34, cu_field)   # 2^4 = 16-cluster units
    return bytes(a)


def test_ntfs_compressed_attribute():
    """A compressed $DATA attribute (LZNT1, 16-cluster units padded by
    a sparse run) decodes; uses the reader's own lznt1 compressor for
    the fixture, mirroring the DMG/HFS writer-fixture pattern."""
    img, _big = _mk_volume()
    img = bytearray(img + b"\0" * (16 * CB))
    payload = (b"ntfs compressed payload line\n" * 2000)[: 3 * CB + 123]
    comp = ntfs.lznt1_compress(payload.ljust(16 * CB, b"\0"))
    nc = -(-len(comp) // CB)
    assert nc < 16
    data_lcn = 16  # appended clusters
    img[data_lcn * CB:data_lcn * CB + len(comp)] = comp
    # runlist: nc data clusters at LCN 16, then (16-nc) sparse
    runs = bytes([0x11, nc, data_lcn]) + bytes([0x01, 16 - nc])
    rec = _file_record([
        _attr_resident(0x30, _fname(5, "packed.bin")),
        _attr_nonres_comp(0x80, runs, 16, len(payload))])
    # overwrite the hello.txt record (index 6) in place
    mft_off = 2 * CB
    img[mft_off + 6 * REC:mft_off + 7 * REC] = rec
    files = ntfs.read_ntfs(bytes(img))
    assert files["packed.bin"] == payload
