"""tpu7z console frontend — the 7z CLI analog.

Behavioral reference: CPP/7zip/UI/Console (MainAr.cpp:30 -> Main2) and
the switch table of UI/Common/ArchiveCommandLine.cpp:278-360. Verbs:

  a  add/create     u  update       x/e extract     t  test
  l  list           h  hash         b  benchmark    i  info

Switches: -t{type} -m0={method} -mx{level} -p{password} -mhe[=on] -o{dir}
          -si -so -mmt{n} -mdev -y -i!{wildcard} -x!{wildcard} -r -slt
          -scrc -v{size} -bb (progress on) -bd (progress off)
Usage:  python -m tpu7z.cli a archive.7z file1 file2 ...
"""

from __future__ import annotations

import os
import sys
import time

from .. import VERSION_BANNER
from ..models.registry import CODECS, get_codec
from ..utils.errors import TpuzError

_EXT_TYPES = {
    ".7z": "7z", ".zst": "zstd", ".lz4": "lz4", ".xz": "xz",
    ".bz2": "bzip2", ".gz": "gzip", ".tar": "tar", ".br": "brotli",
    ".lz5": "lz5", ".liz": "lizard", ".lizard": "lizard", ".zip": "zip",
    ".squashfs": "squashfs", ".sqfs": "squashfs", ".cpio": "cpio",
    ".a": "ar", ".ar": "ar", ".deb": "ar", ".lib": "ar", ".rpm": "rpm",
    ".iso": "iso", ".Z": "z", ".taz": "z", ".xar": "xar",
    ".pkg": "xar", ".lzh": "lzh", ".lha": "lzh", ".lz": "lzip",
    ".tlz": "lzip", ".wim": "wim", ".swm": "wim", ".cab": "cab",
    ".ext2": "ext", ".ext3": "ext", ".ext4": "ext",
    ".vhd": "vhd", ".swf": "swf", ".flv": "flv", ".hex": "ihex",
    ".ihex": "ihex", ".b64": "base64", ".exe": "pe", ".dll": "pe",
    ".sys": "pe", ".so": "elf", ".dylib": "macho", ".arj": "arj",
    ".fat": "fat", ".ntfs": "ntfs", ".udf": "udf", ".chm": "chm",
    ".qcow2": "qcow", ".qcow": "qcow", ".vdi": "vdi", ".vmdk": "vmdk",
    ".dmg": "dmg", ".hfs": "hfs",
    ".vhdx": "vhdx", ".rar": "rar", ".apfs": "apfs",
    # .img is deliberately absent: generic disk images (FAT, raw dd,
    # hybrid ISO) are routed by the 0xEF53-at-1080 content sniff instead
}


# Extensions whose content must be sniffed first: .exe/.dll may be NSIS
# installers or SFX archives (NsisHandler/7zHandler accept them by
# content in the reference) — extension is only the fallback.
_AMBIGUOUS_EXTS = {".exe": "pe", ".dll": "pe", ".sys": "pe"}


def _sniff_type(path: str, data: bytes | None = None) -> str:
    fallback = None
    for ext, t in _AMBIGUOUS_EXTS.items():
        if path.endswith(ext):
            fallback = t
            break
    if fallback is None:
        for ext, t in _EXT_TYPES.items():
            if path.endswith(ext):
                return t
    if data:
        if data[:6] == b"7z\xbc\xaf\x27\x1c":
            return "7z"
        if data[:4] == b"\x28\xb5\x2f\xfd":
            return "zstd"
        if data[:4] == b"\x04\x22\x4d\x18":
            return "lz4"
        if data[:6] == b"\xfd7zXZ\x00":
            return "xz"
        if data[:3] == b"BZh":
            return "bzip2"
        if data[:2] == b"\x1f\x8b":
            return "gzip"
        if data[:2] == b"\x1f\x9d":
            return "z"
        if data[:4] == b"LZIP":
            return "lzip"
        if data[:8] == b"MSWIM\x00\x00\x00":
            return "wim"
        if data[:4] == b"MSCF":
            return "cab"
        if len(data) > 1082 and data[1080:1082] == b"\x53\xef":
            return "ext"
        if data[:4] == b"xar!":
            return "xar"
        if len(data) > 7 and data[2:5] == b"-lh" and data[6:7] == b"-":
            return "lzh"
        if data[:4] == b"\x05\x22\x4d\x18":
            return "lz5"
        if data[:4] == b"\x06\x22\x4d\x18":
            return "lizard"
        if data[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
            return "zip"
        if len(data) > 262 and data[257:262] == b"ustar":
            return "tar"
        if data[:4] == b"hsqs":
            return "squashfs"
        if data[:6] in (b"070701", b"070702", b"070707") or \
                data[:2] in (b"\xc7\x71", b"\x71\xc7"):
            return "cpio"
        if data[:8] == b"!<arch>\n":
            return "ar"
        if data[:4] == b"\xed\xab\xee\xdb":
            return "rpm"
        if len(data) > 16 * 2048 + 6 and \
                data[16 * 2048 + 1:16 * 2048 + 6] == b"CD001":
            return "iso"
        if data[:8] in (b"Rar!\x1a\x07\x00\x00", b"Rar!\x1a\x07\x01\x00") \
                or data[:7] == b"Rar!\x1a\x07\x00":
            return "rar"
        if data[:4] == b"ITSF":
            return "chm"
        from ..containers import nsis as _nsis
        if len(data) > 512 and data[:2] == b"MZ" and _nsis.is_nsis(data):
            return "nsis"
        if data[:3] in (b"FWS", b"CWS", b"ZWS"):
            return "swf"
        if data[:3] == b"FLV":
            return "flv"
        if data[:2] == b"\x60\xea":
            return "arj"
        if data[:3] == b"QFI":
            return "qcow"
        if data[:8] == b"vhdxfile":
            return "vhdx"
        if data[:4] == b"KDMV":
            return "vmdk"
        if data[64:68] == b"\x7f\x10\xda\xbe":
            return "vdi"
        if len(data) > 2048 * 17 and (
                data[2048 * 16 + 1:2048 * 16 + 6] == b"BEA01"):
            return "udf"
        if data[:4] == b"\x7fELF":
            return "elf"
        if len(data) >= 512 and data[-512:-508] == b"koly":
            return "dmg"
        if len(data) > 1536 and data[1024:1026] in (b"H+", b"HX"):
            return "hfs"
        from ..containers import misc as _misc, disk as _disk
        if _misc.is_macho(data):
            return "macho"
        if _misc.is_pe(data):
            return "pe"
        if len(data) > 512 and data[510:512] == b"\x55\xaa" and \
                (data[54:62] in (b"FAT12   ", b"FAT16   ")
                 or data[82:90] == b"FAT32   "):
            return "fat"
        if len(data) > 512 and data[3:11] == b"NTFS    ":
            return "ntfs"
        if data[32:36] == b"NXSB":
            return "apfs"
        if _disk.is_gpt(data):
            return "gpt"
        if _disk.is_vhd(data):
            return "vhd"
        if _misc.is_ihex(data):
            return "ihex"
        if _disk.is_mbr(data):
            return "mbr"
    if fallback is not None:
        # .exe/.dll with no recognized installer/archive content: if a 7z
        # SFX signature is embedded, open as 7z; else treat as PE/COFF.
        if data and data[:2] == b"MZ" and \
                data.find(b"7z\xbc\xaf\x27\x1c", 0, 1 << 22) > 0:
            return "7z"
        return fallback
    return "7z"


class Options:
    def __init__(self):
        self.type = None
        self.method = None
        self.level = None
        self.password = None
        self.encrypt_header = False
        self.outdir = "."
        self.stdin = False
        self.stdout = False
        self.yes = False
        self.threads = None
        self.slt = False
        self.scrc = None
        self.props = {}
        self.include = []   # -i! wildcards
        self.exclude = []   # -x! wildcards
        self.recurse = False
        self.volume = None  # -v{size}: split output into volumes
        # -mdev: compress on the device mesh (TPU); also on when the
        # TPU7Z_DEVICE env var is set
        self.device = os.environ.get("TPU7Z_DEVICE", "") not in ("", "0")
        self.progress = None  # -bb forces on, -bd forces off, None=tty


def _parse_switches(args):
    from ..utils.methodprops import parse_method_spec, parse_mt

    opts = Options()
    rest = []
    for a in args:
        if a.startswith("-t"):
            opts.type = a[2:]
        elif a.startswith("-m0="):
            opts.method, opts.props = parse_method_spec(a[4:])
            if "x" in opts.props:
                opts.level = int(opts.props.pop("x"))
        elif a.startswith("-mx"):
            opts.level = int(a[3:].lstrip("="))
        elif a.startswith("-md") and len(a) > 3 and a[3].isdigit():
            from ..utils.methodprops import parse_size
            opts.props["d"] = parse_size(a[3:])
        elif a.startswith("-mhe"):
            opts.encrypt_header = a[4:] in ("", "=on", "on")
        elif a.startswith("-mdev"):
            # device (TPU mesh) coder tier: the MtCoder analog runs as
            # sharded kernels + ordered all-gather (parallel/sharded.py)
            opts.device = a[5:].lstrip("=") not in ("off", "0", "-")
        elif a.startswith("-mmt"):
            opts.threads = parse_mt(a[4:].lstrip("=") or "on")
        elif a.startswith("-p"):
            opts.password = a[2:]
        elif a.startswith("-o"):
            opts.outdir = a[2:]
        elif a == "-si":
            opts.stdin = True
        elif a == "-so":
            opts.stdout = True
        elif a == "-y":
            opts.yes = True
        elif a.startswith("-i!"):
            opts.include.append(a[3:])
        elif a.startswith("-x!"):
            opts.exclude.append(a[3:])
        elif a == "-r" or a == "-r0":
            opts.recurse = True
        elif a == "-slt":
            opts.slt = True
        elif a.startswith("-bb"):
            opts.progress = True
        elif a == "-bd":
            opts.progress = False
        elif a.startswith("-v") and len(a) > 2 and a[2].isdigit():
            from ..utils.methodprops import parse_size
            opts.volume = parse_size(a[2:])
        elif a.startswith("-scrc"):
            opts.scrc = a[5:].lstrip("=") or "CRC32"
        elif a.startswith("-"):
            print(f"warning: ignoring switch {a}", file=sys.stderr)
        else:
            rest.append(a)
    return opts, rest


def _name_selected(opts: Options, name: str) -> bool:
    """-i!/-x! wildcard selection (UI/Common/ArchiveCommandLine.cpp
    kInclude/kExclude semantics: includes narrow, excludes always win)."""
    import fnmatch
    base = name.replace("\\", "/").split("/")[-1]
    for pat in opts.exclude:
        if fnmatch.fnmatch(name, pat) or fnmatch.fnmatch(base, pat):
            return False
    if opts.include:
        return any(fnmatch.fnmatch(name, pat) or fnmatch.fnmatch(base, pat)
                   for pat in opts.include)
    return True


class PercentPrinter:
    """Live percent display during long operations (the reference's
    UI/Console/PercentPrinter.cpp, driven here by the CMtProgress-analog
    accumulator). Writes to stderr; active on a tty or with -bb, off
    with -bd."""

    def __init__(self, total: int, enabled: bool | None = None):
        self.total = max(total, 1)
        self.done = 0
        self.enabled = (sys.stderr.isatty() if enabled is None
                        else enabled)
        self._last = -1

    def add(self, nbytes: int, name: str = "") -> None:
        self.done += nbytes
        pct = min(100 * self.done // self.total, 100)
        if self.enabled and pct != self._last:
            self._last = pct
            sys.stderr.write(f"\r{pct:3d}% {name[:60]:<60}")
            sys.stderr.flush()

    def finish(self) -> None:
        if self.enabled and self._last >= 0:
            sys.stderr.write("\r" + " " * 66 + "\r")
            sys.stderr.flush()


def cmd_add(opts: Options, args, update: bool = False):
    verb = "u" if update else "a"
    if not args:
        raise TpuzError(f"{verb}: missing archive name")
    archive = args[0]
    inputs = args[1:]
    atype = opts.type or _sniff_type(archive)
    if opts.stdin:
        data = sys.stdin.buffer.read()
        files = {"stdin": data}
    else:
        files = {}
        for path in inputs:
            if os.path.isdir(path):
                for root, _dirs, fnames in os.walk(path):
                    for fn in fnames:
                        p = os.path.join(root, fn)
                        files[os.path.relpath(p)] = open(p, "rb").read()
            else:
                files[os.path.basename(path)] = open(path, "rb").read()
    files = {k: v for k, v in files.items() if _name_selected(opts, k)}
    if update and os.path.exists(archive) and not opts.stdout:
        # update verb: overlay new/changed members onto the existing
        # archive's contents (UI/Common/Update.cpp:1123 semantics,
        # whole-archive rewrite through the same writer)
        _t, existing, _rd = _open_archive(opts, archive)
        merged = dict(existing)
        merged.update(files)
        files = merged
    if not files:
        raise TpuzError(f"{verb}: no input files")

    if atype == "7z":
        from ..containers.sevenzip import write_archive
        method = opts.method or "lzma2"
        out = write_archive(files, method=method, level=opts.level or 5,
                            password=opts.password,
                            encrypt_header=opts.encrypt_header)
    elif atype == "zip":
        from ..containers import zip as zipc
        _zm = {"copy": 0, "deflate": 8, "bzip2": 12, "lzma": 14,
               "zstd": 93, "xz": 95, "ppmd": 98}
        out = zipc.write_zip(files,
                             method=_zm.get(opts.method or "deflate", 8),
                             level=opts.level or 6)
    elif atype == "tar":
        from ..containers import tar as tarc
        out = tarc.write_tar(files)
    elif atype == "wim":
        from ..containers import wim
        out = wim.write_wim(files)
    elif atype == "cab":
        from ..containers import cab
        out = cab.write_cab(files)
    elif atype == "udf":
        from ..containers import udf
        out = udf.write_udf(files)
    elif atype == "fat":
        from ..containers import fat
        out = fat.write_fat16(files)
    elif atype == "vhd":
        from ..containers import disk
        if len(files) > 1:
            raise TpuzError("-tvhd: single disk image expected")
        out = disk.write_vhd_fixed(next(iter(files.values())))
    elif atype == "ihex":
        from ..containers import misc
        if len(files) > 1:
            raise TpuzError("-tihex: single input expected")
        out = misc.write_ihex(next(iter(files.values())))
    elif atype == "arj":
        from ..containers import misc
        out = misc.write_arj(files)
    elif atype == "rar":
        from ..containers import rar
        out = rar.write_rar5(files, compress=(opts.method != "copy"
                                              and opts.level != 0))
    else:
        if len(files) > 1:
            raise TpuzError(f"-t{atype}: single-stream format, got "
                            f"{len(files)} inputs")
        data = next(iter(files.values()))
        if atype == "lz4" and (opts.device or opts.props.get("dev")):
            # device coder tier: sharded plane pipeline + ordered
            # all-gather assembles one .lz4 frame on the mesh
            # (MtCoder analog, C/MtCoder.c:445; parallel/sharded.py)
            from ..parallel.sharded import shard_compress_lz4_device
            out = shard_compress_lz4_device(data)
        else:
            codec = get_codec(opts.method or atype)
            kw = {}
            if "wlog" in opts.props:
                kw["window_log"] = int(opts.props["wlog"])
            if opts.threads and codec.name == "zstd":
                kw["threads"] = opts.threads
            out = codec.compress(data, level=opts.level or 5, **kw)
    if opts.stdout:
        sys.stdout.buffer.write(out)
    elif opts.volume:
        # multi-volume output: archive.001, archive.002, ... (the
        # reference's -v switch + SplitHandler naming,
        # UI/Common/ArchiveCommandLine.cpp kVolume)
        nvol = 0
        for off in range(0, len(out), opts.volume):
            nvol += 1
            with open(f"{archive}.{nvol:03d}", "wb") as f:
                f.write(out[off:off + opts.volume])
        print(f"created {archive}.001..{archive}.{nvol:03d} "
              f"({len(out)} bytes in {nvol} volumes)")
    else:
        # temp-file + rename: a failed/interrupted write never clobbers
        # an existing archive (the reference's COutArchive temp-file
        # discipline in UI/Common/Update.cpp)
        tmp = archive + ".tmp"
        with open(tmp, "wb") as f:
            f.write(out)
        os.replace(tmp, archive)
        print(f"created {archive} ({len(out)} bytes)")
    return 0


def _read_volumes(path: str) -> bytes:
    """Concatenate a .001/.002/... volume set (SplitHandler.cpp
    semantics: sequential numeric suffixes, any gap ends the set)."""
    import re
    m = re.match(r"^(.*)\.(\d{3,4})$", path)
    if not m or int(m.group(2)) != 1:
        return open(path, "rb").read()
    base, digits = m.group(1), len(m.group(2))
    parts = []
    i = 1
    while True:
        p = f"{base}.{i:0{digits}d}"
        if not os.path.exists(p):
            break
        parts.append(open(p, "rb").read())
        i += 1
    if not parts:
        raise TpuzError(f"cannot open {path}")
    return b"".join(parts)


def _open_archive(opts, path):
    data = sys.stdin.buffer.read() if opts.stdin else _read_volumes(path)
    atype = opts.type or _sniff_type(path or "", data)
    if atype == "7z":
        from ..containers.sevenzip import SevenZipReader
        rd = SevenZipReader(data, password=opts.password)
        return atype, rd.extract_all(), rd
    if atype == "zip":
        from ..containers import zip as zipc
        return atype, zipc.read_zip(data), None
    if atype == "tar":
        from ..containers import tar as tarc
        return atype, tarc.read_tar(data), None
    if atype == "squashfs":
        from ..containers import squashfs
        return atype, squashfs.read_squashfs(data), None
    if atype == "cpio":
        from ..containers import cpio
        return atype, cpio.read_cpio(data), None
    if atype == "ar":
        from ..containers import ar
        return atype, ar.read_ar(data), None
    if atype == "rpm":
        from ..containers import rpm
        return atype, rpm.read_rpm(data), None
    if atype == "iso":
        from ..containers import iso
        return atype, iso.read_iso(data), None
    if atype == "xar":
        from ..containers import xar
        return atype, xar.read_xar(data), None
    if atype == "lzh":
        from ..containers import lzh
        return atype, lzh.read_lzh(data), None
    if atype == "wim":
        from ..containers import wim
        return atype, wim.read_wim(data), None
    if atype == "cab":
        from ..containers import cab
        return atype, cab.read_cab(data), None
    if atype == "ext":
        from ..containers import ext
        return atype, ext.read_ext(data), None
    if atype in ("mbr", "gpt", "vhd", "qcow", "vdi", "vmdk", "vhdx"):
        from ..containers import disk
        fn = {"mbr": disk.read_mbr, "gpt": disk.read_gpt,
              "vhd": disk.read_vhd, "qcow": disk.read_qcow,
              "vdi": disk.read_vdi, "vmdk": disk.read_vmdk,
              "vhdx": disk.read_vhdx}[atype]
        return atype, fn(data), None
    if atype in ("swf", "flv", "ihex", "base64", "pe", "elf", "macho",
                 "arj"):
        from ..containers import misc
        fn = {"swf": misc.read_swf, "flv": misc.read_flv,
              "ihex": misc.read_ihex, "base64": misc.read_base64,
              "pe": misc.read_pe, "elf": misc.read_elf,
              "macho": misc.read_macho, "arj": misc.read_arj}[atype]
        return atype, fn(data), None
    if atype == "fat":
        from ..containers import fat
        return atype, fat.read_fat(data), None
    if atype == "ntfs":
        from ..containers import ntfs
        return atype, ntfs.read_ntfs(data), None
    if atype == "udf":
        from ..containers import udf
        return atype, udf.read_udf(data), None
    if atype == "chm":
        from ..containers import chm
        return atype, chm.read_chm(data), None
    if atype == "dmg":
        from ..containers import dmg
        return atype, dmg.read_dmg(data), None
    if atype == "hfs":
        from ..containers import hfs
        return atype, hfs.read_hfs(data), None
    if atype == "nsis":
        from ..containers import nsis
        return atype, nsis.read_nsis(data), None
    if atype == "rar":
        from ..containers import rar
        return atype, rar.read_rar(data), None
    if atype == "apfs":
        from ..containers import apfs
        return atype, apfs.read_apfs(data), None
    codec = get_codec(atype)
    name = os.path.basename(path or "stdin")
    for ext in (".zst", ".lz4", ".xz", ".bz2", ".gz", ".Z", ".lz", ".br"):
        if name.endswith(ext):
            name = name[: -len(ext)]
    # block-parallel decode driver (MtDec analog) when spans exist and
    # multithreading is not disabled (-mmt1 forces the serial path)
    if atype in ("zstd", "lz4") and opts.threads != 1:
        from ..parallel import decode as pdec
        fn = pdec.decompress_zstd if atype == "zstd" \
            else pdec.decompress_lz4
        return atype, {name: fn(data, threads=opts.threads)}, None
    return atype, {name: codec.decompress(data)}, None


def cmd_extract(opts: Options, args, test_only=False):
    if not args and not opts.stdin:
        raise TpuzError("x: missing archive")
    path = args[0] if args else None

    # bounded-memory streaming path (InBuffer/OutBuffer analog,
    # utils/streamio.py): single-stream formats extract unit by unit
    # from a memory-mapped input instead of materializing everything
    if (path and not opts.stdin and not test_only and not opts.stdout
            and opts.threads == 1):
        from ..utils import streamio
        stype = opts.type or _sniff_type(path, open(path, "rb").read(64))
        if stype in streamio.STREAMABLE and not path.endswith(".001"):
            name = os.path.basename(path)
            for ext in (".zst", ".lz4", ".xz", ".bz2", ".gz"):
                if name.endswith(ext):
                    name = name[: -len(ext)]
                    break
            else:
                name += ".out"
            os.makedirs(opts.outdir, exist_ok=True)
            dst = os.path.join(opts.outdir, name)
            prog = PercentPrinter(os.path.getsize(path) * 3,
                                  enabled=opts.progress)
            with open(dst, "wb") as outf:
                total = streamio.stream_extract(path, stype, outf, prog)
            prog.finish()
            print(f"extracted {name} ({total} bytes)")
            return 0

    atype, files, _rd = _open_archive(opts, path)
    files = {k: v for k, v in files.items() if _name_selected(opts, k)}
    if test_only:
        print(f"type={atype} files={len(files)}")
        if opts.scrc:
            from ..ops.hashers import HASHERS
            names = ([opts.scrc] if opts.scrc != "*"
                     else sorted(HASHERS))
            for fname, content in files.items():
                for hn in names:
                    fn = HASHERS.get(hn.upper()) or HASHERS.get(hn)
                    if fn:
                        print(f"{hn} for data: {fn(content)}")
        print("Everything is Ok")
        return 0
    if opts.stdout:
        for content in files.values():
            sys.stdout.buffer.write(content)
        return 0
    os.makedirs(opts.outdir, exist_ok=True)
    meta = _file_metadata(atype, _rd)
    prog = PercentPrinter(sum(len(v) for v in files.values()),
                          enabled=opts.progress)
    for name, content in files.items():
        prog.add(0, name)
        dst = os.path.join(opts.outdir, name.replace("\\", "/"))
        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        with open(dst, "wb") as f:
            f.write(content)
        prog.add(len(content), name)
        m = meta.get(name)
        if m:
            mtime, mode = m
            if mode is not None:
                try:
                    os.chmod(dst, mode & 0o7777)
                except OSError:
                    pass
            if mtime is not None:
                try:
                    os.utime(dst, (mtime, mtime))
                except OSError:
                    pass
        print(f"extracted {name} ({len(content)} bytes)")
    prog.finish()
    return 0


_FILETIME_EPOCH = 11644473600  # seconds between 1601 and 1970


def _file_metadata(atype, rd):
    """name -> (mtime unix seconds | None, posix mode | None). Mirrors
    the reference's SetFileAttrib/NTFS-time handling on extract
    (CPP/7zip/UI/Common/ArchiveExtractCallback.cpp)."""
    meta = {}
    if atype == "7z" and rd is not None:
        for fe in getattr(rd, "files", []):
            mtime = None
            mode = None
            if fe.mtime:
                mtime = fe.mtime / 10_000_000 - _FILETIME_EPOCH
            if fe.attrib is not None and fe.attrib & 0x8000:
                mode = (fe.attrib >> 16) & 0xFFFF  # unix extension bit
            meta[fe.name] = (mtime, mode)
    return meta


def cmd_list(opts: Options, args):
    if not args:
        raise TpuzError("l: missing archive")
    data = open(args[0], "rb").read()
    atype = opts.type or _sniff_type(args[0], data)
    print(f"Listing archive: {args[0]}")
    print(f"Type = {atype}")
    if atype == "7z":
        from ..containers.sevenzip import SevenZipReader
        rd = SevenZipReader(data, password=opts.password)
        if opts.slt:
            # machine-readable technical listing (-slt analog)
            print("----------")
            for fe in rd.files:
                print(f"Path = {fe.name}")
                print(f"Size = {fe.size}")
                if fe.crc is not None:
                    print(f"CRC = {fe.crc:08X}")
                print(f"Folder = {'-' if not fe.has_stream else '+'}")
                print()
            return 0
        print(f"{'Size':>10}  {'CRC':>8}  Name")
        for fe in rd.files:
            crc = f"{fe.crc:08x}" if fe.crc is not None else "-"
            print(f"{fe.size:>10}  {crc:>8}  {fe.name}")
    else:
        _t, files, _ = _open_archive(opts, args[0])
        for name, content in files.items():
            print(f"{len(content):>10}  {'-':>8}  {name}")
    return 0


def cmd_hash(opts: Options, args):
    from ..ops.hashers import HASHERS
    for path in args:
        data = open(path, "rb").read()
        print(f"-- {path} ({len(data)} bytes)")
        for name in sorted(HASHERS):
            print(f"{name:11s} {HASHERS[name](data)}")
    return 0


def cmd_info(opts: Options, args):
    print(VERSION_BANNER)
    print("\nCodecs:")
    for name, ci in sorted(CODECS.items()):
        print(f"  {ci.method_id:>8X}  {name}  levels {ci.levels[0]}-"
              f"{ci.levels[1]}")
    from ..ops.hashers import HASHERS
    print("\nHashers:")
    for name in sorted(HASHERS):
        print(f"  {name}")
    print("\nFormats: 7z zstd lz4 lz5 lizard brotli xz bzip2 gzip tar zip"
          " squashfs cpio ar rpm iso xar lzh Z")
    return 0


def cmd_bench(opts: Options, args):
    """`b` — benchmark subsystem (UI/Common/Bench.cpp analog).

    Default: every registered codec at its low/mid/high levels plus
    every hasher, round-trip CRC-validated, with a relative rating
    (throughput x log2(ratio), the Bench.cpp usage/rating idea recast
    for a matrix display). `b {codec}` or `b {hasher}` restricts;
    -md{size} sets the buffer (default 4 MiB; -mx picks one level)."""
    from ..utils.corpus import make_corpus
    from ..ops.hashers import HASHERS
    size = int(opts.props.get("d", 4 << 20) or (4 << 20))
    data = make_corpus(size)
    only = args[0].lower() if args else None

    def levels_for(info):
        lo, hi = info.levels
        if opts.level:
            return [max(lo, min(opts.level, hi))]
        mid = (lo + hi) // 2
        return sorted({lo, mid, hi})

    # ---- codec matrix -------------------------------------------------
    names = [n for n in CODECS
             if n not in ("copy",) and (only is None or n == only)]
    if names:
        print(f"{'method':12s} {'lvl':>3} {'enc MB/s':>9} {'dec MB/s':>9} "
              f"{'ratio':>6} {'rating':>7}")
    import zlib as _z
    for name in sorted(names):
        codec = CODECS[name]
        for lvl in levels_for(codec):
            try:
                t0 = time.time()
                c = codec.compress(data, level=lvl)
                te = max(time.time() - t0, 1e-9)
                t0 = time.time()
                try:
                    out = codec.decompress(c)
                except TypeError:
                    out = codec.decompress(c, out_size=size)
                td = max(time.time() - t0, 1e-9)
            except (TpuzError, TypeError, ValueError) as e:
                print(f"{name:12s} {lvl:>3} skip: {e}")
                continue
            if out != data or _z.crc32(out) != _z.crc32(data):
                print(f"{name:12s} {lvl:>3} ROUND-TRIP FAILED")
                continue
            import math
            ratio = size / len(c)
            rating = size / te / 1e6 * max(math.log2(ratio), 0.1)
            print(f"{name:12s} {lvl:>3} {size/te/1e6:>9.1f} "
                  f"{size/td/1e6:>9.1f} {ratio:>6.2f} {rating:>7.0f}")

    # ---- hasher matrix ------------------------------------------------
    hnames = [h for h in sorted(HASHERS)
              if only is None or h.lower() == only]
    if only is not None and not names and not hnames:
        raise TpuzError(f"b: unknown codec/hasher {only!r}")
    if hnames and (only is None or not names):
        print(f"\n{'hasher':12s} {'MB/s':>9}")
        for h in hnames:
            fn = HASHERS[h]
            t0 = time.time()
            fn(data)
            dt = max(time.time() - t0, 1e-9)
            print(f"{h:12s} {size/dt/1e6:>9.1f}")
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(VERSION_BANNER)
        print(__doc__)
        return 0
    cmd = argv[0]
    opts, rest = _parse_switches(argv[1:])
    # external codec plugins (LoadCodecs.cpp analog): scanned before
    # dispatch so -t/-m can name plugin codecs
    from ..utils import plugins as _plugins
    if _plugins.plugin_dirs():
        _plugins.load_plugins()
    try:
        if cmd == "a":
            return cmd_add(opts, rest)
        if cmd == "u":
            return cmd_add(opts, rest, update=True)
        if cmd in ("x", "e"):
            return cmd_extract(opts, rest)
        if cmd == "t":
            return cmd_extract(opts, rest, test_only=True)
        if cmd == "l":
            return cmd_list(opts, rest)
        if cmd == "h":
            return cmd_hash(opts, rest)
        if cmd == "i":
            return cmd_info(opts, rest)
        if cmd == "b":
            return cmd_bench(opts, rest)
        print(f"unknown command {cmd!r}", file=sys.stderr)
        return 1
    except TpuzError as e:
        print(f"ERROR: {e}", file=sys.stderr)
        return 2
    except BrokenPipeError:
        # downstream closed the pipe (e.g. `| head`) — not an error
        try:
            sys.stdout.close()
        except Exception:
            pass
        return 0
    except OSError as e:
        print(f"ERROR: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
