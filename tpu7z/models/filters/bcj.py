"""BCJ branch-converter filters.

Behavioral reference: C/Bra86.c (x86 E8/E9 rewriting with the 3-bit
prevMask state machine), C/Bra.c (fixed-width ARM/ARM64/PPC/SPARC/ARMT
rewrites). Written from the reference's documented behavior; bit-exact
interop is regression-tested through .7z archives produced by the
reference binary (tests/test_sevenzip.py).

Fixed-width filters are pure vector ops (mask + gather + arithmetic);
x86 walks only the sparse E8/E9 candidate positions.
"""

from __future__ import annotations

import numpy as np


def _test86_ms_byte(b: int) -> bool:
    return b == 0 or b == 0xFF


def _x86_convert(data: bytes, ip: int, encoding: bool) -> bytes:
    buf = bytearray(data)
    size = len(buf)
    if size < 5:
        return bytes(buf)
    limit = size - 4
    mask = 0
    pos = 0
    prev_pos = -1
    while True:
        # advance to next 0xE8/0xE9
        p = pos
        while p < limit and (buf[p] & 0xFE) != 0xE8:
            p += 1
        d = p - pos
        pos = p
        if p >= limit:
            break
        if d > 2:
            mask = 0
        else:
            mask >>= d
            if mask != 0 and (mask > 4 or mask == 3
                              or _test86_ms_byte(buf[p + (mask >> 1) + 1])):
                mask = (mask >> 1) | 4
                pos += 1
                continue
        if _test86_ms_byte(buf[p + 4]):
            v = (buf[p + 4] << 24) | (buf[p + 3] << 16) \
                | (buf[p + 2] << 8) | buf[p + 1]
            cur = (ip + 5 + pos) & 0xFFFFFFFF
            while True:
                if encoding:
                    v = (v + cur) & 0xFFFFFFFF
                else:
                    v = (v - cur) & 0xFFFFFFFF
                if mask == 0:
                    break
                sh = (mask & 6) << 2
                if _test86_ms_byte((v >> sh) & 0xFF):
                    v ^= ((0x100 << sh) - 1)
                    continue
                break
            buf[p + 1] = v & 0xFF
            buf[p + 2] = (v >> 8) & 0xFF
            buf[p + 3] = (v >> 16) & 0xFF
            buf[p + 4] = (0 - ((v >> 24) & 1)) & 0xFF
            pos += 5
            mask = 0
        else:
            mask = (mask >> 1) | 4
            pos += 1
    return bytes(buf)


def bcj_x86_encode(data: bytes, ip: int = 0) -> bytes:
    return _x86_convert(data, ip, True)


def bcj_x86_decode(data: bytes, ip: int = 0) -> bytes:
    return _x86_convert(data, ip, False)


# ---------------------------------------------------------------------------
# Fixed-width branch filters (vectorized)
# ---------------------------------------------------------------------------

def _arm_convert(data: bytes, ip: int, encoding: bool) -> bytes:
    """ARM (little-endian A32): BL imm24 at word-aligned positions
    (opcode byte 0xEB). addr = imm24 << 2; pc bias 8."""
    s = np.frombuffer(data, dtype=np.uint8).copy()
    n = (s.size // 4) * 4
    if n == 0:
        return data
    w = s[:n].reshape(-1, 4)
    hit = w[:, 3] == 0xEB
    v = (w[:, 0].astype(np.uint32) | (w[:, 1].astype(np.uint32) << 8)
         | (w[:, 2].astype(np.uint32) << 16)) << np.uint32(2)
    cur = (np.arange(w.shape[0], dtype=np.uint32) * 4 + np.uint32(ip + 8))
    v2 = (v + cur) if encoding else (v - cur)
    v2 = (v2 >> np.uint32(2)) & np.uint32(0xFFFFFF)
    w[hit, 0] = (v2[hit] & 0xFF).astype(np.uint8)
    w[hit, 1] = ((v2[hit] >> 8) & 0xFF).astype(np.uint8)
    w[hit, 2] = ((v2[hit] >> 16) & 0xFF).astype(np.uint8)
    return s.tobytes()


def _arm64_convert(data: bytes, ip: int, encoding: bool) -> bytes:
    """ARM64: BL (imm26, word branch) and in-range ADRP (21-bit page
    delta) rewritten to absolute, matching the xz/7-Zip arm64 filter
    behavior (C/Bra.c arm64 branch)."""
    s = np.frombuffer(data, dtype=np.uint8).copy()
    n = (s.size // 4) * 4
    if n == 0:
        return data
    w = s[:n].view("<u4").astype(np.uint32)
    pos = np.arange(w.size, dtype=np.uint32) * 4 + np.uint32(ip)

    # BL: word-granular 26-bit displacement
    is_bl = (w & np.uint32(0xFC000000)) == np.uint32(0x94000000)
    imm = w & np.uint32(0x03FFFFFF)
    pc_words = pos >> np.uint32(2)
    abs_bl = (imm + pc_words) if encoding else (imm - pc_words)
    bl_new = np.uint32(0x94000000) | (abs_bl & np.uint32(0x03FFFFFF))

    # ADRP: page-granular 21-bit delta, only when within +-512 MiB
    is_adrp = (w & np.uint32(0x9F000000)) == np.uint32(0x90000000)
    src = ((w >> np.uint32(29)) & np.uint32(3)) \
        | ((w >> np.uint32(3)) & np.uint32(0x001FFFFC))
    in_range = ((src + np.uint32(0x00020000))
                & np.uint32(0x001C0000)) == np.uint32(0)
    pc_pages = pos >> np.uint32(12)
    dest = (src + pc_pages) if encoding else (src - pc_pages)
    adrp_new = (w & np.uint32(0x9000001F))
    adrp_new |= (dest & np.uint32(3)) << np.uint32(29)
    adrp_new |= (dest & np.uint32(0x0003FFFC)) << np.uint32(3)
    adrp_new |= (np.uint32(0) - (dest & np.uint32(0x00020000))) \
        & np.uint32(0x00E00000)

    w = np.where(is_bl, bl_new, np.where(is_adrp & in_range, adrp_new, w))
    s[:n] = w.astype("<u4").view(np.uint8)
    return s.tobytes()


def _ppc_convert(data: bytes, ip: int, encoding: bool) -> bytes:
    """PPC (big-endian): bl absolute-address rewrite (opcode 0x48 with
    AA/LK bits == 1)."""
    s = np.frombuffer(data, dtype=np.uint8).copy()
    n = (s.size // 4) * 4
    if n == 0:
        return data
    w = s[:n].view(">u4").astype(np.uint32)  # numeric values, native order
    pos = np.arange(w.size, dtype=np.uint32) * 4 + np.uint32(ip)
    hit = (w & np.uint32(0xFC000003)) == np.uint32(0x48000001)
    off = w & np.uint32(0x03FFFFFC)
    abs_ = (off + pos) if encoding else (off - pos)
    w = np.where(hit,
                 np.uint32(0x48000001) | (abs_ & np.uint32(0x03FFFFFC)), w)
    s[:n] = w.astype(">u4").view(np.uint8)
    return s.tobytes()


def _sparc_convert(data: bytes, ip: int, encoding: bool) -> bytes:
    """SPARC call (30-bit word displacement), per C/Bra.c."""
    s = np.frombuffer(data, dtype=np.uint8).copy()
    n = (s.size // 4) * 4
    if n == 0:
        return data
    w = s[:n].view(">u4").astype(np.uint32)
    pos = np.arange(w.size, dtype=np.uint32) * 4 + np.uint32(ip)
    hit = ((w & np.uint32(0xC0000000)) == np.uint32(0x40000000)) & (
        ((w & np.uint32(0x3FFFFFFF)) < np.uint32(0x00400000))
        | ((w & np.uint32(0x3FFFFFFF)) >= np.uint32(0x3FC00000)))
    byte_off = (w << np.uint32(2)).astype(np.uint32)
    abs_ = (byte_off + pos) if encoding else (byte_off - pos)
    nw = (np.uint32(0x40000000)
          | ((abs_ >> np.uint32(2)) & np.uint32(0x3FFFFFFF)))
    w = np.where(hit, nw, w)
    s[:n] = w.astype(">u4").view(np.uint8)
    return s.tobytes()


def _mk(enc_fn):
    def enc(data, ip=0):
        return enc_fn(data, ip, True)

    def dec(data, ip=0):
        return enc_fn(data, ip, False)
    return enc, dec


bcj_arm_encode, bcj_arm_decode = _mk(_arm_convert)
bcj_arm64_encode, bcj_arm64_decode = _mk(_arm64_convert)
bcj_ppc_encode, bcj_ppc_decode = _mk(_ppc_convert)
bcj_sparc_encode, bcj_sparc_decode = _mk(_sparc_convert)

FILTERS = {
    "x86": (bcj_x86_encode, bcj_x86_decode),
    "arm": (bcj_arm_encode, bcj_arm_decode),
    "arm64": (bcj_arm64_encode, bcj_arm64_decode),
    "ppc": (bcj_ppc_encode, bcj_ppc_decode),
    "sparc": (bcj_sparc_encode, bcj_sparc_decode),
}


def _armt_convert(data: bytes, ip: int, encoding: bool) -> bytes:
    """ARM Thumb BL pairs (halfwords 0xF0xx 0xF8xx); 22-bit halfword
    displacement. Pairs cannot overlap (second halfword can't start a
    pair), so detection + rewrite is fully vectorizable."""
    s = np.frombuffer(data, dtype=np.uint8).copy()
    n = s.size
    if n < 4:
        return data
    q = np.arange(0, n - 3, 2)
    hit = ((s[q + 1] & 0xF8) == 0xF0) & ((s[q + 3] & 0xF8) == 0xF8)
    idx = q[hit]
    if idx.size == 0:
        return data
    hi = s[idx].astype(np.uint32) | (s[idx + 1].astype(np.uint32) << 8)
    lo = s[idx + 2].astype(np.uint32) | (s[idx + 3].astype(np.uint32) << 8)
    v = ((hi << np.uint32(11)) | (lo & np.uint32(0x7FF)))
    c = ((idx + 4 + ip) >> 1).astype(np.uint32)
    v = (v + c) if encoding else (v - c)
    new_hi = ((v >> np.uint32(11)) & np.uint32(0x7FF)) | np.uint32(0xF000)
    new_lo = (v & np.uint32(0x7FF)) | np.uint32(0xF800)
    s[idx] = (new_hi & 0xFF).astype(np.uint8)
    s[idx + 1] = (new_hi >> 8).astype(np.uint8)
    s[idx + 2] = (new_lo & 0xFF).astype(np.uint8)
    s[idx + 3] = (new_lo >> 8).astype(np.uint8)
    return s.tobytes()


_IA64_BRANCH_TABLE = (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                      4, 4, 6, 6, 0, 0, 7, 7, 4, 4, 0, 0, 4, 4, 0, 0)


def _ia64_convert(data: bytes, ip: int, encoding: bool) -> bytes:
    """IA64 branch conversion over 16-byte bundles (3 x 41-bit slots)."""
    buf = bytearray(data)
    n = len(buf) & ~15
    for i in range(0, n, 16):
        mask = _IA64_BRANCH_TABLE[buf[i] & 0x1F]
        if not mask:
            continue
        bit_pos = 5
        for slot in range(3):
            if (mask >> slot) & 1:
                byte_pos = bit_pos >> 3
                bit_res = bit_pos & 7
                instr = int.from_bytes(buf[i + byte_pos:i + byte_pos + 6],
                                       "little")
                inst_norm = instr >> bit_res
                if ((inst_norm >> 37) & 0xF) == 5 \
                        and ((inst_norm >> 9) & 0x7) == 0:
                    src = (inst_norm >> 13) & 0xFFFFF
                    src |= ((inst_norm >> 36) & 1) << 20
                    src <<= 4
                    if encoding:
                        dest = (src + ip + i) & 0xFFFFFFFF
                    else:
                        dest = (src - ip - i) & 0xFFFFFFFF
                    dest >>= 4
                    inst_norm &= ~(0x8FFFFF << 13)
                    inst_norm |= (dest & 0xFFFFF) << 13
                    inst_norm |= (dest & 0x100000) << (36 - 20)
                    instr &= (1 << bit_res) - 1
                    instr |= inst_norm << bit_res
                    buf[i + byte_pos:i + byte_pos + 6] = \
                        (instr & ((1 << 48) - 1)).to_bytes(6, "little")
            bit_pos += 41
    return bytes(buf)


def swap2(data: bytes) -> bytes:
    """SWAP2 filter (C/SwapBytes.c): 16-bit byte swap, self-inverse."""
    s = np.frombuffer(data, dtype=np.uint8)
    n = s.size & ~1
    out = s.copy()
    out[0:n:2], out[1:n:2] = s[1:n:2], s[0:n:2]
    return out.tobytes()


def swap4(data: bytes) -> bytes:
    """SWAP4 filter: 32-bit byte swap, self-inverse."""
    s = np.frombuffer(data, dtype=np.uint8)
    n = s.size & ~3
    out = s.copy()
    out[:n] = s[:n].reshape(-1, 4)[:, ::-1].reshape(-1)
    return out.tobytes()


bcj_armt_encode, bcj_armt_decode = _mk(_armt_convert)
bcj_ia64_encode, bcj_ia64_decode = _mk(_ia64_convert)

FILTERS["armt"] = (bcj_armt_encode, bcj_armt_decode)
FILTERS["ia64"] = (bcj_ia64_encode, bcj_ia64_decode)


def _riscv_convert(data: bytes, ip: int, encoding: bool) -> bytes:
    """RISC-V branch filter (alignment 2).

    Behavioral reference: C/Bra.c BranchConv_{ENC,DEC}(RISCV) and
    CPP/7zip/Compress/BranchRegister.cpp (method 0x0B). Two rewrites:
    JAL (low byte 0x6F/0xEF) gets its scrambled 21-bit immediate
    de-interleaved, made absolute, and stored big-endian-ish; an
    AUIPC+load/store/jalr pair (when the check links their registers)
    is fused into a marker form holding the absolute 32-bit address
    big-endian. x0/x2-destination AUIPCs are reserved as the marker
    space, handled by the inverse branch so the transform is bijective.
    """
    d = bytearray(data)
    M = 0xFFFFFFFF
    n = len(d) & ~1
    if n <= 6:
        return bytes(d)
    lim = n - 6
    i = 0

    def u32(o):
        return d[o] | (d[o + 1] << 8) | (d[o + 2] << 16) | (d[o + 3] << 24)

    def pu32(o, v):
        d[o] = v & 0xFF
        d[o + 1] = (v >> 8) & 0xFF
        d[o + 2] = (v >> 16) & 0xFF
        d[o + 3] = (v >> 24) & 0xFF

    while i < lim:
        a = (((d[i] | (d[i + 1] << 8)) ^ 0x10) + 1) & M
        if a & 0x77:
            i += 2
            continue
        pc = (ip + i) & M
        if (a & 8) == 0:
            # JAL rd=ra family
            if encoding:
                if ((a - 0x100) & 0xD80):
                    i += 2
                    continue
                w = u32(i)
                v = (((w & 0x80000000) >> 11) | ((w & (0x3FF << 21)) >> 20)
                     | ((w & (1 << 20)) >> 9) | (w & (0xFF << 12)))
                v = (v + pc) & M
                d[i + 1] = ((v >> 13) & 0xF0) | ((w >> 8) & 0x0F)
                d[i + 2] = (v >> 9) & 0xFF
                d[i + 3] = (v >> 1) & 0xFF
            else:
                a = (a - 0x81) & M
                if a & 0xD80:
                    i += 2
                    continue
                low12 = (a + 0x70) & 0xFFF
                v = ((d[i + 3] << 1) | (d[i + 2] << 9)
                     | ((a & 0xF000) << 5)) & M
                v = (v - pc) & M
                w = (low12 | ((v << 11) & 0x80000000)
                     | ((v << 20) & (0x3FF << 21)) | ((v << 9) & (1 << 20))
                     | (v & (0xFF << 12)))
                pu32(i, w)
            i += 4
            continue
        # AUIPC family; v = scan value, w = full first instruction
        v = a
        w = u32(i)

        def check1(b):
            return ((((b - 3) & M) ^ ((v << 8) & M)) & 0xF8003) == 0

        def check2(r):
            return ((((v - 0x3108) & M) << 18) & M) < (r & 0x1D)

        if encoding:
            if v & 0xE80:  # rd not x0/x2: real AUIPC candidate
                b = u32(i + 4)
                if check1(b):
                    pu32(i, ((b << 12) & M) | 0x117)
                    hi = w & 0xFFFFF000
                    s = b >> 20
                    if b & 0x80000000:
                        s = (s - 0x1000) & M
                    t = (hi + s + pc) & M
                    d[i + 4] = (t >> 24) & 0xFF
                    d[i + 5] = (t >> 16) & 0xFF
                    d[i + 6] = (t >> 8) & 0xFF
                    d[i + 7] = t & 0xFF
                    i += 8
                else:
                    i += 6
            else:  # x0/x2 marker space: apply inverse so filter stays 1:1
                r = w >> 27
                if check2(r):
                    v2 = u32(i + 4)
                    pu32(i, ((r << 7) + 0x17 + (v2 & 0xFFFFF000)) & M)
                    pu32(i + 4, ((w >> 12) | ((v2 << 20) & M)) & M)
                    i += 8
                else:
                    i += 4
        else:
            if (v & 0xE80) == 0:  # marker form: restore AUIPC pair
                r = w >> 27
                if check2(r):
                    b = ((d[i + 4] << 24) | (d[i + 5] << 16)
                         | (d[i + 6] << 8) | d[i + 7])
                    b = (b - pc) & M
                    pu32(i, ((r << 7) + 0x17
                             + ((b + 0x800) & 0xFFFFF000)) & M)
                    pu32(i + 4, ((w >> 12) | ((b << 20) & M)) & M)
                    i += 8
                else:
                    i += 4
            else:  # forward-convert real pairs into marker space
                b = u32(i + 4)
                if check1(b):
                    pu32(i, ((b << 12) & M) | 0x117)
                    pu32(i + 4, (w & 0xFFFFF000) | (b >> 20))
                    i += 8
                else:
                    i += 6
    return bytes(d)


bcj_riscv_encode, bcj_riscv_decode = _mk(_riscv_convert)
FILTERS["riscv"] = (bcj_riscv_encode, bcj_riscv_decode)
