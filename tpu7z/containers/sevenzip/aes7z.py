"""7z AES-256-CBC codec with the 7z key-derivation scheme.

Behavioral reference: CPP/7zip/Archive/7z/7zAes.cpp:39-111 (KDF: SHA-256
over salt || utf16le(password) || counter, 2^numCyclesPower rounds) and
C/Aes.c. AES core written from FIPS-197; CBC decryption is data-parallel
across blocks (ECB-decrypt all blocks, then one vectorized XOR with the
shifted ciphertext), matching how the TPU path batches blocks.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ...utils.errors import CorruptError

_SBOX = None
_INV_SBOX = None


def _init_tables():
    global _SBOX, _INV_SBOX
    if _SBOX is not None:
        return
    # generate S-box from GF(2^8) inverse + affine transform
    gf_exp = np.zeros(512, dtype=np.int64)
    gf_log = np.zeros(256, dtype=np.int64)
    x = 1
    for i in range(255):
        gf_exp[i] = x
        gf_log[x] = i
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
        x &= 0xFF
    for i in range(255, 512):
        gf_exp[i] = gf_exp[i - 255]
    inv = np.zeros(256, dtype=np.int64)
    for a in range(1, 256):
        inv[a] = gf_exp[255 - gf_log[a]]
    sbox = np.zeros(256, dtype=np.uint8)
    for a in range(256):
        b = int(inv[a])
        s = b
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            s ^= b
        sbox[a] = s ^ 0x63
    inv_sbox = np.zeros(256, dtype=np.uint8)
    inv_sbox[sbox] = np.arange(256, dtype=np.uint8)
    _SBOX = sbox
    _INV_SBOX = inv_sbox


def _xtime(a: np.ndarray) -> np.ndarray:
    return (((a.astype(np.uint16) << 1)
             ^ np.where(a & 0x80, 0x1B, 0)) & 0xFF).astype(np.uint8)


def _gmul(a: np.ndarray, b: int) -> np.ndarray:
    res = np.zeros_like(a)
    x = a.copy()
    while b:
        if b & 1:
            res ^= x
        x = _xtime(x)
        b >>= 1
    return res


def _expand_key(key: bytes):
    _init_tables()
    nk = len(key) // 4
    nr = nk + 6
    w = [int.from_bytes(key[4 * i:4 * i + 4], "big") for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF
            t = int.from_bytes(bytes(_SBOX[list(t.to_bytes(4, "big"))]), "big")
            t ^= rcon << 24
            rcon = ((rcon << 1) ^ (0x11B if rcon & 0x80 else 0)) & 0xFF
        elif nk > 6 and i % nk == 4:
            t = int.from_bytes(bytes(_SBOX[list(t.to_bytes(4, "big"))]), "big")
        w.append(w[i - nk] ^ t)
    # round keys as (nr+1, 4, 4) byte matrices (column-major state)
    rk = np.zeros((nr + 1, 4, 4), dtype=np.uint8)
    for r in range(nr + 1):
        for c in range(4):
            col = w[4 * r + c].to_bytes(4, "big")
            for row in range(4):
                rk[r, row, c] = col[row]
    return rk, nr


def _decrypt_blocks(ct: np.ndarray, rk: np.ndarray, nr: int) -> np.ndarray:
    """ECB-decrypt (N,16) blocks, vectorized over N."""
    _init_tables()
    n = ct.shape[0]
    # state: (N, 4 rows, 4 cols), column-major load
    st = ct.reshape(n, 4, 4).transpose(0, 2, 1).copy()
    st ^= rk[nr]
    for r in range(nr - 1, -1, -1):
        # InvShiftRows
        for row in range(1, 4):
            st[:, row, :] = np.roll(st[:, row, :], row, axis=1)
        # InvSubBytes
        st = _INV_SBOX[st]
        # AddRoundKey
        st ^= rk[r]
        if r > 0:
            # InvMixColumns
            a0 = st[:, 0, :]
            a1 = st[:, 1, :]
            a2 = st[:, 2, :]
            a3 = st[:, 3, :]
            st = np.stack([
                _gmul(a0, 14) ^ _gmul(a1, 11) ^ _gmul(a2, 13) ^ _gmul(a3, 9),
                _gmul(a0, 9) ^ _gmul(a1, 14) ^ _gmul(a2, 11) ^ _gmul(a3, 13),
                _gmul(a0, 13) ^ _gmul(a1, 9) ^ _gmul(a2, 14) ^ _gmul(a3, 11),
                _gmul(a0, 11) ^ _gmul(a1, 13) ^ _gmul(a2, 9) ^ _gmul(a3, 14),
            ], axis=1)
    return st.transpose(0, 2, 1).reshape(n, 16)


def _encrypt_block(pt: bytes, rk: np.ndarray, nr: int) -> bytes:
    _init_tables()
    st = np.frombuffer(pt, dtype=np.uint8).reshape(4, 4).T.copy()
    st ^= rk[0]
    for r in range(1, nr + 1):
        st = _SBOX[st]
        for row in range(1, 4):
            st[row, :] = np.roll(st[row, :], -row)
        if r < nr:
            a0, a1, a2, a3 = st[0], st[1], st[2], st[3]
            st = np.stack([
                _gmul(a0, 2) ^ _gmul(a1, 3) ^ a2 ^ a3,
                a0 ^ _gmul(a1, 2) ^ _gmul(a2, 3) ^ a3,
                a0 ^ a1 ^ _gmul(a2, 2) ^ _gmul(a3, 3),
                _gmul(a0, 3) ^ a1 ^ a2 ^ _gmul(a3, 2),
            ])
        st ^= rk[r]
    return st.T.reshape(16).tobytes()


def derive_key(password: str, salt: bytes, cycles_power: int) -> bytes:
    """7z KDF (7zAes.cpp:39-111)."""
    pw = password.encode("utf-16-le")
    if cycles_power == 0x3F:
        key = (salt + pw + b"\x00" * 32)[:32]
        return key
    h = hashlib.sha256()
    for i in range(1 << cycles_power):
        h.update(salt)
        h.update(pw)
        h.update(i.to_bytes(8, "little"))
    return h.digest()


def parse_props(props: bytes):
    """AES coder props: b0 = (numCyclesPower & 0x3F) | saltSize/ivSize high
    bits; optional b1 = low sizes; then salt, then iv."""
    if len(props) < 1:
        raise CorruptError("7z aes: missing props")
    b0 = props[0]
    cycles = b0 & 0x3F
    salt_size = (b0 >> 7) & 1
    iv_size = (b0 >> 6) & 1
    pos = 1
    if b0 & 0xC0:
        if len(props) < 2:
            raise CorruptError("7z aes: truncated props")
        b1 = props[1]
        salt_size += b1 >> 4
        iv_size += b1 & 0x0F
        pos = 2
    salt = props[pos:pos + salt_size]
    pos += salt_size
    iv = props[pos:pos + iv_size]
    iv = iv + b"\x00" * (16 - len(iv))
    return cycles, salt, iv


def aes_decrypt(data: bytes, props: bytes, password: str) -> bytes:
    cycles, salt, iv = parse_props(props)
    key = derive_key(password, salt, cycles)
    rk, nr = _expand_key(key)
    n = len(data) // 16
    ct = np.frombuffer(data[: n * 16], dtype=np.uint8).reshape(n, 16)
    pt = _decrypt_blocks(ct, rk, nr)
    # CBC: XOR with previous ciphertext block (vectorized)
    prev = np.concatenate(
        [np.frombuffer(iv, dtype=np.uint8).reshape(1, 16), ct[:-1]], axis=0)
    return (pt ^ prev).reshape(-1).tobytes()


def aes_encrypt(data: bytes, props: bytes, password: str) -> bytes:
    """CBC encrypt (serial chaining); input is padded to 16 bytes."""
    cycles, salt, iv = parse_props(props)
    key = derive_key(password, salt, cycles)
    rk, nr = _expand_key(key)
    pad = (-len(data)) % 16
    data = data + b"\x00" * pad
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        enc = _encrypt_block(blk, rk, nr)
        out += enc
        prev = enc
    return bytes(out)
