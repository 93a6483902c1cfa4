"""Pure-Python AES-128 (FIPS-197) + CBC/PKCS#7, for PDF /AESV2 streams.

Built from the public standard: the S-box is COMPUTED (GF(2^8)
multiplicative inverse + affine transform, FIPS-197 §5.1.1) rather than
transcribed, and the implementation is pinned to the FIPS-197 Appendix C
known-answer vector by tests/test_aes.py. Not constant-time — this
decrypts public-spec PDF streams in a data pipeline, it is not a
security boundary.
"""

from __future__ import annotations

_TABLES: dict | None = None


def _gfmul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _tables() -> dict:
    global _TABLES
    if _TABLES is not None:
        return _TABLES
    inv = [0] * 256
    # brute-force GF(2^8) inverses: unambiguous, runs once per process
    for x in range(1, 256):
        if inv[x]:
            continue
        for y in range(1, 256):
            if _gfmul(x, y) == 1:
                inv[x], inv[y] = y, x
                break

    def rotl(b: int, n: int) -> int:
        return ((b << n) | (b >> (8 - n))) & 0xFF

    sbox = [0] * 256
    for x in range(256):
        b = inv[x]
        sbox[x] = b ^ rotl(b, 1) ^ rotl(b, 2) ^ rotl(b, 3) ^ rotl(b, 4) ^ 0x63
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    # round constants for AES-128 key expansion
    rcon = [1]
    for _ in range(9):
        rcon.append(_gfmul(rcon[-1], 2))
    _TABLES = {"sbox": sbox, "inv_sbox": inv_sbox, "rcon": rcon}
    return _TABLES


def _expand_key(key: bytes) -> list[list[int]]:
    t = _tables()
    sbox, rcon = t["sbox"], t["rcon"]
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        tmp = list(w[i - 1])
        if i % 4 == 0:
            tmp = tmp[1:] + tmp[:1]
            tmp = [sbox[b] for b in tmp]
            tmp[0] ^= rcon[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], tmp)])
    return [sum(w[r * 4 : r * 4 + 4], []) for r in range(11)]  # 11 round keys


def _encrypt_block(block: bytes, rk: list[list[int]]) -> bytes:
    sbox = _tables()["sbox"]
    s = [block[r + 4 * c] for c in range(4) for r in range(4)]  # column-major
    s = [b ^ k for b, k in zip(s, _colmajor(rk[0]))]
    for rnd in range(1, 11):
        s = [sbox[b] for b in s]
        s = _shift_rows(s)
        if rnd < 10:
            s = _mix_columns(s)
        s = [b ^ k for b, k in zip(s, _colmajor(rk[rnd]))]
    return bytes(s[c * 4 + r] for c in range(4) for r in range(4))


def _decrypt_block(block: bytes, rk: list[list[int]]) -> bytes:
    inv_sbox = _tables()["inv_sbox"]
    s = [block[r + 4 * c] for c in range(4) for r in range(4)]
    s = [b ^ k for b, k in zip(s, _colmajor(rk[10]))]
    for rnd in range(9, -1, -1):
        s = _inv_shift_rows(s)
        s = [inv_sbox[b] for b in s]
        s = [b ^ k for b, k in zip(s, _colmajor(rk[rnd]))]
        if rnd > 0:
            s = _inv_mix_columns(s)
    return bytes(s[c * 4 + r] for c in range(4) for r in range(4))


def _colmajor(round_key: list[int]) -> list[int]:
    # round key bytes are word-major; state is column-major by word too
    return round_key


def _shift_rows(s: list[int]) -> list[int]:
    # state s[c*4+r]: shift row r left by r
    out = list(s)
    for r in range(1, 4):
        row = [s[c * 4 + r] for c in range(4)]
        row = row[r:] + row[:r]
        for c in range(4):
            out[c * 4 + r] = row[c]
    return out


def _inv_shift_rows(s: list[int]) -> list[int]:
    out = list(s)
    for r in range(1, 4):
        row = [s[c * 4 + r] for c in range(4)]
        row = row[-r:] + row[:-r]
        for c in range(4):
            out[c * 4 + r] = row[c]
    return out


def _mix_columns(s: list[int]) -> list[int]:
    out = [0] * 16
    for c in range(4):
        a = s[c * 4 : c * 4 + 4]
        out[c * 4 + 0] = _gfmul(a[0], 2) ^ _gfmul(a[1], 3) ^ a[2] ^ a[3]
        out[c * 4 + 1] = a[0] ^ _gfmul(a[1], 2) ^ _gfmul(a[2], 3) ^ a[3]
        out[c * 4 + 2] = a[0] ^ a[1] ^ _gfmul(a[2], 2) ^ _gfmul(a[3], 3)
        out[c * 4 + 3] = _gfmul(a[0], 3) ^ a[1] ^ a[2] ^ _gfmul(a[3], 2)
    return out


def _inv_mix_columns(s: list[int]) -> list[int]:
    out = [0] * 16
    for c in range(4):
        a = s[c * 4 : c * 4 + 4]
        out[c * 4 + 0] = _gfmul(a[0], 14) ^ _gfmul(a[1], 11) ^ _gfmul(a[2], 13) ^ _gfmul(a[3], 9)
        out[c * 4 + 1] = _gfmul(a[0], 9) ^ _gfmul(a[1], 14) ^ _gfmul(a[2], 11) ^ _gfmul(a[3], 13)
        out[c * 4 + 2] = _gfmul(a[0], 13) ^ _gfmul(a[1], 9) ^ _gfmul(a[2], 14) ^ _gfmul(a[3], 11)
        out[c * 4 + 3] = _gfmul(a[0], 11) ^ _gfmul(a[1], 13) ^ _gfmul(a[2], 9) ^ _gfmul(a[3], 14)
    return out


def aes128_encrypt_block(block: bytes, key: bytes) -> bytes:
    if len(block) != 16 or len(key) != 16:
        raise ValueError("AES-128 needs 16-byte block and key")
    return _encrypt_block(block, _expand_key(key))


def aes128_decrypt_block(block: bytes, key: bytes) -> bytes:
    if len(block) != 16 or len(key) != 16:
        raise ValueError("AES-128 needs 16-byte block and key")
    return _decrypt_block(block, _expand_key(key))


def aes128_cbc_encrypt(data: bytes, key: bytes, iv: bytes) -> bytes:
    """PKCS#7-pad + CBC; returns iv + ciphertext (the PDF stream form)."""
    if len(iv) != 16:
        raise ValueError("bad IV length")
    rk = _expand_key(key)
    pad = 16 - (len(data) % 16)
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(block, rk)
        out += prev
    return bytes(out)


def aes128_cbc_decrypt(data: bytes, key: bytes) -> bytes:
    """Inverse of aes128_cbc_encrypt: data = iv + ciphertext."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("bad AES-CBC stream length")
    rk = _expand_key(key)
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        block = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(block, rk), prev))
        prev = block
    pad = out[-1]
    if not (1 <= pad <= 16) or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad AES padding (wrong key or corrupt stream)")
    return bytes(out[:-pad])
