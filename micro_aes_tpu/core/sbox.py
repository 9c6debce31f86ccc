"""Rijndael S-box and GF(2^8) constants, generated algorithmically.

The reference stores the boxes as packed string literals
(micro_aes.c:41-64).  We instead *derive* them at import time from the
field definition (multiplicative inverse in GF(2^8) mod x^8+x^4+x^3+x+1,
followed by the affine transform) — the same math, no copied tables, and
the derivation doubles as a self-check for the bitsliced kernel.
"""
from __future__ import annotations

import numpy as np

AES_POLY = 0x11B  # x^8 + x^4 + x^3 + x + 1


def gf256_mul(a: int, b: int) -> int:
    """Carry-less multiply mod the AES polynomial (plain ints, host only)."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= AES_POLY
        b >>= 1
    return r


def _gf256_inv_table() -> np.ndarray:
    """inv[x] for all x (inv[0] := 0 by AES convention), via log tables."""
    # Build exp/log over generator 3 (a primitive element of the AES field).
    exp = np.zeros(256, dtype=np.int32)
    log = np.zeros(256, dtype=np.int32)
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = gf256_mul(x, 3)
    inv = np.zeros(256, dtype=np.uint8)
    for v in range(1, 256):
        inv[v] = exp[(255 - log[v]) % 255]
    return inv


def _affine(x: np.ndarray) -> np.ndarray:
    """AES affine transform: y = x ^ rotl1(x) ^ rotl2 ^ rotl3 ^ rotl4 ^ 0x63."""
    x = x.astype(np.uint16)
    y = x.copy()
    for r in (1, 2, 3, 4):
        y ^= ((x << r) | (x >> (8 - r))) & 0xFF
    return (y ^ 0x63).astype(np.uint8)


GF_INV: np.ndarray = _gf256_inv_table()
SBOX: np.ndarray = _affine(GF_INV)
INV_SBOX: np.ndarray = np.zeros(256, dtype=np.uint8)
INV_SBOX[SBOX] = np.arange(256, dtype=np.uint8)

# Round-constant sequence for the key schedule: rcon_i = 2^(i-1) in GF(2^8).
RCON: np.ndarray = np.zeros(16, dtype=np.uint8)
_r = 1
for _i in range(1, 16):
    RCON[_i] = _r
    _r = gf256_mul(_r, 2)
del _r, _i

# Quick structural self-checks (cheap; run once at import).
assert SBOX[0x00] == 0x63 and SBOX[0x01] == 0x7C and SBOX[0x53] == 0xED
assert INV_SBOX[0x63] == 0x00 and RCON[1] == 1 and RCON[9] == 0x1B
