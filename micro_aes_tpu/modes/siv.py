"""AES-SIV (RFC 5297) — parity with micro_aes.c:1321-1410.

S2V is the CMAC* construction with doubling and xor-end; the CTR body uses
the SIV counter convention (bits 63/31 cleared, micro_aes.c:931-934).
"""
from __future__ import annotations

import numpy as np

from ..errors import AuthenticationError
from ..utils.bytesio import verify_tag
from ..ops.mac import double_be_np
from .common import BLOCK, cmac_digest, ctr_xcrypt, to_u8


def _s2v(key1: bytes, aad, pt) -> np.ndarray:
    """S2V (micro_aes.c:1324-1360).  Single-AAD-unit form, like the ref."""
    aad, pt = to_u8(aad), to_u8(pt)
    y = cmac_digest(key1, b"\x00" * BLOCK)  # Y0 = CMAC(zero block)
    if len(aad):
        y = double_be_np(y) ^ cmac_digest(key1, aad)
    if len(pt) < BLOCK:
        x = double_be_np(y)
        pad = np.zeros(BLOCK, np.uint8)
        pad[: len(pt)] = pt
        pad[len(pt)] = 0x80
        return cmac_digest(key1, bytes(x ^ pad))
    data = pt.copy()
    data[-BLOCK:] ^= y  # xorend
    return cmac_digest(key1, data)


def siv_encrypt(keys, aad, plaintext) -> tuple[bytes, bytes]:
    """AES_SIV_encrypt (micro_aes.c:1372-1381): returns (iv, ct).
    keys = K1 (mac) || K2 (ctr), each of the AES key size."""
    keys = bytes(keys)
    k1, k2 = keys[: len(keys) // 2], keys[len(keys) // 2:]
    iv = _s2v(k1, aad, plaintext)
    ct = ctr_xcrypt(k2, iv, "siv", plaintext)
    return bytes(iv), ct


def siv_decrypt(keys, iv, aad, ciphertext) -> bytes:
    """AES_SIV_decrypt (micro_aes.c:1394-1410): decrypt, re-synthesize,
    verify."""
    keys = bytes(keys)
    k1, k2 = keys[: len(keys) // 2], keys[len(keys) // 2:]
    iv = to_u8(iv)[:BLOCK]
    pt = ctr_xcrypt(k2, iv, "siv", ciphertext)
    expect = _s2v(k1, aad, pt)
    if not verify_tag(expect, iv):
        raise AuthenticationError("SIV verification failed")
    return pt
