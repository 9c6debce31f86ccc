"""AES-EAX and EAX' (ANSI C12.22 / IEEE 1703) — micro_aes.c:1522-1647.

EAX: tag = OMAC(0;nonce) ^ OMAC(1;aad) ^ OMAC(2;ct), CTR from OMAC(0).
EAX': little-endian doubling subkeys, combined nonce/AAD, 4-byte tag, and
the N' bit-clearing quirk (c:1579-1583) — all reproduced.
"""
from __future__ import annotations

import numpy as np

from ..errors import AuthenticationError
from ..utils.bytesio import verify_tag
from .common import BLOCK, cmac_digest, cmac_subkeys, ctr_xcrypt, enc_block, to_u8

EAX_TAG_LEN = 16


def _omac(key: bytes, t: int, data) -> np.ndarray:
    """oMac, non-prime flavor (micro_aes.c:1531-1549)."""
    data = to_u8(data)
    D, Q = cmac_subkeys(key)
    init = np.zeros(BLOCK, np.uint8) if len(data) else D.copy()
    init = init.copy()
    init[BLOCK - 1] ^= t
    init = enc_block(key, init)
    if not len(data):
        return init
    return cmac_digest(key, data, init=init)


def eax_encrypt(key, nonce, aad, plaintext, tag_len: int = EAX_TAG_LEN) -> bytes:
    """AES_EAX_encrypt (micro_aes.c:1563-1597): returns ct || tag."""
    key = bytes(key)
    n_mac = _omac(key, 0, nonce)
    ct = ctr_xcrypt(key, n_mac, "ctr", plaintext)
    h_mac = _omac(key, 1, aad)
    c_mac = _omac(key, 2, ct)
    tag = n_mac ^ h_mac ^ c_mac
    return ct + bytes(tag[:tag_len])


def eax_decrypt(key, nonce, aad, ct_and_tag, tag_len: int = EAX_TAG_LEN) -> bytes:
    """AES_EAX_decrypt (micro_aes.c:1611-1647): authenticate-then-decrypt."""
    key = bytes(key)
    data = to_u8(ct_and_tag)
    ct, tag = data[: len(data) - tag_len], data[len(data) - tag_len:]
    n_mac = _omac(key, 0, nonce)
    expect = (n_mac ^ _omac(key, 1, aad) ^ _omac(key, 2, ct))[:tag_len]
    if not verify_tag(expect, tag):
        raise AuthenticationError("EAX tag mismatch")
    return ctr_xcrypt(key, n_mac, "ctr", ct)


# ---------------------------------------------------------------------------
# EAX' (EAXP macro): IEEE Std 1703 variant
# ---------------------------------------------------------------------------


def _omac_p(key: bytes, t: int, data) -> np.ndarray:
    """oMac, EAX' flavor (micro_aes.c:1534-1540): CMAC' with LE subkeys."""
    data = to_u8(data)
    D, Q = cmac_subkeys(key, little_endian=True)
    if not len(data) and t:
        return np.zeros(BLOCK, np.uint8)  # ignore null ciphertext
    init = (Q if t else D).copy()
    return cmac_digest(key, data, init=init, subkeys=(D, Q))


def eaxp_encrypt(key, nonce_data, plaintext) -> bytes:
    """EAX' encrypt (EAXP=1 build): nonce_data doubles as the AAD; returns
    ct || 4-byte mac."""
    key = bytes(key)
    n = _omac_p(key, 0, nonce_data)
    auth = n[12:16].copy()
    base = n.copy()
    base[12] &= 0x7F
    base[14] &= 0x7F  # N' bit clearing (c:1580-1583)
    ct = ctr_xcrypt(key, base, "ctr", plaintext)
    c = _omac_p(key, 2, ct)
    tag = auth ^ c[12:16]
    return ct + bytes(tag)


def eaxp_decrypt(key, nonce_data, ct_and_tag) -> bytes:
    """EAX' decrypt: 4-byte mac validation then CTR (c:1611-1646)."""
    key = bytes(key)
    data = to_u8(ct_and_tag)
    ct, tag = data[: len(data) - 4], data[len(data) - 4:]
    c = _omac_p(key, 2, ct)
    n = _omac_p(key, 0, nonce_data)
    if not verify_tag(c[12:16] ^ n[12:16], tag):
        raise AuthenticationError("EAX' mac mismatch")
    base = n.copy()
    base[12] &= 0x7F
    base[14] &= 0x7F
    return ctr_xcrypt(key, base, "ctr", ct)
