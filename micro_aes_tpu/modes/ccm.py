"""AES-CCM (NIST SP 800-38C / RFC 3610) — parity with micro_aes.c:1219-1314.

CTR body parallel; the CBC-MAC over B0|AAD|payload is a masked lax.scan.
Decrypt-then-verify ordering matches the reference (c:1304-1312).
"""
from __future__ import annotations

import numpy as np

from ..errors import AuthenticationError
from ..utils.bytesio import verify_tag
from .common import (
    BLOCK,
    cbcmac_np,
    ctr_xcrypt,
    enc_block,
    to_u8,
    xmac_blocks,
)

CCM_NONCE_LEN = 11
CCM_TAG_LEN = 16


def _ccm_tag(key: bytes, iv0: np.ndarray, aad: np.ndarray, pt: np.ndarray,
             tag_len: int) -> np.ndarray:
    """CCMtag (micro_aes.c:1222-1256)."""
    m = iv0.copy()
    m[0] |= (tag_len - 2) << 2
    plen = len(pt)
    i = 15
    v = plen
    while True:  # xorBEint(M, ptextLen, LAST), c:410-416
        m[i] ^= v & 0xFF
        v >>= 8
        i -= 1
        if not v:
            break

    alen = len(aad)
    segments = []
    if alen:
        m[0] |= 0x40
        m = enc_block(key, m)
        a = np.zeros(BLOCK, np.uint8)
        p = 1
        if alen > 0xFEFF:
            p += 4
            a[0], a[1] = 0xFF, 0xFE
        v, i = alen, p
        while True:
            a[i] ^= v & 0xFF
            v >>= 8
            i -= 1
            if not v:
                break
        p += 1
        s = BLOCK - p
        a[p: p + min(alen, s)] = aad[:s]
        segments.append(a[None, :])
        if alen > s:
            segments.append(xmac_blocks(aad[s:]))
    else:
        segments.append(np.zeros((1, BLOCK), np.uint8))  # xMac of zero A block
    segments.append(xmac_blocks(pt))
    blocks = np.concatenate(segments, axis=0)
    m = cbcmac_np(key, m, blocks)
    return enc_block(key, iv0) ^ m  # tag = Enc(A0) ^ CBC-MAC (c:1254-1255)


def _iv0(nonce) -> np.ndarray:
    nonce = to_u8(nonce)
    iv = np.zeros(BLOCK, np.uint8)
    iv[0] = 14 - len(nonce)  # flags byte = L - 1 (micro_aes.c:1273)
    iv[1: 1 + len(nonce)] = nonce
    return iv


def ccm_encrypt(key, nonce, aad, plaintext, nonce_len: int = CCM_NONCE_LEN,
                tag_len: int = CCM_TAG_LEN) -> bytes:
    """AES_CCM_encrypt (micro_aes.c:1268-1282): returns ct || tag."""
    key = bytes(key)
    nonce = to_u8(nonce)[:nonce_len]
    pt, aad = to_u8(plaintext), to_u8(aad)
    iv0 = _iv0(nonce)
    tag = _ccm_tag(key, iv0, aad, pt, tag_len)
    ct = ctr_xcrypt(key, iv0, "ccm_gcm", pt)
    return ct + bytes(tag[:tag_len])


def ccm_decrypt(key, nonce, aad, ct_and_tag, nonce_len: int = CCM_NONCE_LEN,
                tag_len: int = CCM_TAG_LEN) -> bytes:
    """AES_CCM_decrypt (micro_aes.c:1295-1314): decrypt-then-verify."""
    key = bytes(key)
    nonce = to_u8(nonce)[:nonce_len]
    data = to_u8(ct_and_tag)
    ct, tag = data[: len(data) - tag_len], data[len(data) - tag_len:]
    iv0 = _iv0(nonce)
    pt = to_u8(ctr_xcrypt(key, iv0, "ccm_gcm", ct))
    expect = _ccm_tag(key, iv0, to_u8(aad), pt, tag_len)[:tag_len]
    if not verify_tag(expect, tag):
        raise AuthenticationError("CCM tag mismatch")
    return bytes(pt)
