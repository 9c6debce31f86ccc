"""AES-OCB (RFC 7253) — parity with micro_aes.c:1655-1813.

The reference recomputes each Δ_i from scratch (getDelta, c:1662-1680);
here the offsets come from the gray-code identity
    Δ_i = Δ_0 ^ XOR_{b set in gray(i)} L_b,   gray(i) = i ^ (i >> 1),
so the entire offset table is a vectorized bit-select — the body is then
one batched cipher call (the parallelization the reference's comment at
c:1653 alludes to).
"""
from __future__ import annotations

import functools

import numpy as np

from ..errors import AuthenticationError, DataLengthError
from ..utils.bytesio import verify_tag
from ..ops.mac import double_be_np
from .common import BLOCK, dec_blocks_np, enc_blocks_np, enc_block, to_u8

OCB_NONCE_LEN = 12
OCB_TAG_LEN = 16
_MAX_L = 48  # supports messages up to 2^48 blocks


from ..utils.keycache import key_cache


@key_cache(maxsize=256)
def _subkeys(key: bytes):
    """L_* = E(0), L_$ = 2·L_*, L_i = 2·L_{i-1} (getSubkeys quad=0 + ladder)."""
    l_star = enc_block(key, np.zeros(BLOCK, np.uint8))
    l_dollar = double_be_np(l_star)
    ls = np.zeros((_MAX_L, BLOCK), np.uint8)
    ls[0] = double_be_np(l_dollar)
    for i in range(1, _MAX_L):
        ls[i] = double_be_np(ls[i - 1])
    for a in (l_star, l_dollar, ls):
        a.setflags(write=False)
    return l_star, l_dollar, ls


def _offsets(ls: np.ndarray, delta0: np.ndarray, n: int) -> np.ndarray:
    """Δ_i for i = 1..n via the gray-code bit-select, vectorized."""
    if n == 0:
        return np.zeros((0, BLOCK), np.uint8)
    i = np.arange(1, n + 1, dtype=np.uint64)
    gray = i ^ (i >> 1)
    nbits = max(1, int(gray.max()).bit_length())
    sel = ((gray[:, None] >> np.arange(nbits, dtype=np.uint64)) & 1).astype(np.uint8)
    f = np.zeros((n, BLOCK), np.uint8)
    for b in range(nbits):  # xor-accumulate selected L_b planes
        f ^= sel[:, b: b + 1] * ls[b]
    return f ^ delta0


def _offset0(key: bytes, nonce: np.ndarray, tag_len: int) -> np.ndarray:
    """Ktop / stretch / Δ_0 (micro_aes.c:1703-1719, per RFC 7253 §4.2)."""
    if not 1 <= len(nonce) <= 15:  # RFC 7253 §4.2: 1..120-bit nonce
        raise DataLengthError("OCB nonce must be 1..15 bytes")
    kt = np.zeros(BLOCK, np.uint8)
    kt[BLOCK - len(nonce):] = nonce
    kt[0] |= (tag_len << 4) & 0xFF
    kt[BLOCK - 1 - len(nonce)] |= 1
    bottom = int(kt[BLOCK - 1] & 0x3F)
    kt[BLOCK - 1] &= 0xC0
    ktop = enc_block(key, kt)
    stretch = np.concatenate([ktop, ktop[:8] ^ ktop[1:9]])
    s = int.from_bytes(bytes(stretch), "big")
    off = (s >> (64 - bottom)) & ((1 << 128) - 1)
    return np.frombuffer(off.to_bytes(16, "big"), np.uint8)


def _ocb_core(key: bytes, nonce, aad, data: np.ndarray, encrypt: bool,
              tag_len: int) -> tuple[bytes, np.ndarray]:
    """OCB_cipher (micro_aes.c:1693-1762): returns (output, full 16B tag)."""
    nonce = to_u8(nonce)
    aad = to_u8(aad)
    l_star, l_dollar, ls = _subkeys(key)
    delta0 = _offset0(key, nonce, tag_len)

    n, r = len(data) // BLOCK, len(data) % BLOCK
    offs = _offsets(ls, delta0, n)
    cipher = enc_blocks_np if encrypt else dec_blocks_np

    out_parts = []
    if n:
        body_in = data[: n * BLOCK].reshape(n, BLOCK)
        body_out = cipher(key, body_in ^ offs) ^ offs
        out_parts.append(body_out.reshape(-1))
    delta_n = offs[-1] if n else delta0

    tail_pt = np.zeros(0, np.uint8)
    if r:
        pad = enc_block(key, l_star ^ delta_n)
        tail_out = data[n * BLOCK:] ^ pad[:r]
        out_parts.append(tail_out)
        tail_pt = tail_out if not encrypt else data[n * BLOCK:]
        delta_star = delta_n ^ l_star
    else:
        delta_star = delta_n

    # checksum over the *plaintext* (zero-padded partial + 0x80 marker)
    checksum = np.zeros(BLOCK, np.uint8)
    pt_body = (data[: n * BLOCK] if encrypt else
               (out_parts[0] if n else np.zeros(0, np.uint8)))
    if n:
        checksum ^= np.bitwise_xor.reduce(pt_body.reshape(n, BLOCK), axis=0)
    if r:
        checksum[:r] ^= data[n * BLOCK:] if encrypt else tail_pt
        checksum[r] ^= 0x80

    tag = enc_block(key, checksum ^ delta_star ^ l_dollar)

    # PMAC over AAD (c:1746-1760); HASH offsets start from zeros.
    an, ar = len(aad) // BLOCK, len(aad) % BLOCK
    a_offs = _offsets(ls, np.zeros(BLOCK, np.uint8), an)
    if an:
        ab = aad[: an * BLOCK].reshape(an, BLOCK)
        encd = enc_blocks_np(key, ab ^ a_offs)
        tag = tag ^ np.bitwise_xor.reduce(encd, axis=0)
    if ar:
        delta_an = a_offs[-1] if an else np.zeros(BLOCK, np.uint8)
        last = np.zeros(BLOCK, np.uint8)
        last[:ar] = aad[an * BLOCK:]
        last[ar] ^= 0x80
        tag = tag ^ enc_block(key, delta_an ^ l_star ^ last)

    out = bytes(np.concatenate(out_parts)) if out_parts else b""
    return out, tag


def ocb_encrypt(key, nonce, aad, plaintext, tag_len: int = OCB_TAG_LEN) -> bytes:
    """AES_OCB_encrypt (micro_aes.c:1774-1784): returns ct || tag."""
    key = bytes(key)
    pt = to_u8(plaintext)
    ct, tag = _ocb_core(key, nonce, aad, pt, True, tag_len)
    return ct + bytes(tag[:tag_len])


def ocb_decrypt(key, nonce, aad, ct_and_tag, tag_len: int = OCB_TAG_LEN) -> bytes:
    """AES_OCB_decrypt (micro_aes.c:1797-1813): decrypt-then-verify."""
    key = bytes(key)
    data = to_u8(ct_and_tag)
    ct, tag = data[: len(data) - tag_len], data[len(data) - tag_len:]
    pt, full_tag = _ocb_core(key, nonce, aad, ct, False, tag_len)
    if not verify_tag(full_tag[:tag_len], tag):
        raise AuthenticationError("OCB tag mismatch")
    return pt
