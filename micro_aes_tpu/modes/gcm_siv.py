"""AES-GCM-SIV (RFC 8452) — parity with micro_aes.c:1418-1515.

Per-nonce derived keys (GCM_SIVsetup, c:1434-1448), POLYVAL via the
little-endian dot matrix (ops/gf128.polyval_matrix), and the LE 32-bit
counter with MSB set (c:935-938).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..errors import AuthenticationError, DataLengthError
from ..ops.gf128 import polyval_matrix
from ..ops.mac import ghash_fold
from ..utils.bytesio import block_bucket, verify_tag
from .common import BLOCK, ctr_xcrypt, enc_blocks_np, to_u8, xmac_blocks

SIVGCM_NONCE_LEN = 12
SIVGCM_TAG_LEN = 16


from ..utils.keycache import key_cache


@key_cache(maxsize=256)
def _derive_keys(key: bytes, nonce: bytes) -> tuple[bytes, bytes]:
    """GCM_SIVsetup: halves of E_K(le32(i) || nonce) for i = 0.. give the
    auth key (2 halves) then the message key (Nk/2 halves)."""
    from .. import native

    count = 2 + len(key) // 8
    blocks = np.zeros((count, BLOCK), np.uint8)
    blocks[:, 4:16] = np.frombuffer(nonce, np.uint8)
    for i in range(count):
        blocks[i, 0] = i  # LE counter in byte 0 (i < 256 always)
    enc = native.oracle_encrypt(key, blocks)  # setup-time: host oracle
    halves = enc[:, :8].reshape(-1)
    auth_key = bytes(halves[:16])
    msg_key = bytes(halves[16: 16 + len(key)])
    return auth_key, msg_key


def _polyval(auth_key: bytes, aad, pt) -> np.ndarray:
    aad, pt = to_u8(aad), to_u8(pt)
    lens = np.zeros(BLOCK, np.uint8)
    lens[:8] = np.frombuffer((len(aad) * 8).to_bytes(8, "little"), np.uint8)
    lens[8:] = np.frombuffer((len(pt) * 8).to_bytes(8, "little"), np.uint8)
    blocks = np.concatenate([xmac_blocks(aad), xmac_blocks(pt), lens[None, :]])
    n = blocks.shape[0]
    nb = block_bucket(n)
    buf = np.zeros((nb, BLOCK), np.uint8)
    buf[:n] = blocks
    m = _polyval_matrix_cached(auth_key)
    g = ghash_fold(m, jnp.zeros(16, jnp.uint8), jnp.asarray(buf), jnp.int32(n))
    return np.asarray(g)


@key_cache(maxsize=256)
def _polyval_matrix_cached(auth_key: bytes):
    return polyval_matrix(np.frombuffer(auth_key, np.uint8))


def _tag(msg_key: bytes, nonce: np.ndarray, pv: np.ndarray) -> np.ndarray:
    """GCM_SIVtag (micro_aes.c:1451-1457)."""
    pv = pv.copy()
    pv[:12] ^= nonce
    pv[15] &= 0x7F
    return enc_blocks_np(msg_key, pv.reshape(1, BLOCK))[0]


def gcm_siv_encrypt(key, nonce, aad, plaintext) -> bytes:
    """GCM_SIV_encrypt (micro_aes.c:1470-1483): returns ct || tag."""
    key = bytes(key)
    nonce = to_u8(nonce)
    if len(nonce) != SIVGCM_NONCE_LEN:  # RFC 8452 fixes the nonce at 96 bits
        raise DataLengthError("GCM-SIV nonce must be exactly 12 bytes")
    auth_key, msg_key = _derive_keys(key, bytes(nonce))
    pv = _polyval(auth_key, aad, plaintext)
    tag = _tag(msg_key, nonce, pv)
    ct = ctr_xcrypt(msg_key, tag, "gcm_siv", plaintext)
    return ct + bytes(tag)


def gcm_siv_decrypt(key, nonce, aad, ct_and_tag) -> bytes:
    """GCM_SIV_decrypt (micro_aes.c:1496-1515): decrypt-then-verify."""
    key = bytes(key)
    nonce = to_u8(nonce)
    if len(nonce) != SIVGCM_NONCE_LEN:
        raise DataLengthError("GCM-SIV nonce must be exactly 12 bytes")
    data = to_u8(ct_and_tag)
    ct, tag = data[: len(data) - SIVGCM_TAG_LEN], data[len(data) - SIVGCM_TAG_LEN:]
    auth_key, msg_key = _derive_keys(key, bytes(nonce))
    pt = ctr_xcrypt(msg_key, tag, "gcm_siv", ct)
    pv = _polyval(auth_key, aad, pt)
    expect = _tag(msg_key, nonce, pv)
    if not verify_tag(expect, tag):
        raise AuthenticationError("GCM-SIV tag mismatch")
    return pt
