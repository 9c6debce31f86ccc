"""CFB mode (full-block feedback) — micro_aes.c:789-846.

Encrypt chains serially (scan); decrypt is parallel: P_i = E(C_{i-1}) ^ C_i
with C_{-1} = IV, and the ragged tail uses the same keystream rule.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.bytesio import block_bucket
from .common import BLOCK, enc_blocks_np, round_keys, to_u8
from ._scan import cfb_encrypt_scan


def cfb_encrypt(key, iv, plaintext) -> bytes:
    key = bytes(key)
    iv = to_u8(iv)[:BLOCK]
    data = to_u8(plaintext)
    n, r = len(data) // BLOCK, len(data) % BLOCK
    out = np.zeros(0, np.uint8)
    last = iv
    if n:
        nb = block_bucket(n)
        buf = np.zeros((nb, BLOCK), np.uint8)
        buf[:n] = data[: n * BLOCK].reshape(n, BLOCK)
        ys = np.asarray(
            cfb_encrypt_scan(round_keys(key), jnp.asarray(iv, jnp.uint8), jnp.asarray(buf))
        )[:n]
        out = ys.reshape(-1)
        last = ys[-1]
    if r:
        ks = enc_blocks_np(key, last.reshape(1, BLOCK))[0]
        out = np.concatenate([out, ks[:r] ^ data[n * BLOCK:]])
    return bytes(out)


def cfb_decrypt(key, iv, ciphertext) -> bytes:
    key = bytes(key)
    iv = to_u8(iv)[:BLOCK]
    data = to_u8(ciphertext)
    n, r = len(data) // BLOCK, len(data) % BLOCK
    nin = n + (1 if r else 0)
    if nin == 0:
        return b""
    # inputs to the cipher: IV, C_0, ..., C_{nin-2}
    ins = np.zeros((nin, BLOCK), np.uint8)
    ins[0] = iv
    if nin > 1:
        ins[1:] = data[: (nin - 1) * BLOCK].reshape(nin - 1, BLOCK)
    ks = enc_blocks_np(key, ins).reshape(-1)[: len(data)]
    return bytes(ks ^ data)
