"""CBC mode with optional CS3 ciphertext stealing — micro_aes.c:687-783.

Encrypt is a strict serial chain -> lax.scan (one device call); decrypt is
block-parallel (P_i = D(C_i) ^ C_{i-1}) -> one batched device call.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..errors import DataLengthError
from .common import (
    BLOCK,
    PAD_ZERO,
    dec_blocks_np,
    pad_message,
    round_keys,
    to_u8,
)
from ._scan import cbc_encrypt_scan
from ..utils.bytesio import block_bucket


def _chain_encrypt(key: bytes, iv: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    n = blocks.shape[0]
    if n == 0:
        return blocks
    nb = block_bucket(n)
    buf = np.zeros((nb, BLOCK), np.uint8)
    buf[:n] = blocks
    ys = cbc_encrypt_scan(round_keys(key), jnp.asarray(iv, jnp.uint8), jnp.asarray(buf))
    return np.asarray(ys)[:n]


def cbc_encrypt(key, iv, plaintext, cts: bool = True, padding: int = PAD_ZERO) -> bytes:
    """AES_CBC_encrypt (micro_aes.c:697-735). cts=True is the reference's
    compiled default (CTS macro, CS3 unconditional swap)."""
    key = bytes(key)
    iv = to_u8(iv)[:BLOCK]
    data = to_u8(plaintext)
    n, r = len(data) // BLOCK, len(data) % BLOCK

    if cts:
        if n > 1 and r == 0:
            n -= 1
            r = BLOCK
        if n == 0:
            raise DataLengthError("CBC-CTS needs at least one full block")
        chain = _chain_encrypt(key, iv, data[: n * BLOCK].reshape(n, BLOCK))
        if r == 0:
            return bytes(chain.reshape(-1))
        tail = np.zeros(BLOCK, np.uint8)
        tail[:r] = data[n * BLOCK:]
        c_last = chain[-1]
        stolen = _chain_encrypt(key, c_last, tail.reshape(1, BLOCK))[0]
        # CS3 unconditional swap: stolen block replaces C_{n-1}; the first
        # r bytes of C_{n-1} become the final partial chunk (c:718-732).
        out = np.concatenate([chain[:-1].reshape(-1), stolen, c_last[:r]])
        return bytes(out)

    padded, extra = pad_message(data, padding)
    blocks = padded.reshape(-1, BLOCK)
    return bytes(_chain_encrypt(key, iv, blocks).reshape(-1))


def cbc_decrypt(key, iv, ciphertext, cts: bool = True) -> bytes:
    """AES_CBC_decrypt (micro_aes.c:746-782).  Block-parallel."""
    key = bytes(key)
    iv = to_u8(iv)[:BLOCK]
    data = to_u8(ciphertext)
    n, r = len(data) // BLOCK, len(data) % BLOCK

    if cts:
        if n > 1 and r == 0:
            n -= 1
            r = BLOCK
        if n == 0:
            raise DataLengthError("CBC-CTS needs at least one full block")
    else:
        if r != 0:
            raise DataLengthError("ciphertext must be a block multiple")

    if r == 0:
        blocks = data.reshape(n, BLOCK)
        dec = dec_blocks_np(key, blocks)
        prev = np.concatenate([iv[None, :], blocks[:-1]], axis=0)
        return bytes((dec ^ prev).reshape(-1))

    # CTS tail: last two chunks are {X (full), Z (r bytes)} (c:771-778)
    m = n - 1  # blocks decrypted normally
    head = data[: m * BLOCK].reshape(m, BLOCK)
    x = data[m * BLOCK: m * BLOCK + BLOCK]
    z = data[m * BLOCK + BLOCK:]
    dx = dec_blocks_np(key, x.reshape(1, BLOCK))[0]
    p_tail = dx[:r] ^ z  # last partial plaintext
    y = dx.copy()
    y[:r] = z
    p_prev_enc = dec_blocks_np(key, y.reshape(1, BLOCK))[0]
    prev_iv = head[-1] if m else iv
    p_prev = p_prev_enc ^ prev_iv
    if m:
        dec = dec_blocks_np(key, head)
        prevs = np.concatenate([iv[None, :], head[:-1]], axis=0)
        body = (dec ^ prevs).reshape(-1)
    else:
        body = np.zeros(0, np.uint8)
    return bytes(np.concatenate([body, p_prev, p_tail]))
