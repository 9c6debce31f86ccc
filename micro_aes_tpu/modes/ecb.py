"""ECB mode (NIST SP 800-38A) — parity with micro_aes.c:628-681.

Embarrassingly parallel: the whole message is one batched device call.
"""
from __future__ import annotations

from ..errors import DecryptionError
from .common import (
    BLOCK,
    PAD_ZERO,
    dec_blocks_np,
    enc_blocks_np,
    pad_message,
    to_u8,
)


def ecb_encrypt(key, plaintext, padding: int = PAD_ZERO) -> bytes:
    """AES_ECB_encrypt (micro_aes.c:636-653); `padding` mirrors AES_PADDING."""
    key = bytes(key)
    data = to_u8(plaintext)
    padded, _ = pad_message(data, padding)
    blocks = padded.reshape(-1, BLOCK)
    return bytes(enc_blocks_np(key, blocks).reshape(-1))


def ecb_decrypt(key, ciphertext) -> bytes:
    """AES_ECB_decrypt (micro_aes.c:663-680).  Decrypts all *full* blocks;
    raises DecryptionError if a partial block exists (padding itself is not
    stripped, matching the reference)."""
    key = bytes(key)
    data = to_u8(ciphertext)
    n = len(data) // BLOCK * BLOCK
    out = dec_blocks_np(key, data[:n].reshape(-1, BLOCK)).reshape(-1)
    if len(data) % BLOCK:
        raise DecryptionError("ciphertext has a partial block")
    return bytes(out)
