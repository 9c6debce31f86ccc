"""CTR mode (no auth) — micro_aes.c:953-990.

Fully parallel: counter blocks are a pure function of the block index
(ops/counter.py), so the keystream is one batched device call.
"""
from __future__ import annotations

import numpy as np

from .common import BLOCK, ctr_xcrypt, to_u8

CTR_IV_LENGTH = 12
CTR_START_VALUE = 1  # RFC-3686 recommendation (micro_aes.h:97-99)


def ctr_encrypt(key, iv, plaintext, preset_counter: bool = False) -> bytes:
    """AES_CTR_encrypt (micro_aes.c:962-976).  By default the IV is a
    12-byte nonce and the 32-bit BE counter starts at CTR_START_VALUE;
    preset_counter=True treats iv as a full preinitialized 16-byte block
    (the PRESET_COUNTER macro, micro_aes.h:100)."""
    key = bytes(key)
    ivb = to_u8(iv)
    base = np.zeros(BLOCK, np.uint8)
    if preset_counter:
        base[:] = ivb[:BLOCK]
    else:
        base[:CTR_IV_LENGTH] = ivb[:CTR_IV_LENGTH]
        base[BLOCK - 1] ^= CTR_START_VALUE
    return ctr_xcrypt(key, base, "ctr", plaintext)


def ctr_decrypt(key, iv, ciphertext, preset_counter: bool = False) -> bytes:
    return ctr_encrypt(key, iv, ciphertext, preset_counter)
