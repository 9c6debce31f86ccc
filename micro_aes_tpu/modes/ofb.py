"""OFB mode — micro_aes.c:852-893.  Keystream is a serial scan; the xor is
parallel.  Decrypt == encrypt."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.bytesio import block_bucket
from .common import BLOCK, round_keys, to_u8
from ._scan import ofb_keystream_scan


def ofb_encrypt(key, iv, plaintext) -> bytes:
    key = bytes(key)
    iv = to_u8(iv)[:BLOCK]
    data = to_u8(plaintext)
    nblocks = (len(data) + BLOCK - 1) // BLOCK
    if nblocks == 0:
        return b""
    nb = block_bucket(nblocks)
    ks = np.asarray(
        ofb_keystream_scan(
            round_keys(key),
            jnp.asarray(iv, jnp.uint8),
            jnp.zeros((nb, 1), jnp.uint8),
        )
    ).reshape(-1)[: len(data)]
    return bytes(ks ^ data)


def ofb_decrypt(key, iv, ciphertext) -> bytes:
    return ofb_encrypt(key, iv, ciphertext)
