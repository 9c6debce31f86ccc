"""Fused single-dispatch bulk AES-GCM ("seal") — the throughput engine.

One jit computes counter generation -> bitsliced cipher -> keystream xor
-> two-level MXU GHASH -> tag, entirely on device.  This is the flagship
step benchmarked by bench.py and sharded by parallel/sharded.py; the
per-message host path (modes/gcm.py) remains the general/ragged API.

Constraints of the bulk path (by design, for speed-of-light shapes):
12-byte nonce, empty AAD, message length a multiple of the GHASH tile
(chunk*chunk2 blocks).  bench/serving pad to that granularity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bitslice import encrypt_planes, key_planes, pack_planes, unpack_planes
from ..core.keyschedule import expand_key
from ..ops.counter import counter_blocks
from ..ops.gf128 import blocks_to_bits, ghash_matrix
from ..ops.ghash_bulk import ghash_bulk, ghash_finalize, ghash_power_tables
from ..utils.bytesio import BLOCK
from .common import enc_block


@functools.lru_cache(maxsize=64)
def gcm_key_setup(key: bytes, chunk: int = 32, chunk2: int = 32):
    """Per-key precompute: bitsliced key planes + GHASH power tables."""
    rk = expand_key(key)
    kp = jnp.asarray(key_planes(rk))
    h = enc_block(key, np.zeros(BLOCK, np.uint8))
    m_h = ghash_matrix(jnp.asarray(h))
    tables = ghash_power_tables(m_h, chunk, chunk2)
    return kp, tables


def gcm_seal_kernel(kp, tables, j0, pt_blocks):
    """Jittable fused seal: returns (ct_blocks [N,16], tag [16])."""
    n = pt_blocks.shape[0]
    nc = ((n + 1 + 31) // 32) * 32  # counters 0..n, padded to 32
    ctrs = counter_blocks(j0, nc, 0, "be")
    ks = unpack_planes(encrypt_planes(kp, pack_planes(ctrs)), nc)
    ek_j0 = ks[0]
    ct = pt_blocks ^ ks[1: n + 1]
    acc = ghash_bulk(tables, ct)
    len_block = jnp.zeros(BLOCK, jnp.uint8)
    nbits = n * BLOCK * 8
    for i in range(8):  # BE 64-bit bit-length in bytes 8..15 (static n)
        len_block = len_block.at[15 - i].set((nbits >> (8 * i)) & 0xFF)
    tag = ek_j0 ^ ghash_finalize(tables, acc, len_block)
    return ct, tag


_gcm_seal_jit = jax.jit(gcm_seal_kernel)


def gcm_seal(key, nonce, plaintext) -> bytes:
    """Bulk seal: ct || 16-byte tag. len(plaintext) must be a multiple of
    16*chunk*chunk2 bytes (16 KiB with default chunking)."""
    key = bytes(key)
    kp, tables = gcm_key_setup(key)
    nonce = np.frombuffer(bytes(nonce), np.uint8)
    assert len(nonce) == 12, "bulk seal path requires a 12-byte nonce"
    j0 = np.zeros(BLOCK, np.uint8)
    j0[:12] = nonce
    j0[15] = 1
    pt = np.frombuffer(bytes(plaintext), np.uint8).reshape(-1, BLOCK)
    ct, tag = _gcm_seal_jit(kp, tables, jnp.asarray(j0), jnp.asarray(pt))
    return bytes(np.asarray(ct).reshape(-1)) + bytes(np.asarray(tag))
