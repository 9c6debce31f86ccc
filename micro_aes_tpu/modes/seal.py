"""Fused single-dispatch bulk AES-GCM ("seal") — the throughput engine.

v2 pipeline, fully bit-plane-resident (no per-block byte shuffles):

  counter planes (direct vector math, ops/counter.counter_planes_be)
    -> bitsliced cipher (core/bitslice.encrypt_planes)
    -> xor with plaintext planes (butterfly-packed words)
    -> int8 bit rows -> two-level MXU GHASH (plane-ordered tables)
    -> tag.

Key layout facts exploited:
  * counter values are consecutive, so with a 32-aligned generation start
    every bit-plane word is either a fixed lane pattern (bits 0..4) or a
    per-word broadcast (bits >= 5) — the keystream never exists in byte
    form at all;
  * a 12-byte-nonce J0 has low word == 1, so the alignment offset is the
    *static* constant 2 and E(J0) is simply stream position 1;
  * leading zero blocks are free in GHASH (exponents count from the end),
    so tile padding always goes in front.

The per-message host path (modes/gcm.py) remains the general/ragged API;
this kernel requires a 12-byte nonce, empty AAD, and whole-block length.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bitslice import (
    blocks_to_words,
    key_planes,
    planes_to_words,
    words_to_blocks,
    words_to_planes,
)
from ..core.keyschedule import expand_key
from ..ops.counter import counter_planes_be
from ..ops.pallas_cipher import cipher_planes_auto
from ..ops.gf128 import ghash_matrix
from ..ops.ghash_bulk import ghash_finalize, ghash_from_bits, planes_to_bits_i8
from ..ops.ghash_bulk import ghash_power_tables
from ..utils.bytesio import BLOCK
from .common import enc_block


@functools.lru_cache(maxsize=64)
def gcm_key_setup(key: bytes, chunk: int = 32, chunk2: int = 32):
    """Per-key precompute: bitsliced key planes + plane-ordered GHASH
    power tables."""
    rk = expand_key(key)
    kp = jnp.asarray(key_planes(rk))
    h = enc_block(key, np.zeros(BLOCK, np.uint8))
    m_h = ghash_matrix(jnp.asarray(h))
    tables = ghash_power_tables(m_h, chunk, chunk2, plane_order=(chunk == 32))
    return kp, tables


def _len_block(n_blocks: int) -> jax.Array:
    lb = np.zeros(BLOCK, np.uint8)
    lb[8:] = np.frombuffer((n_blocks * BLOCK * 8).to_bytes(8, "big"), np.uint8)
    return jnp.asarray(lb)


def gcm_seal_kernel(kp, tables, j0, pt_blocks):
    """Jittable fused seal: returns (ct_blocks [N,16], tag [16]).
    Requires a J0 whose low 32 bits are 1 (12-byte-nonce fast path)."""
    n = pt_blocks.shape[0]
    chunk2 = tables[1].shape[0] // 128
    tile = 32 * chunk2

    # keystream stream: position q holds counter value J0 - 1 + q
    # (32-aligned since J0_lo == 1); data occupies positions 2..n+1 and
    # position 1 is E(J0).
    nwords = -(-(n + 2) // 32)
    nwords += (-nwords) % 4  # keep the lane axis reasonably tiled
    ctr_planes = counter_planes_be(j0, nwords, -1)
    ks_planes = cipher_planes_auto(kp, ctr_planes)

    pt_words = blocks_to_words(pt_blocks)  # [4, N]
    pt_words = jnp.pad(pt_words, ((0, 0), (2, 32 * nwords - n - 2)))
    ct_planes = words_to_planes(pt_words) ^ ks_planes

    ct_words = planes_to_words(ct_planes)  # [4, 32*nwords]
    ek_j0 = words_to_blocks(ct_words[:, 1:2])[0]
    ct = words_to_blocks(ct_words[:, 2: n + 2])

    bits = planes_to_bits_i8(ct_planes)[2: n + 2]  # [N,128] plane order
    gpad = (-n) % tile
    if gpad:
        bits = jnp.concatenate(
            [jnp.zeros((gpad, 128), jnp.int8), bits], axis=0)
    acc = ghash_from_bits(tables, bits)
    tag = ek_j0 ^ ghash_finalize(tables, acc, _len_block(n))
    return ct, tag


_gcm_seal_jit = jax.jit(gcm_seal_kernel)


def gcm_seal(key, nonce, plaintext) -> bytes:
    """Bulk seal: ct || 16-byte tag.  12-byte nonce, no AAD, whole-block
    plaintext (the general API handles everything else)."""
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
