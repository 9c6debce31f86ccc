"""Fused bulk AES-GCM-SIV seal/open: nonce-misuse-resistant AEAD at bulk
throughput.

Structure (RFC 8452; parity with micro_aes.c:1418-1515):

  pass 1: POLYVAL of the plaintext + length block, as MXU matmuls over
          powers of the dot-matrix (same machinery as GHASH — only the
          per-key matrix differs), then tag = E(pv ^ nonce, bit-cleared);
  pass 2: LE32 counter stream from the tag — counter *words* are plain
          vector math (word 0 = tag_lo + index), so the counters enter
          the ctrw_fused kernel as words and get butterflied in-kernel.

Whole blocks, empty AAD (the general modes/gcm_siv.py handles the rest).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bitslice import key_planes
from ..core.keyschedule import expand_key
from ..errors import AuthenticationError
from ..ops.gf128 import blocks_to_bits, polyval_matrix
from ..ops.ghash_bulk import (
    _gf2_matmul_i8,
    combine_levels,
    ghash_power_tables,
)
from ..utils.bytesio import BLOCK, verify_tag
from .gcm_siv import _derive_keys

TILE = 1024  # polyval tile in blocks (chunk 32 x chunk2 32)


@functools.lru_cache(maxsize=256)
def _siv_key_setup(key: bytes, nonce: bytes):
    """Per-(key, nonce) derived keys + POLYVAL power tables + key planes."""
    auth_key, msg_key = _derive_keys(key, nonce)
    m = polyval_matrix(np.frombuffer(auth_key, np.uint8))
    tables = ghash_power_tables(m, 32, 32)  # standard bit order
    kp = jnp.asarray(key_planes(expand_key(msg_key)))
    return msg_key, kp, tables


def gcm_siv_seal_kernel(kp, tables, tag_words, pt_blocks):
    """Pass 2: LE32 counter stream from tag words; returns ct blocks."""
    from ..ops.pallas_seal import (
        bytes_to_stream,
        ctrw_fused_auto,
        seal_word_align,
        stream_to_bytes,
    )

    n = pt_blocks.shape[0]
    w = -(-n // 32)
    w += (-w) % seal_word_align()

    # counter stream [W, 128]: lane 4j+k of row w' holds word k of block
    # 32w'+j — word 0 counts (LE32 wrap), words 1..3 are the tag words
    # (MSB of byte 15 already set by the caller).
    lane = jnp.arange(128, dtype=jnp.uint32)
    pos = 32 * jnp.arange(w, dtype=jnp.uint32)[:, None] + lane[None, :] // 4
    base = tag_words[lane % 4][None, :]
    ctrw = jnp.where(lane[None, :] % 4 == 0, base + pos, base)

    ptw = bytes_to_stream(pt_blocks, 0, w)
    ctw = ctrw_fused_auto(kp.reshape(-1, 1), ctrw, ptw)
    return stream_to_bytes(ctw, 0, n)


def _polyval_tag_kernel(tables, data_blocks, len_block):
    """Pass 1: POLYVAL(data || len_block) via the bulk matmul machinery."""
    n = data_blocks.shape[0]
    total = n + 1
    pad = (-total) % TILE
    bits = jnp.concatenate([
        jnp.zeros((pad, 128), jnp.int8),
        blocks_to_bits(data_blocks).astype(jnp.int8),
        blocks_to_bits(len_block[None, :]).astype(jnp.int8),
    ])
    w1, w2 = tables[0], tables[1]
    s1 = _gf2_matmul_i8(bits.reshape((pad + total) // 32, 32 * 128), w1)
    chunk2 = w2.shape[0] // 128
    s2 = _gf2_matmul_i8(
        s1.astype(jnp.int8).reshape(-1, chunk2 * 128), w2)
    acc = combine_levels(s2.astype(jnp.int8), tables)
    from ..ops.gf128 import bits_to_blocks

    return bits_to_blocks(acc)


_polyval_tag_jit = jax.jit(_polyval_tag_kernel)
_siv_seal_jit = jax.jit(gcm_siv_seal_kernel)


def _tag(key: bytes, nonce: bytes, data_blocks: np.ndarray, n: int) -> np.ndarray:
    msg_key, kp, tables = _siv_key_setup(key, nonce)
    lb = np.zeros(BLOCK, np.uint8)
    lb[8:] = np.frombuffer((n * BLOCK * 8).to_bytes(8, "little"), np.uint8)
    pv = np.array(_polyval_tag_jit(tables, jnp.asarray(data_blocks),
                                   jnp.asarray(lb)))
    pv[:12] ^= np.frombuffer(nonce, np.uint8)
    pv[15] &= 0x7F
    from .. import native

    return native.oracle_encrypt(msg_key, pv.reshape(1, BLOCK))[0]


def gcm_siv_seal(key, nonce, plaintext) -> bytes:
    """Bulk GCM-SIV seal: ct || 16-byte tag (12-byte nonce, no AAD,
    whole blocks; general path: modes/gcm_siv.py)."""
    key, nonce = bytes(key), bytes(nonce)
    assert len(nonce) == 12
    if jax.default_backend() != "tpu":
        from .gcm_siv import gcm_siv_encrypt

        return gcm_siv_encrypt(key, nonce, b"", plaintext)
    pt = np.frombuffer(bytes(plaintext), np.uint8).reshape(-1, BLOCK)
    tag = _tag(key, nonce, pt, pt.shape[0])
    msg_key, kp, tables = _siv_key_setup(key, nonce)
    base = tag.copy()
    base[15] |= 0x80
    tag_words = jnp.asarray(
        base.view(np.uint32) if base.flags.c_contiguous else base.copy().view(np.uint32))
    ct = _siv_seal_jit(kp, tables, tag_words, jnp.asarray(pt))
    return bytes(np.asarray(ct).reshape(-1)) + bytes(tag)


def gcm_siv_open(key, nonce, ct_and_tag) -> bytes:
    """Bulk GCM-SIV open: decrypt (CTR from received tag), recompute the
    tag over the plaintext, verify."""
    key, nonce = bytes(key), bytes(nonce)
    data = bytes(ct_and_tag)
    if jax.default_backend() != "tpu":
        from .gcm_siv import gcm_siv_decrypt

        return gcm_siv_decrypt(key, nonce, b"", data)
    ct, tag = data[:-16], np.frombuffer(data[-16:], np.uint8)
    blocks = np.frombuffer(ct, np.uint8).reshape(-1, BLOCK)
    msg_key, kp, tables = _siv_key_setup(key, nonce)
    base = tag.copy()
    base[15] |= 0x80
    tag_words = jnp.asarray(base.copy().view(np.uint32))
    pt = np.asarray(_siv_seal_jit(kp, tables, tag_words, jnp.asarray(blocks)))
    expect = _tag(key, nonce, pt, pt.shape[0])
    if not verify_tag(expect, tag):
        raise AuthenticationError("GCM-SIV tag mismatch")
    return bytes(pt.reshape(-1))
