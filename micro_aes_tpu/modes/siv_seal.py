"""Fused bulk AES-GCM-SIV seal/open: nonce-misuse-resistant AEAD at bulk
throughput.

Structure (RFC 8452; parity with micro_aes.c:1418-1515):

  pass 1: POLYVAL of the plaintext + length block INSIDE the level-1
          Pallas kernel (ops/pallas_seal.ghash1_fused — the MAC half of
          the GCM seal kernel; only the per-key table differs between
          GHASH and POLYVAL), then tag = E(pv ^ nonce, bit-cleared);
  pass 2: LE32 counter stream from the tag — counter *words* are plain
          vector math (word 0 = tag_lo + index), so the counters enter
          the ctrw_fused kernel as words and get butterflied in-kernel.

Both passes share ONE w-major stream with the message at the stream
TAIL (len block last): POLYVAL exponents count from the end, so all
padding lands in front where masked positions are free — no inverse-
power compensation matrices — and the counter base simply shifts by
the front offset.  The v1 design expanded an 8x-message bit tensor in
HBM for pass 1 and ran 13x slower than the GCM seal.

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
from ..ops.gf128 import bits_to_blocks, polyval_matrix
from ..ops.ghash_bulk import _gf2_matmul_i8, combine_levels, ghash_power_tables
from ..utils.bytesio import BLOCK, verify_tag
from .gcm_siv import _derive_keys


from ..utils.keycache import key_cache


@key_cache(maxsize=256)
def _siv_key_setup(key: bytes, nonce: bytes):
    """Per-(key, nonce) derived keys + plane-ordered POLYVAL power tables
    (+ transposed level-1 table for the fused kernel) + key planes."""
    auth_key, msg_key = _derive_keys(key, nonce)
    m = polyval_matrix(np.frombuffer(auth_key, np.uint8))
    tables = ghash_power_tables(m, 32, 32, plane_order=True)
    w1t = jnp.transpose(tables[0]).astype(jnp.int8)
    kp = jnp.asarray(key_planes(expand_key(msg_key)))
    return msg_key, kp, tables, w1t


def _stream_words(n_blocks: int) -> int:
    """Stream width W for a message of n blocks + the trailing len block."""
    from ..ops.pallas_seal import seal_word_align

    w = -(-(n_blocks + 1) // 32)
    return w + (-w) % max(seal_word_align(), 32)


def _siv_basew(tag_words, front: int):
    """Lane-replicated counter base u32[1,128] for the SIV stream
    kernels: lane 4jj+k = tag word k, with the stream-front offset
    pre-subtracted from word 0 so counter(position p) = base + p."""
    lane = jnp.arange(128, dtype=jnp.uint32)
    base = tag_words[lane % 4][None, :]
    return jnp.where(lane[None, :] % 4 == 0,
                     base - jnp.uint32(front), base)


def gcm_siv_ctr_stream(kp, tag_words, data_stream, front: int):
    """Pass 2 on the shared stream: CTR from tag words, data at stream
    positions front..  Returns the processed stream (self-inverse).
    Counters are generated IN-KERNEL from the base (the v2 path
    materialized a full [W,128] counter stream in HBM — one extra
    write + read of the whole message)."""
    from ..ops.pallas_seal import siv_ctrw_fused_auto

    return siv_ctrw_fused_auto(kp.reshape(-1, 1),
                               _siv_basew(tag_words, front), data_stream)


def polyval_stream(tables, w1t, data_stream, n: int):
    """Pass 1 on the shared stream: POLYVAL over stream positions
    [front, 32W) — the message blocks plus the len block already placed
    at the last position.  Returns the accumulator block uint8[16]."""
    from ..ops.pallas_seal import ghash1_fused_auto

    w = data_stream.shape[0]
    front = 32 * w - (n + 1)
    s1t = ghash1_fused_auto(jnp.asarray(_ghm_mask(w, front, 32 * w)),
                            w1t, data_stream)
    chunk2 = tables[1].shape[0] // 128
    s2 = _gf2_matmul_i8(
        jnp.transpose(s1t).reshape(w // chunk2, chunk2 * 128), tables[1])
    acc = combine_levels(s2.astype(jnp.int8), tables)
    return bits_to_blocks(acc)


def _ghm_mask(w: int, lo: int, hi: int) -> np.ndarray:
    """u32[1, W] kernel mask with stream positions [lo, hi) valid."""
    pv = np.zeros(32 * w, dtype=np.uint64)
    pv[lo:hi] = 1
    ghm = np.zeros(w, np.uint32)
    for j in range(32):
        ghm |= (pv[j::32].astype(np.uint32) << j)
    return ghm[None, :]


def _siv_open_stream(kp, tag_words, tables, w1t, ct_stream, n: int):
    """Fused open pass + tag math: returns (pt stream, pv block)."""
    from ..ops.gf128 import blocks_to_bits
    from ..ops.pallas_seal import siv_open_fused_auto

    w = ct_stream.shape[0]
    front = 32 * w - (n + 1)
    ghm = jnp.asarray(_ghm_mask(w, front, 32 * w - 1))  # message only
    ptw, s1t = siv_open_fused_auto(kp.reshape(-1, 1),
                                   _siv_basew(tag_words, front),
                                   ghm, w1t, ct_stream)
    chunk2 = tables[1].shape[0] // 128
    s2 = _gf2_matmul_i8(
        jnp.transpose(s1t).reshape(w // chunk2, chunk2 * 128), tables[1])
    acc = combine_levels(s2.astype(jnp.int8), tables)
    # the len block sits at the last stream position => exponent M^1
    len_bits = blocks_to_bits(jnp.asarray(_len_block_le(n))[None, :])
    corr = _gf2_matmul_i8(len_bits.astype(jnp.int8),
                          jnp.transpose(tables[3].astype(jnp.int8)))[0]
    return ptw, bits_to_blocks(acc ^ corr.astype(jnp.uint8))


def _polyval_pass1_t(tables, w1t, data_stream, n: int):
    """Seal pass 1 with transposed residency (VERDICT r4 items 4+5): ONE
    XLA transpose of the uploaded stream, POLYVAL level-1 through the
    transposed kernel (no per-tile VMEM transposes), and the transposed
    stream handed back device-resident for pass 2 to consume."""
    from ..ops.pallas_seal import ghash1_fused_t_auto

    w = data_stream.shape[0]
    front = 32 * w - (n + 1)
    stream_t = jnp.transpose(data_stream)
    s1t = ghash1_fused_t_auto(jnp.asarray(_ghm_mask(w, front, 32 * w)),
                              w1t, stream_t)
    chunk2 = tables[1].shape[0] // 128
    s2 = _gf2_matmul_i8(
        jnp.transpose(s1t).reshape(w // chunk2, chunk2 * 128), tables[1])
    acc = combine_levels(s2.astype(jnp.int8), tables)
    return stream_t, bits_to_blocks(acc)


def _siv_ctr_pass2_t(kp, tag_words, stream_t, front: int):
    """Seal pass 2 on the transposed stream; returns the NATURAL-layout
    ciphertext stream (one XLA transpose on the way out)."""
    from ..ops.pallas_seal import siv_ctrw_fused_t_auto

    return jnp.transpose(siv_ctrw_fused_t_auto(
        kp.reshape(-1, 1), _siv_basew(tag_words, front), stream_t))


_polyval_stream_jit = jax.jit(polyval_stream, static_argnames=("n",))
_polyval_pass1_t_jit = jax.jit(_polyval_pass1_t, static_argnames=("n",))
_siv_ctr_jit = jax.jit(gcm_siv_ctr_stream, static_argnames=("front",))
_siv_ctr_pass2_t_jit = jax.jit(_siv_ctr_pass2_t, static_argnames=("front",))
_siv_open_jit = jax.jit(_siv_open_stream, static_argnames=("n",))


def _tag_from_pv(msg_key: bytes, nonce: bytes, pv: np.ndarray) -> np.ndarray:
    """tag = E_msgkey(pv ^ (nonce || 0), MSB cleared)  (RFC 8452 §7)."""
    pv = pv.copy()
    pv[:12] ^= np.frombuffer(nonce, np.uint8)
    pv[15] &= 0x7F
    from .. import native

    return native.oracle_encrypt(msg_key, pv.reshape(1, BLOCK))[0]


def _len_block_le(n_blocks: int) -> np.ndarray:
    lb = np.zeros(BLOCK, np.uint8)
    lb[8:] = np.frombuffer((n_blocks * BLOCK * 8).to_bytes(8, "little"),
                           np.uint8)
    return lb


def gcm_siv_seal(key, nonce, plaintext) -> bytes:
    """Bulk GCM-SIV seal: ct || 16-byte tag (12-byte nonce, no AAD,
    whole blocks; general path: modes/gcm_siv.py)."""
    from ..ops.pallas_seal import seal_word_align  # noqa: F401 (backend gate)
    from .seal import host_stream, host_unstream

    key, nonce = bytes(key), bytes(nonce)
    assert len(nonce) == 12
    if jax.default_backend() != "tpu":
        from .gcm_siv import gcm_siv_encrypt

        return gcm_siv_encrypt(key, nonce, b"", plaintext)
    pt = bytes(plaintext)
    n = len(pt) // BLOCK
    msg_key, kp, tables, w1t = _siv_key_setup(key, nonce)
    w = _stream_words(n)
    front = 32 * w - (n + 1)
    buf = host_stream(pt, front, w)
    buf.reshape(-1)[-4:] = _len_block_le(n).view(np.uint32)
    stream = jnp.asarray(buf)

    stream_t, pv = _polyval_pass1_t_jit(tables, w1t, stream, n)
    pv = np.asarray(pv)
    tag = _tag_from_pv(msg_key, nonce, pv)
    base = tag.copy()
    base[15] |= 0x80
    ctw = _siv_ctr_pass2_t_jit(kp, jnp.asarray(base.copy().view(np.uint32)),
                               stream_t, front)
    return host_unstream(np.asarray(ctw), front, len(pt)) + bytes(tag)


def gcm_siv_open(key, nonce, ct_and_tag) -> bytes:
    """Bulk GCM-SIV open: decrypt (CTR from received tag), recompute the
    tag over the plaintext, verify."""
    from .seal import host_stream, host_unstream

    key, nonce = bytes(key), bytes(nonce)
    data = bytes(ct_and_tag)
    if jax.default_backend() != "tpu":
        from .gcm_siv import gcm_siv_decrypt

        return gcm_siv_decrypt(key, nonce, b"", data)
    ct, tag = data[:-16], np.frombuffer(data[-16:], np.uint8)
    n = len(ct) // BLOCK
    msg_key, kp, tables, w1t = _siv_key_setup(key, nonce)
    w = _stream_words(n)
    front = 32 * w - (n + 1)
    base = tag.copy()
    base[15] |= 0x80
    # ONE fused pass: decrypt (in-kernel LE32 counters from the received
    # tag) + POLYVAL level-1 of the recovered plaintext; the len block
    # (exponent M^1 — the last stream position) folds into the combined
    # accumulator afterwards.
    ptw, pv = _siv_open_jit(kp, jnp.asarray(base.copy().view(np.uint32)),
                            tables, w1t, jnp.asarray(host_stream(ct, front, w)),
                            n)
    expect = _tag_from_pv(msg_key, nonce, np.asarray(pv))
    if not verify_tag(expect, tag):
        raise AuthenticationError("GCM-SIV tag mismatch")
    return host_unstream(np.asarray(ptw), front, len(ct))
