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
this kernel requires a 12-byte nonce and whole-block length (AAD of any
byte length is supported: its GHASH partial folds in ahead of the
ciphertext via one cached matrix power).
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
from ..utils.bytesio import BLOCK, verify_tag
from .common import enc_block


from ..utils.keycache import key_cache


@key_cache(maxsize=64)
def gcm_key_setup(key: bytes, chunk: int = 32, chunk2: int = 32):
    """Per-key precompute: bitsliced key planes + plane-ordered GHASH
    power tables."""
    rk = expand_key(key)
    kp = jnp.asarray(key_planes(rk))
    h = enc_block(key, np.zeros(BLOCK, np.uint8))
    m_h = ghash_matrix(h)  # host numpy probe
    tables = ghash_power_tables(m_h, chunk, chunk2, plane_order=(chunk == 32))
    return kp, tables


def _len_block(n_blocks: int, aad_bytes: int = 0) -> jax.Array:
    lb = np.zeros(BLOCK, np.uint8)
    lb[:8] = np.frombuffer((aad_bytes * 8).to_bytes(8, "big"), np.uint8)
    lb[8:] = np.frombuffer((n_blocks * BLOCK * 8).to_bytes(8, "big"), np.uint8)
    return jnp.asarray(lb)


# std GHASH bit index q_std = 8p + (7-b)  ->  plane-order index b*16 + p
_STD2PLANE = np.array(
    [8 * (q % 16) + 7 - q // 16 for q in range(128)], dtype=np.int32
)


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


# ---------------------------------------------------------------------------
# v3: single fused Pallas kernel (TPU only) — counter + cipher + xor + bits
# ---------------------------------------------------------------------------


@key_cache(maxsize=512)
def _trail_adjust_t(key: bytes, z: int):
    """((M_H^z)^-1)^T as int8 — compensates the z trailing masked stream
    positions of the fused kernel (exponents count from the stream end)."""
    from ..ops.gf128 import gf2_matinv_np, mat_power_gf2_np

    _, tables = gcm_key_setup(key)
    mz = (mat_power_gf2_np(np.asarray(tables[3]), z) if z
          else np.eye(128, dtype=np.uint8))
    return jnp.asarray(gf2_matinv_np(mz).T.astype(np.int8))


def seal_stream_words(n_blocks: int, chunk2: int = 32) -> int:
    """Static stream width W (rows of the u32[W, 128] w-major stream) for
    a message/shard of n blocks: data at positions 2..n+2, rounded up to
    lcm(kernel tile, chunk2) words."""
    import math

    from ..ops.pallas_seal import seal_word_align

    align = math.lcm(seal_word_align(), chunk2)
    w = -(-(n_blocks + 2) // 32)
    return w + (-w) % align


def fused_seal_stream(kp, tables, j0, pt_stream, n: int,
                      open_direction: bool = False, start=-1):
    """Fused-kernel core, stream form: pt_stream is the w-major
    uint32[W, 128] stream (a pure host-side numpy view of the byte
    stream: row w lane 4j+k = LE word k of block 32w+j) with the message
    at positions 2..n+2.  Returns (out_stream, ek_j0_block, acc_bits)
    where acc_bits uint8[128] is the local GHASH partial *before* the
    trailing-pad compensation.  `start` (traced int32) is the counter
    offset of stream position 0 relative to J0 (-1 for a whole message;
    sp_idx*L - 1 for a block shard); must keep generation 32-aligned.

    Keeping the device end-to-end in stream form matters: an [N,16] u8
    block array is lane-padded 8x on TPU, so every relayout touching it
    costs more than the cipher itself."""
    from ..ops.ghash_bulk import _gf2_matmul_i8, combine_levels
    from ..ops.pallas_seal import seal_fused_auto

    w = pt_stream.shape[0]
    b32 = j0.astype(jnp.uint32)
    j0_lo = (b32[12] << 24) | (b32[13] << 16) | (b32[14] << 8) | b32[15]
    j0_hi = (b32[9] << 16) | (b32[10] << 8) | b32[11]
    s32 = jnp.asarray(start, jnp.int32)
    sext = (s32 >> 31).astype(jnp.uint32)
    lo0 = j0_lo + s32.astype(jnp.uint32)
    carry0 = (lo0 < j0_lo).astype(jnp.uint32)
    widx = jnp.arange(w, dtype=jnp.uint32) * 32
    lo = lo0 + widx
    hi = (j0_hi + sext + carry0 + (lo < lo0).astype(jnp.uint32)) & 0xFFFFFF
    lohi = jnp.stack([lo, hi])

    bits_j0 = (j0[:, None] >> np.arange(8)) & 1  # [16,8]
    j0c = (bits_j0.T.reshape(128, 1).astype(jnp.uint32) * jnp.uint32(0xFFFFFFFF))

    # validity mask: stream position 32w+j holds a message block iff the
    # position is in [2, n+2) (n, w static under jit -> plain numpy)
    pv = np.zeros(32 * w, dtype=np.uint64)
    pv[2: n + 2] = 1
    ghm = np.zeros(w, np.uint32)
    for j in range(32):
        ghm |= (pv[j::32].astype(np.uint32) << j)
    ghmask = jnp.asarray(ghm[None, :])

    # GHASH level 1 runs INSIDE the kernel (one MXU contraction against
    # W1^T); only the [128, W] partials come back — the 8x-message bit
    # tensor of the previous design never exists in HBM.
    w1, w2 = tables[0], tables[1]
    kp_flat = kp.reshape(-1, 1)
    if jax.default_backend() == "tpu":
        # transposed-stream kernel (VERDICT r4 item 4): two XLA 2D
        # transposes at the boundary instead of two VMEM [TILE, 128]
        # transposes per tile — measured 44.8 vs 34.7 GB/s kernel-side
        # (tools/seal_t_ab.py); the boundary transposes cost far less
        # than the per-tile forms they replace
        from ..ops.pallas_seal import seal_fused_t

        ctw_t, s1t = seal_fused_t(kp_flat, j0c, lohi, ghmask,
                                  jnp.transpose(w1).astype(jnp.int8),
                                  jnp.transpose(pt_stream),
                                  bits_from_input=open_direction)
        ctw = jnp.transpose(ctw_t)
    else:
        ctw, s1t = seal_fused_auto(kp_flat, j0c, lohi, ghmask,
                                   jnp.transpose(w1).astype(jnp.int8),
                                   pt_stream,
                                   bits_from_input=open_direction)

    ek_j0 = jax.lax.bitcast_convert_type(ctw[0, 4:8], jnp.uint8).reshape(16)

    chunk2 = w2.shape[0] // 128
    s2 = _gf2_matmul_i8(
        jnp.transpose(s1t).reshape(w // chunk2, chunk2 * 128), w2)
    acc = combine_levels(s2.astype(jnp.int8), tables)
    return ctw, ek_j0, acc


def fused_seal_body(kp, tables, j0, pt_blocks,
                    open_direction: bool = False, start=-1):
    """Blocks-form wrapper over fused_seal_stream (used by the sharded
    engine, whose public arrays are [B, N, 16] blocks): relayouts to and
    from the stream happen on-device here — convenient but slower than
    the stream API; bulk single-chip paths use fused_seal_stream with
    host-side views instead."""
    from ..ops.pallas_seal import bytes_to_stream, stream_to_bytes

    n = pt_blocks.shape[0]
    chunk2 = tables[1].shape[0] // 128
    w = seal_stream_words(n, chunk2)
    ptw = bytes_to_stream(pt_blocks, 2, w)
    ctw, ek_j0, acc = fused_seal_stream(kp, tables, j0, ptw, n,
                                        open_direction, start)
    return stream_to_bytes(ctw, 2, n), ek_j0, acc


def fused_trailing_pad(n_blocks: int, chunk2: int = 32) -> int:
    """z = number of trailing masked stream positions for a message/shard
    of n blocks (static).  chunk2 must match the GHASH tables in use (the
    word axis is padded to lcm(kernel tile, chunk2) in fused_seal_body)."""
    import math

    from ..ops.pallas_seal import seal_word_align

    align = math.lcm(seal_word_align(), chunk2)
    w = -(-(n_blocks + 2) // 32)
    w += (-w) % align
    return 32 * w - n_blocks - 2


@key_cache(maxsize=512)
def _aad_shift_t(key: bytes, n_ct_blocks: int):
    """(M_H^n)^T as int8 — shifts the AAD partial past the ciphertext
    blocks: G = M^n * G_aad ^ G_ct."""
    from ..ops.gf128 import mat_power_gf2_np

    _, tables = gcm_key_setup(key)
    return jnp.asarray(
        mat_power_gf2_np(np.asarray(tables[3]), n_ct_blocks).T.astype(np.int8))


def _aad_fold(tables, acc, aad_blocks, aad_shift_t):
    """Fold the AAD GHASH partial in front of the ciphertext partial."""
    from ..ops.gf128 import blocks_to_bits
    from ..ops.ghash_bulk import _gf2_matmul_i8, ghash_from_bits

    chunk2 = tables[1].shape[0] // 128
    tile = 32 * chunk2
    abits = blocks_to_bits(aad_blocks).astype(jnp.int8)[:, _STD2PLANE]
    apad = (-aad_blocks.shape[0]) % tile
    if apad:
        abits = jnp.concatenate(
            [jnp.zeros((apad, 128), jnp.int8), abits], axis=0)
    g_aad = ghash_from_bits(tables, abits)
    return acc ^ _gf2_matmul_i8(g_aad.astype(jnp.int8), aad_shift_t)


def gcm_seal_stream_fused(kp, tables, trail_adj_t, j0, pt_stream, n: int,
                          open_direction: bool = False,
                          aad_blocks=None, aad_bytes: int = 0,
                          aad_shift_t=None):
    """Stream-form fused seal/open: stream in, stream out (the bulk API
    views bytes as the stream host-side, so the device never touches a
    lane-padded [N,16] block array).  Returns (out_stream, tag)."""
    from ..ops.ghash_bulk import _gf2_matmul_i8

    ctw, ek_j0, acc = fused_seal_stream(kp, tables, j0, pt_stream, n,
                                        open_direction)
    acc = _gf2_matmul_i8(acc.astype(jnp.int8), trail_adj_t)
    if aad_blocks is not None and aad_blocks.shape[0]:
        acc = _aad_fold(tables, acc, aad_blocks, aad_shift_t)
    acc = acc.astype(jnp.uint8)
    tag = ek_j0 ^ ghash_finalize(tables, acc, _len_block(n, aad_bytes))
    return ctw, tag


def gcm_seal_kernel_fused(kp, tables, trail_adj_t, j0, pt_blocks,
                          open_direction: bool = False,
                          aad_blocks=None, aad_bytes: int = 0,
                          aad_shift_t=None):
    """v3 fused seal/open (whole message): body + compensation + tag.
    aad_blocks uint8[Na,16] (zero-padded tail) folds in ahead of the
    ciphertext via one cached matrix power (aad_shift_t)."""
    from ..ops.ghash_bulk import _gf2_matmul_i8

    n = pt_blocks.shape[0]
    ct, ek_j0, acc = fused_seal_body(kp, tables, j0, pt_blocks,
                                     open_direction)
    acc = _gf2_matmul_i8(acc.astype(jnp.int8), trail_adj_t)
    if aad_blocks is not None and aad_blocks.shape[0]:
        acc = _aad_fold(tables, acc, aad_blocks, aad_shift_t)
    acc = acc.astype(jnp.uint8)
    tag = ek_j0 ^ ghash_finalize(tables, acc, _len_block(n, aad_bytes))
    return ct, tag


_gcm_seal_fused_jit = jax.jit(
    gcm_seal_kernel_fused, static_argnames=("open_direction", "aad_bytes"))
# donate_argnums=4: the bytes APIs upload a fresh stream used nowhere
# else, and the kernels alias their stream operand onto the output
# (pallas input_output_aliases) — the TPU analogue of the reference's
# in-place contract (micro_aes.h:520-526, VERDICT r4 item 6): one
# stream-sized HBM buffer end to end instead of two, doubling the
# maximum single-dispatch message.
_gcm_seal_stream_jit = jax.jit(
    gcm_seal_stream_fused, donate_argnums=(4,),
    static_argnames=("n", "open_direction", "aad_bytes"))


def host_stream(data: bytes, front_pos: int, w: int) -> np.ndarray:
    """Host-side bytes -> w-major uint32[W, 128] stream (one memcpy into
    the zero-padded buffer; the u32 view itself is free on LE hosts)."""
    words = np.frombuffer(data, np.uint32)
    out = np.zeros(w * 128, np.uint32)
    out[4 * front_pos: 4 * front_pos + len(words)] = words
    return out.reshape(w, 128)


def host_unstream(stream: np.ndarray, front_pos: int, nbytes: int) -> bytes:
    """Host-side stream -> bytes from position front_pos (one memcpy)."""
    flat = np.ascontiguousarray(stream, np.uint32).reshape(-1)
    return flat[4 * front_pos: 4 * front_pos + nbytes // 4].tobytes()


def _aad_prep(key, aad, n_ct_blocks):
    aad = bytes(aad or b"")
    if not aad:
        return None, 0, None
    na = -(-len(aad) // BLOCK)
    blocks = np.zeros((na, BLOCK), np.uint8)
    blocks.reshape(-1)[: len(aad)] = np.frombuffer(aad, np.uint8)
    return jnp.asarray(blocks), len(aad), _aad_shift_t(key, n_ct_blocks)


def ctr_bulk_stream(kp, ctr0, pt_stream):
    """Fused bulk CTR (CTR_NA semantics), stream form: ctr0 =
    nonce||0^3||0x01 block; data occupies stream positions 1.. (counter
    value = position, since CTR starts at 1 and generation starts
    32-aligned at 0)."""
    from ..ops.pallas_seal import ctr_fused, ctr_fused_jnp

    w = pt_stream.shape[0]
    b32 = ctr0.astype(jnp.uint32)
    j0_lo = (b32[12] << 24) | (b32[13] << 16) | (b32[14] << 8) | b32[15]
    j0_hi = (b32[9] << 16) | (b32[10] << 8) | b32[11]
    lo0 = j0_lo - 1
    hi0 = (j0_hi - (lo0 == jnp.uint32(0xFFFFFFFF)).astype(jnp.uint32)) & 0xFFFFFF
    widx = jnp.arange(w, dtype=jnp.uint32) * 32
    lo = lo0 + widx
    hi = (hi0 + (lo < lo0).astype(jnp.uint32)) & 0xFFFFFF
    lohi = jnp.stack([lo, hi])

    if jax.default_backend() == "tpu":
        j0w = jnp.tile(jax.lax.bitcast_convert_type(
            ctr0.reshape(4, 4), jnp.uint32), 32)[None, :]
        return ctr_fused(kp.reshape(-1, 1), j0w, lohi, pt_stream)
    bits_j0 = (ctr0[:, None] >> np.arange(8)) & 1
    j0c = (bits_j0.T.reshape(128, 1).astype(jnp.uint32) * jnp.uint32(0xFFFFFFFF))
    return ctr_fused_jnp(kp.reshape(-1, 1), j0c, lohi, pt_stream)


_ctr_bulk_jit = jax.jit(ctr_bulk_stream)


def ctr_bulk(key, iv, data) -> bytes:
    """Bulk CTR encrypt/decrypt (self-inverse): fused Pallas kernel on
    TPU, the jnp twin elsewhere.  12-byte nonce with the RFC-3686 start
    value (modes/ctr.py semantics); data a whole-block multiple."""
    from ..ops.pallas_seal import seal_word_align

    key = bytes(key)
    iv = bytes(iv)
    data = bytes(data)
    assert len(iv) >= 12
    n = len(data) // BLOCK
    w = -(-(n + 1) // 32)
    w += (-w) % seal_word_align()
    ctr0 = np.zeros(BLOCK, np.uint8)
    ctr0[:12] = np.frombuffer(iv[:12], np.uint8)
    ctr0[15] = 1  # CTR_START_VALUE (micro_aes.h:98)
    kp, _ = gcm_key_setup(key)
    out = _ctr_bulk_jit(kp, jnp.asarray(ctr0),
                        jnp.asarray(host_stream(data, 1, w)))
    return host_unstream(np.asarray(out), 1, len(data))


def gcm_open(key, nonce, ct_and_tag, aad: bytes = b"") -> bytes:
    """Bulk open (verify-then-return-plaintext); constraints as gcm_seal.
    Raises AuthenticationError on tag mismatch."""
    from ..errors import AuthenticationError

    key = bytes(key)
    data = bytes(ct_and_tag)
    ct, tag = data[:-16], data[-16:]
    nonce = np.frombuffer(bytes(nonce), np.uint8)
    assert len(nonce) == 12
    j0 = np.zeros(BLOCK, np.uint8)
    j0[:12] = nonce
    j0[15] = 1
    kp, tables = gcm_key_setup(key)
    # the fused path runs everywhere (Pallas on TPU, jnp twin elsewhere
    # via seal_fused_auto) — verify-BEFORE-release ordering preserved.
    # Bytes<->stream conversion happens HOST-side (numpy views): the
    # device never touches a lane-padded [N,16] block array.
    n = len(ct) // BLOCK
    w = seal_stream_words(n)
    adj = _trail_adjust_t(key, fused_trailing_pad(n))
    ab, alen, ashift = _aad_prep(key, aad, n)
    ptw, got = _gcm_seal_stream_jit(kp, tables, adj, jnp.asarray(j0),
                                    jnp.asarray(host_stream(ct, 2, w)), n,
                                    open_direction=True, aad_blocks=ab,
                                    aad_bytes=alen, aad_shift_t=ashift)
    if not verify_tag(np.asarray(got), tag):
        raise AuthenticationError("GCM tag mismatch")
    return host_unstream(np.asarray(ptw), 2, len(ct))


def gcm_seal(key, nonce, plaintext, aad: bytes = b"") -> bytes:
    """Bulk seal: ct || 16-byte tag.  12-byte nonce, whole-block
    plaintext, optional AAD (the general API handles ragged cases)."""
    key = bytes(key)
    kp, tables = gcm_key_setup(key)
    nonce = np.frombuffer(bytes(nonce), np.uint8)
    assert len(nonce) == 12, "bulk seal path requires a 12-byte nonce"
    j0 = np.zeros(BLOCK, np.uint8)
    j0[:12] = nonce
    j0[15] = 1
    plaintext = bytes(plaintext)
    n = len(plaintext) // BLOCK
    w = seal_stream_words(n)
    adj = _trail_adjust_t(key, fused_trailing_pad(n))
    ab, alen, ashift = _aad_prep(key, aad, n)
    ctw, tag = _gcm_seal_stream_jit(
        kp, tables, adj, jnp.asarray(j0),
        jnp.asarray(host_stream(plaintext, 2, w)), n,
        aad_blocks=ab, aad_bytes=alen, aad_shift_t=ashift)
    return host_unstream(np.asarray(ctw), 2, len(plaintext)) + \
        bytes(np.asarray(tag))
