"""Bulk GHASH: the serial Horner fold reformulated as MXU matmuls.

GHASH over n blocks is G = sum_i M_H^(n-i+1) c_i (M_H = the per-key GF(2)
bit-matrix, ops/gf128.ghash_matrix).  Two-level decomposition:

  level 1:  chunks of C blocks  -> one batched [T, C*128] @ [C*128, 128]
            matmul (bits as bf16; exact since partial sums <= C*128 < 2^24)
  level 2:  groups of C2 chunks -> same trick with powers of M^C
  outer:    short lax.scan with the constant matrix M^(C*C2)

This turns the 128-step-per-block serial chain of the reference
(micro_aes.c:476-493) into dense MXU work; the same partials combine
across shards with one XOR-psum (parallel/sharded.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .gf128 import bits_to_blocks, blocks_to_bits, ghash_matrix, mat_mul_gf2

CHUNK = 32     # blocks per level-1 chunk
CHUNK2 = 32    # chunks per level-2 group


def ghash_power_tables(m_h: jax.Array, chunk: int = CHUNK, chunk2: int = CHUNK2):
    """Per-key precompute: (W1 [C*128,128], W2 [C2*128,128], M_outer, M_H).

    W1 row-block j holds (M^(C-j))^T so that  S = c_flat @ W1  computes
    sum_j M^(C-j) c_j for one chunk; analogously W2 with powers of M^C."""
    pows = [m_h]
    for _ in range(chunk - 1):
        pows.append(mat_mul_gf2(m_h, pows[-1]))
    # pows[k] = M^(k+1); A_j = M^(C-j) for j=0..C-1 -> pows[C-1-j]
    w1 = jnp.concatenate([jnp.transpose(pows[chunk - 1 - j]) for j in range(chunk)], axis=0)
    m_c = pows[chunk - 1]  # M^C
    pows2 = [jnp.eye(128, dtype=jnp.uint8), m_c]
    for _ in range(chunk2 - 2):
        pows2.append(mat_mul_gf2(m_c, pows2[-1]))
    # A2_j = (M^C)^(C2-1-j) -> pows2[C2-1-j]
    w2 = jnp.concatenate([jnp.transpose(pows2[chunk2 - 1 - j]) for j in range(chunk2)], axis=0)
    m_outer = mat_mul_gf2(m_c, pows2[chunk2 - 1])  # M^(C*C2)
    return (w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
            m_outer.astype(jnp.bfloat16), m_h)


def _gf2_matmul_bf16(x, w):
    """(x @ w) mod 2 with bf16 operands on the MXU, exact f32 accumulate."""
    acc = jax.lax.dot_general(
        x, w, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (acc.astype(jnp.int32) & 1)


def ghash_bulk(tables, ct_blocks: jax.Array, init_bits=None) -> jax.Array:
    """GHASH accumulator after folding ct_blocks [N,16]; N must be a
    multiple of chunk*chunk2 (derived from the table shapes).  Returns the
    bit-vector uint8[128] (state *before* the final length-block fold)."""
    w1, w2, m_outer, _ = tables
    chunk = w1.shape[0] // 128
    chunk2 = w2.shape[0] // 128
    n = ct_blocks.shape[0]
    assert n % (chunk * chunk2) == 0
    t = n // chunk
    bits = blocks_to_bits(ct_blocks).astype(jnp.bfloat16)  # [N,128]
    if init_bits is not None:
        # init enters as a virtual block xored into the first position's
        # contribution: M^n(init) distributes; fold it into block 0.
        bits = bits.at[0].set(bits[0] + init_bits.astype(jnp.bfloat16))
        bits = (bits.astype(jnp.int32) & 1).astype(jnp.bfloat16)
    s1 = _gf2_matmul_bf16(bits.reshape(t, chunk * 128), w1)  # [T,128] int
    t2 = t // chunk2
    s2 = _gf2_matmul_bf16(
        s1.astype(jnp.bfloat16).reshape(t2, chunk2 * 128), w2)  # [T2,128]

    # log-depth combine: G = sum_g M^(S*(T2-1-g)) U_g, S = chunk*chunk2.
    # Pairwise fold (V_k = M^span U_{2k} ^ U_{2k+1}) halves the count each
    # level while squaring the span matrix — log2(T2) batched matmuls
    # instead of a T2-step serial scan.
    u = s2
    pow2 = 1
    while pow2 < u.shape[0]:
        pow2 *= 2
    if pow2 != u.shape[0]:  # front-pad with zeros (exponents count from end)
        u = jnp.concatenate(
            [jnp.zeros((pow2 - u.shape[0], 128), u.dtype), u], axis=0)
    m_span_t = jnp.transpose(m_outer).astype(jnp.bfloat16)
    while u.shape[0] > 1:
        left, right = u[0::2], u[1::2]
        u = _gf2_matmul_bf16(left.astype(jnp.bfloat16), m_span_t) ^ right
        if u.shape[0] > 1:
            # (M^2)^T = (M^T)^2
            m_span_t = _gf2_matmul_bf16(m_span_t, m_span_t).astype(jnp.bfloat16)
    return u[0].astype(jnp.uint8)


def ghash_finalize(tables, acc_bits: jax.Array, len_block: jax.Array) -> jax.Array:
    """One more fold with the length block: G = M(acc ^ bits(len))."""
    w1, w2, m_outer, m_h = tables
    x = (acc_bits ^ blocks_to_bits(len_block)).astype(jnp.bfloat16)
    mt = jnp.transpose(m_h.astype(jnp.bfloat16))
    g = _gf2_matmul_bf16(x, mt).astype(jnp.uint8)
    return bits_to_blocks(g)
