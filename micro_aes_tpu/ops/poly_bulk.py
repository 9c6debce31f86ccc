"""Bulk Poly1305: the serial Horner fold reformulated as MXU matmuls.

Same shape as ops/ghash_bulk, but over the integers mod p = 2^130-5
instead of GF(2^128) — parity with the reference's 17-byte-limb
schoolbook arithmetic (micro_aes.c:1901-1997), redesigned TPU-first:

  * field elements live in FIFTEEN 9-BIT LIMBS (values < 2^135 in
    redundant form).  Multiplication by a FIXED power of r is linear
    over Z, so chunk_i * r^k is a matrix-vector product whose matrix
    columns are limbs(2^(9*li) * r^k mod p) — all entries < 2^9;
  * each level folds 32 rows: X [T, 32*15] @ W [32*15, 15].  Operands
    split into two int8 digits (lo 7 bits / hi 2 bits), so the fold is
    FOUR int8 MXU matmuls with exact int32 accumulation
    (bound: 480 * 127 * 127 + cross terms < 2^28 — no overflow);
  * between levels the redundant limbs renormalize to 9 bits with the
    2^135 = 160 (mod p) wraparound — a short vectorized carry chain;
  * level bases r, r^32, r^1024, r^32768, r^(32^4) collapse up to 32^5
    chunks (512 MiB) to one row; the final canonical reduction happens
    host-side on 15 small ints.

The fold convention matches modes/poly1305.py (micro_aes.c:1976-1986):
F = sum_i c_i * r^(N-i) over chunks c_0..c_{N-1}, each c = chunk||0x01
little-endian.  Zero chunks contribute nothing and exponents count from
the end, so fronts pad freely to 32-row boundaries — exactly the GHASH
tiling trick.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

P1305 = (1 << 130) - 5
LIMBS = 15          # 9-bit limbs: 135 bits of redundant headroom
LIMB_BITS = 9
LIMB_MASK = (1 << LIMB_BITS) - 1
FAN = 32            # rows folded per level
LEVELS = 5          # bases r^(32^k), k = 0..4 -> up to 32^5 chunks
WRAP135 = 160       # 2^135 mod p  (2^130 = 5 -> 2^135 = 32*5)


def _to_limbs(x: int) -> list[int]:
    return [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(LIMBS)]


@functools.lru_cache(maxsize=256)
def poly_power_tables(r: int):
    """Per-r precompute: LEVELS pairs (Wlo, Whi) of int8 digit matrices
    [FAN*LIMBS, LIMBS].  Level 0 (chunks) uses exponents base^(32-j),
    j = 0..31; levels >= 1 use base^(31-j) (identity included), matching
    the ghash_bulk level structure."""
    tables = []
    base = r % P1305
    for level in range(LEVELS):
        w = np.zeros((FAN * LIMBS, LIMBS), np.int32)
        for j in range(FAN):
            e = (FAN - j) if level == 0 else (FAN - 1 - j)
            g = pow(base, e, P1305)
            for li in range(LIMBS):
                prod = ((1 << (LIMB_BITS * li)) * g) % P1305
                w[j * LIMBS + li] = _to_limbs(prod)
        tables.append((jnp.asarray((w & 127).astype(np.int8)),
                       jnp.asarray((w >> 7).astype(np.int8))))
        base = pow(base, FAN, P1305)
    return tuple(tables)


def _digit_matmul(xlo, xhi, wlo, whi):
    """Exact int32 product of digit-split operands: four int8 matmuls."""
    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    return (mm(xlo, wlo) + 128 * (mm(xhi, wlo) + mm(xlo, whi))
            + 16384 * mm(xhi, whi))


def _normalize(y):
    """Redundant [T, LIMBS] int32 -> 9-bit limbs, same value mod p.
    Two full carry chains with the 2^135 wraparound, then a final short
    wrap (bounds: level outputs < 2^28 per limb; after pass 1 the
    overflow carry < 2^19, after pass 2 it is 0 or 1)."""
    for _ in range(2):
        c = jnp.zeros_like(y[:, 0])
        cols = []
        for k in range(LIMBS):
            t = y[:, k] + c
            cols.append(t & LIMB_MASK)
            c = t >> LIMB_BITS
        y = jnp.stack(cols, axis=1)
        y = y.at[:, 0].add(c * WRAP135)
    # after two passes only limb 0 can exceed 9 bits, by < 2^14: one
    # short ripple is enough (it cannot overflow limb 1's headroom)
    c = y[:, 0] >> LIMB_BITS
    y = y.at[:, 0].set(y[:, 0] & LIMB_MASK)
    y = y.at[:, 1].add(c)
    return y


def _digits(x):
    """[T, K] int32 9-bit limbs -> (lo, hi) int8 digit planes [T, K]."""
    return (x & 127).astype(jnp.int8), (x >> 7).astype(jnp.int8)


def _fold_levels(rows, tables, first_level: int = 1):
    """Fold normalized limb rows [T, LIMBS] down to one row using the
    level tables starting at `first_level` (level 0 is the chunk level
    applied by the caller)."""
    level = first_level
    while rows.shape[0] > 1:
        assert level < LEVELS, "message too long for the level tables"
        pad = (-rows.shape[0]) % FAN
        if pad:
            rows = jnp.concatenate(
                [jnp.zeros((pad, LIMBS), rows.dtype), rows], axis=0)
        xlo, xhi = _digits(rows)
        t2 = rows.shape[0] // FAN
        y = _digit_matmul(xlo.reshape(t2, FAN * LIMBS),
                          xhi.reshape(t2, FAN * LIMBS),
                          tables[level][0], tables[level][1])
        rows = _normalize(y)
        level += 1
    return rows[0]


def chunk_limbs_from_words(words, pad_mask):
    """LE words uint32[4, N] (word k of chunk n at [k, n]) -> normalized
    limb rows int32[N, LIMBS] of c_n = chunk || pad, where pad_mask[n]
    (0/1 int32) adds the 2^128 pad bit (bit 2 of limb 14) for the chunks
    it marks.  All shifts are vectorized over the chunk axis."""
    w = [words[k].astype(jnp.uint32) for k in range(4)]
    cols = []
    for li in range(LIMBS):
        bit0 = LIMB_BITS * li
        k0, s = bit0 // 32, bit0 % 32
        if k0 >= 4:
            v = jnp.zeros_like(w[0])
        else:
            v = w[k0] >> s
            if s > 32 - LIMB_BITS and k0 + 1 < 4:
                v = v | (w[k0 + 1] << (32 - s))
        cols.append((v & LIMB_MASK).astype(jnp.int32))
    limbs = jnp.stack(cols, axis=1)  # [N, 15]
    return limbs.at[:, 14].add(pad_mask.astype(jnp.int32) << 2)


@functools.partial(jax.jit, static_argnames=())
def poly_fold_jnp(tables, words, pad_mask):
    """Device fold F = sum_i c_i r^(N-i) over N chunks given as LE words
    uint32[4, N] (N a multiple of 32; front-pad with zero words and
    pad_mask zeros).  Returns the normalized limb row int32[LIMBS]."""
    limbs = chunk_limbs_from_words(words, pad_mask)  # [N, 15]
    n = limbs.shape[0]
    xlo, xhi = _digits(limbs)
    t = n // FAN
    y = _digit_matmul(xlo.reshape(t, FAN * LIMBS),
                      xhi.reshape(t, FAN * LIMBS),
                      tables[0][0], tables[0][1])
    return _fold_levels(_normalize(y), tables)


def limbs_to_int(limbs) -> int:
    """Host: normalized limb row -> canonical integer mod p."""
    v = 0
    for i, x in enumerate(np.asarray(limbs).tolist()):
        v += int(x) << (LIMB_BITS * i)
    return v % P1305
