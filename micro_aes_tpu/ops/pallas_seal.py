"""Fused Pallas seal kernel: counter planes -> AES rounds -> keystream xor
-> ciphertext words + GHASH bit rows, in ONE VMEM-resident pass.

Everything between "plaintext words in HBM" and "ciphertext words + int8
bit rows in HBM" happens inside the kernel; the only other device work in
the seal is the byte<->word relayout at the stream boundary and the GHASH
matmuls (ops/ghash_bulk) on the MXU.

Word layout is j-major: uint32[4, 32, W] where element [k, j, w] is word
k of block 32w + j.  This keeps every in-kernel structure a row of W
lanes — butterflies, counter broadcasts and bit emission all avoid
transposes entirely.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.bitslice import sbox_planes
from .pallas_cipher import _key_slice, _mix_columns, _permute_rows
from ..core.cipher import SHIFT_PERM
from ..ops.counter import _LOW_BIT_PATTERNS

SEAL_TILE_W = 256


def _butterfly_rows(rows):
    """LSB-first 32x32 bit transpose on 32 row vectors (shared with
    core/bitslice._transpose32; duplicated here to stay jnp-only)."""
    a = list(rows)
    j = 16
    m = np.uint32(0x0000FFFF)
    while j:
        k = 0
        while k < 32:
            t = ((a[k] >> j) ^ a[k + j]) & m
            a[k] = a[k] ^ (t << j)
            a[k + j] = a[k + j] ^ t
            k = (k + j + 1) & ~j
        j >>= 1
        m = m ^ (m << np.uint32(j)) if j else m
    return a


def _seal_kernel(rounds: int, bits_from_input: bool, kp_ref, j0c_ref,
                 lohi_ref, ghm_ref, ptw_ref, ctw_ref, bits_ref):
    tile = lohi_ref.shape[-1]
    lo = lohi_ref[0:1, :]  # [1, TILE]
    hi = lohi_ref[1:2, :]
    ones = jnp.uint32(0xFFFFFFFF)

    # --- counter planes from the aligned-lane structure ---
    p = []
    for b in range(8):
        rows = []
        for pos in range(16):
            if pos <= 8:
                rows.append(j0c_ref[b * 16 + pos: b * 16 + pos + 1, :]
                            | jnp.zeros((1, tile), jnp.uint32))
            elif pos >= 12:
                k = 8 * (15 - pos) + b
                if k < 5:
                    rows.append(jnp.full((1, tile),
                                         np.uint32(_LOW_BIT_PATTERNS[k])))
                else:
                    rows.append(((lo >> k) & 1) * ones)
            else:
                k = 8 * (11 - pos) + b
                rows.append(((hi >> k) & 1) * ones)
        p.append(jnp.concatenate(rows, axis=0))  # [16, TILE]

    # --- AES rounds (identical structure to pallas_cipher) ---
    p = [p[b] ^ _key_slice(kp_ref, 0, b) for b in range(8)]
    for r in range(1, rounds + 1):
        p = sbox_planes(p, True)
        p = [_permute_rows(x, SHIFT_PERM) for x in p]
        if r != rounds:
            p = _mix_columns(p)
        p = [p[b] ^ _key_slice(kp_ref, r, b) for b in range(8)]

    # --- input words -> planes (butterfly), xor keystream, back to words.
    # GHASH bits come from the ciphertext side: the xor OUTPUT when
    # sealing, the INPUT when opening (bits_from_input). ---
    ct_planes = []
    for k in range(4):
        rows = [ptw_ref[k, j: j + 1, :] for j in range(32)]
        tr = _butterfly_rows(rows)  # tr[r] = plane of bit r of word k
        ks = [p[r % 8][4 * k + r // 8: 4 * k + r // 8 + 1, :] for r in range(32)]
        out_bits = [tr[r] ^ ks[r] for r in range(32)]  # each [1, TILE]
        ct_planes.append(tr if bits_from_input else out_bits)
        back = _butterfly_rows(out_bits)
        for j in range(32):
            ctw_ref[k, j: j + 1, :] = back[j]

    # --- GHASH bit rows, int8 [128, 32, TILE]: row q = b*16 + pos
    # (plane order, matching the plane-ordered GHASH tables).  ghm masks
    # out stream positions that aren't message blocks (bit j of word w
    # set == position 32w+j is valid). ---
    ghm = ghm_ref[0:1, :]  # [1, TILE]
    for k in range(4):
        for r in range(32):
            pos, b = 4 * k + r // 8, r % 8
            q = b * 16 + pos
            row = ct_planes[k][r] & ghm  # [1, TILE]
            expanded = jnp.concatenate(
                [((row >> j) & 1) for j in range(32)], axis=0)
            bits_ref[q, :, :] = expanded.astype(jnp.int8)


def _ctr_kernel(rounds: int, kp_ref, j0c_ref, lohi_ref, ptw_ref, ctw_ref):
    """CTR-only variant: no GHASH bit emission (skips the 8x bit-tensor
    traffic).  Reuses _seal_kernel with a throwaway mask/bits surface."""
    tile = lohi_ref.shape[-1]
    lo = lohi_ref[0:1, :]
    hi = lohi_ref[1:2, :]
    ones = jnp.uint32(0xFFFFFFFF)
    p = []
    for b in range(8):
        rows = []
        for pos in range(16):
            if pos <= 8:
                rows.append(j0c_ref[b * 16 + pos: b * 16 + pos + 1, :]
                            | jnp.zeros((1, tile), jnp.uint32))
            elif pos >= 12:
                k = 8 * (15 - pos) + b
                if k < 5:
                    rows.append(jnp.full((1, tile),
                                         np.uint32(_LOW_BIT_PATTERNS[k])))
                else:
                    rows.append(((lo >> k) & 1) * ones)
            else:
                k = 8 * (11 - pos) + b
                rows.append(((hi >> k) & 1) * ones)
        p.append(jnp.concatenate(rows, axis=0))
    p = [p[b] ^ _key_slice(kp_ref, 0, b) for b in range(8)]
    for r in range(1, rounds + 1):
        p = sbox_planes(p, True)
        p = [_permute_rows(x, SHIFT_PERM) for x in p]
        if r != rounds:
            p = _mix_columns(p)
        p = [p[b] ^ _key_slice(kp_ref, r, b) for b in range(8)]
    for k in range(4):
        rows = [ptw_ref[k, j: j + 1, :] for j in range(32)]
        tr = _butterfly_rows(rows)
        ks = [p[r % 8][4 * k + r // 8: 4 * k + r // 8 + 1, :] for r in range(32)]
        back = _butterfly_rows([tr[r] ^ ks[r] for r in range(32)])
        for j in range(32):
            ctw_ref[k, j: j + 1, :] = back[j]


def _ctrw_kernel(rounds: int, kp_ref, ctrw_ref, ptw_ref, ctw_ref):
    """CTR with counter blocks provided as words (any counter convention:
    the caller builds [4,32,W] counter words with plain vector math).
    Butterflies counters into planes in-kernel, runs the rounds, xors."""
    p = [[None] * 16 for _ in range(8)]
    for k in range(4):
        rows = [ctrw_ref[k, j: j + 1, :] for j in range(32)]
        tr = _butterfly_rows(rows)
        for r in range(32):
            p[r % 8][4 * k + r // 8] = tr[r]
    p = [jnp.concatenate(pb, axis=0) for pb in p]
    p = [p[b] ^ _key_slice(kp_ref, 0, b) for b in range(8)]
    for r in range(1, rounds + 1):
        p = sbox_planes(p, True)
        p = [_permute_rows(x, SHIFT_PERM) for x in p]
        if r != rounds:
            p = _mix_columns(p)
        p = [p[b] ^ _key_slice(kp_ref, r, b) for b in range(8)]
    for k in range(4):
        rows = [ptw_ref[k, j: j + 1, :] for j in range(32)]
        tr = _butterfly_rows(rows)
        ks = [p[r % 8][4 * k + r // 8: 4 * k + r // 8 + 1, :] for r in range(32)]
        back = _butterfly_rows([tr[r] ^ ks[r] for r in range(32)])
        for j in range(32):
            ctw_ref[k, j: j + 1, :] = back[j]


@jax.jit
def ctrw_fused(kp_flat, ctr_words, pt_words):
    """Fused CTR with caller-supplied counter words [4,32,W] (LE32
    conventions, preset counters, SIV variants...)."""
    rounds = kp_flat.shape[0] // 128 - 1
    w = ctr_words.shape[-1]
    assert w % SEAL_TILE_W == 0
    return pl.pallas_call(
        functools.partial(_ctrw_kernel, rounds),
        out_shape=jax.ShapeDtypeStruct((4, 32, w), jnp.uint32),
        grid=(w // SEAL_TILE_W,),
        in_specs=[
            pl.BlockSpec((kp_flat.shape[0], 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 32, SEAL_TILE_W), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 32, SEAL_TILE_W), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, 32, SEAL_TILE_W), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
    )(kp_flat, ctr_words, pt_words)


@jax.jit
def ctr_fused(kp_flat, j0_const, lohi, pt_words):
    """Pure-CTR fused kernel (counter + cipher + xor; no GHASH)."""
    rounds = kp_flat.shape[0] // 128 - 1
    w = lohi.shape[-1]
    assert w % SEAL_TILE_W == 0
    return pl.pallas_call(
        functools.partial(_ctr_kernel, rounds),
        out_shape=jax.ShapeDtypeStruct((4, 32, w), jnp.uint32),
        grid=(w // SEAL_TILE_W,),
        in_specs=[
            pl.BlockSpec((kp_flat.shape[0], 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, SEAL_TILE_W), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 32, SEAL_TILE_W), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, 32, SEAL_TILE_W), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
    )(kp_flat, j0_const, lohi, pt_words)


@functools.partial(jax.jit, static_argnames=("bits_from_input",))
def seal_fused(kp_flat, j0_const, lohi, ghmask, pt_words,
               bits_from_input: bool = False):
    """kp_flat uint32[(R+1)*128, 1], j0_const uint32[128,1],
    lohi uint32[2, W], ghmask uint32[1, W], pt_words uint32[4, 32, W]
    -> (out_words uint32[4,32,W], bits int8[128, 32, W]).
    bits_from_input=True gives the GCM *open* direction (input is ct)."""
    rounds = kp_flat.shape[0] // 128 - 1
    w = lohi.shape[-1]
    assert w % SEAL_TILE_W == 0
    grid = (w // SEAL_TILE_W,)
    ctw, bits = pl.pallas_call(
        functools.partial(_seal_kernel, rounds, bits_from_input),
        out_shape=(
            jax.ShapeDtypeStruct((4, 32, w), jnp.uint32),
            jax.ShapeDtypeStruct((128, 32, w), jnp.int8),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kp_flat.shape[0], 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, SEAL_TILE_W), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SEAL_TILE_W), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 32, SEAL_TILE_W), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((4, 32, SEAL_TILE_W), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 32, SEAL_TILE_W), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
    )(kp_flat, j0_const, lohi, ghmask, pt_words)
    return ctw, bits
