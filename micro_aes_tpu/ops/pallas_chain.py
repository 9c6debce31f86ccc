"""Pallas TPU chain kernels: CBC/CFB encrypt + OFB keystream + masked
CBC-MAC with the loop-carried block dependency INSIDE the kernel.

The XLA scan form of the lane-packed chain engines (modes/_scan.
*_scan_packed) round-trips the carry and per-step planes through HBM on
every block step — each step is a tiny dispatch and the chip idles
between them.  Here the serial loop is the PALLAS GRID: one grid step
per chain block, with the carry planes held in a VMEM scratch buffer
that persists across the (sequential) grid iterations, and the per-step
input/output blocks pipelined automatically by Pallas.

Two structural choices matter enormously (round-3 A/B on v5e, 4096 msgs
x 4 KiB AES-256-CBC, marginal rates; the old forms are in git history):

1. Grid-over-steps vs in-kernel fori_loop.  The first in-kernel form ran
   the chain as a `fori_loop` over dynamic `pl.ds` slices of whole-
   segment refs; Mosaic generated ~20x slower code for that body than
   for the identical circuit as a straight-line grid-step kernel
   (2.58 -> 51.6 GB/s kernel-level, with a no-carry control at 50.7 —
   the serial dependency itself costs nothing).

2. In-kernel byte<->plane butterflies vs XLA pack_planes around the
   kernel.  Bitslicing the data stream with core.bitslice.pack_planes /
   unpack_planes OUTSIDE the kernel capped the end-to-end rate at
   ~2.6 GB/s no matter how fast the kernel got; the kernels therefore
   take the data as LITTLE-ENDIAN WORD STREAMS (u32[nb, 128, W], row
   4j+k = word k of the lane-j message block — the seal kernels' stream
   layout) and run the 32x32 bit-transpose butterflies in VMEM, exactly
   like ops/pallas_seal._xor_stream.  The only XLA-side work per call is
   a bitcast + transpose of whole u32 words.

Layout is the lane-packed multikey form (32 messages per uint32 word,
per-lane round keys from core.bitslice.key_planes_packed): within one
message the chain is strictly serial (SURVEY §3.2), across messages the
word lanes carry the parallelism.  The cipher runs in the seal kernel's
row-major row layout (rm = 4*row + col).

Parity: CBC chain micro_aes.c:712-717, CFB c:799-817 (mode=1), OFB
c:872-876, xMac fold c:551-571.  Bit-equality with the scan twins is
pinned by tests/test_chain_bulk.py (interpret mode off-TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from ..core.bitslice import sbox_planes
from .pallas_seal import (
    _RM,
    _blocks_to_rm_planes,
    _mix_columns_rm,
    _rm_planes_to_stream,
    _shift_rows_rm,
)

# The carry scratch is only correct if the grid executes sequentially in
# row-major order; pin that explicitly rather than relying on Mosaic's
# default (megacore partitioning must not split the step axis).
_SEQ2 = pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary"))


def _tile_for(w: int) -> int:
    return 128 if w % 128 == 0 else w


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kpw_slice(kpw_ref, r: int, b: int):
    """Static [16, TILE] slice of the [(R+1)*128, TILE] per-lane key
    planes (unlike pallas_cipher._key_slice these are full-width: each
    lane bit carries its own message's key)."""
    base = r * 128 + b * 16
    return kpw_ref[base: base + 16, :]


_RM_ROWS = np.arange(8)[:, None] * 16 + _RM[None, :]  # [8,16] plane rows


def _to_rm(planes2):
    """Row-gather a [N*128, W] stacked-plane array pos->rm (involution:
    the same gather maps rm->pos)."""
    n = planes2.shape[0] // 128
    idx = (np.arange(n)[:, None, None] * 128 + _RM_ROWS[None]).reshape(-1)
    return planes2[idx]


def _cipher_lanekeys(rounds: int, kpw_ref, p):
    """Bitsliced encrypt of 8 [16, TILE] rm-layout planes with per-lane
    keys (kpw rows pre-permuted to rm by the host wrappers)."""
    p = [p[b] ^ _kpw_slice(kpw_ref, 0, b) for b in range(8)]
    for r in range(1, rounds + 1):
        p = sbox_planes(p, True)
        p = [_shift_rows_rm(x) for x in p]
        if r != rounds:
            p = _mix_columns_rm(p)
        p = [p[b] ^ _kpw_slice(kpw_ref, r, b) for b in range(8)]
    return p


def _to_wordstream(blocks):
    """uint8[B, nb, 16] -> u32[nb, 128, W] stream tiles (row 4j+k = LE
    word k of the block of message 32w+j — matching the lane order of
    core.bitslice.key_planes_packed).  Pure u32 data movement; the bit
    transposes happen in-kernel."""
    b, nb, _ = blocks.shape
    w = b // 32
    words = jax.lax.bitcast_convert_type(
        blocks.reshape(b, nb, 4, 4), jnp.uint32)  # [B, nb, 4] LE words
    return words.reshape(w, 32, nb, 4).transpose(2, 1, 3, 0).reshape(
        nb, 128, w)


def _from_wordstream(stream):
    """u32[nb, 128, W] -> uint8[B, nb, 16] (inverse of _to_wordstream)."""
    nb, _, w = stream.shape
    y = stream.reshape(nb, 32, 4, w).transpose(3, 1, 0, 2)  # [W,32,nb,4]
    y8 = jax.lax.bitcast_convert_type(
        y.reshape(w * 32, nb, 4), jnp.uint8)  # [B, nb, 4, 4]
    return y8.reshape(w * 32, nb, 16)


def _chain_kernel(kind: str, rounds: int, kpw_ref, c_ref,
                  x_ref, y_ref, carry_ref):
    """One grid step = one chain block.  carry_ref (VMEM scratch, rm
    plane rows) persists across the sequential grid; grid dim 0 walks
    word tiles, dim 1 walks chain steps, so each tile's steps run
    consecutively."""
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        carry_ref[:] = c_ref[:]

    cf = carry_ref[:]
    carry = [cf[b * 16:(b + 1) * 16, :] for b in range(8)]
    x128 = x_ref[0]
    if kind == "cbc":      # y = E(carry ^ x); carry = y   (c:712-717)
        xp = _blocks_to_rm_planes(x128)
        out = _cipher_lanekeys(
            rounds, kpw_ref, [carry[b] ^ xp[b] for b in range(8)])
    elif kind == "cfb":    # y = E(carry) ^ x; carry = y   (c:808-814)
        ks = _cipher_lanekeys(rounds, kpw_ref, carry)
        xp = _blocks_to_rm_planes(x128)
        out = [ks[b] ^ xp[b] for b in range(8)]
    else:                  # ofb: y = E(carry); carry = y  (c:872-876)
        out = _cipher_lanekeys(rounds, kpw_ref, carry)
    y_ref[0] = _rm_planes_to_stream(out)
    carry_ref[:] = jnp.concatenate(out, axis=0)


@functools.partial(jax.jit, static_argnames=("kind",))
def chain_packed_fused(kind: str, kpw, ivs, blocks):
    """Lane-packed serial chains over B independent messages, matching
    the modes/_scan.*_scan_packed contract: kpw uint32[R+1,8,16,W]
    (key_planes_packed), ivs uint8[B,16], blocks uint8[B,nb,16]
    (contents ignored for OFB), B % 32 == 0 -> uint8[B,nb,16]."""
    from ..core.bitslice import pack_planes

    b, nb = blocks.shape[0], blocks.shape[1]
    w = b // 32
    rounds = kpw.shape[0] - 1
    tile = _tile_for(w)
    kpw2 = _to_rm(kpw.reshape(-1, w))
    c2 = _to_rm(pack_planes(ivs).reshape(128, w))
    x = _to_wordstream(blocks)
    y = pl.pallas_call(
        functools.partial(_chain_kernel, kind, rounds),
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((nb, 128, w), jnp.uint32),
        grid=(w // tile, nb),
        in_specs=[
            pl.BlockSpec((kpw2.shape[0], tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, tile), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, tile), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((128, tile), jnp.uint32)],
        compiler_params=_SEQ2,
    )(kpw2, c2, x)
    return _from_wordstream(y)


def _ofb_kernel(rounds: int, kpw_ref, c_ref, y_ref, carry_ref):
    """OFB keystream (y = E(carry); carry = y, micro_aes.c:872-876):
    no data operand at all — a data input would be pure wasted HBM
    traffic here."""
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        carry_ref[:] = c_ref[:]

    cf = carry_ref[:]
    out = _cipher_lanekeys(
        rounds, kpw_ref, [cf[b * 16:(b + 1) * 16, :] for b in range(8)])
    y_ref[0] = _rm_planes_to_stream(out)
    carry_ref[:] = jnp.concatenate(out, axis=0)


@functools.partial(jax.jit, static_argnames=("nb",))
def ofb_packed_fused(kpw, ivs, nb: int):
    """Lane-packed OFB keystreams, VMEM-resident: ivs uint8[B,16],
    B % 32 == 0 -> uint8[B,nb,16] of keystream blocks (no data operand;
    callers xor host-side or on device)."""
    from ..core.bitslice import pack_planes

    b = ivs.shape[0]
    w = b // 32
    rounds = kpw.shape[0] - 1
    tile = _tile_for(w)
    kpw2 = _to_rm(kpw.reshape(-1, w))
    c2 = _to_rm(pack_planes(ivs).reshape(128, w))
    y = pl.pallas_call(
        functools.partial(_ofb_kernel, rounds),
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((nb, 128, w), jnp.uint32),
        grid=(w // tile, nb),
        in_specs=[
            pl.BlockSpec((kpw2.shape[0], tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, tile), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((128, tile), jnp.uint32)],
        compiler_params=_SEQ2,
    )(kpw2, c2)
    return _from_wordstream(y)


def _cbcmac_kernel(rounds: int, nsteps: int, kpw_ref, c_ref, x_ref,
                   m_ref, co_ref, carry_ref):
    """Masked CBC-MAC fold (xMac with mix = cipher, micro_aes.c:551-571):
    a CBC chain that keeps only the final carry; steps at or beyond a
    lane's nvalid keep its accumulator (mask bit j of m_ref[i, w] =
    step i valid for the message in lane j of word w)."""
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        carry_ref[:] = c_ref[:]

    cf = carry_ref[:]
    carry = [cf[b * 16:(b + 1) * 16, :] for b in range(8)]
    xp = _blocks_to_rm_planes(x_ref[0])
    m2 = _cipher_lanekeys(
        rounds, kpw_ref, [carry[b] ^ xp[b] for b in range(8)])
    mask = m_ref[pl.ds(step, 1), :]  # [1, TILE], broadcasts over rows
    carry_ref[:] = jnp.concatenate(
        [carry[b] ^ (mask & (m2[b] ^ carry[b])) for b in range(8)], axis=0)

    @pl.when(step == nsteps - 1)
    def _():
        co_ref[:] = carry_ref[:]


@jax.jit
def cbcmac_packed_fused(kpw, init, blocks, nvalid):
    """Lane-packed masked CBC-MAC over B independent messages, the
    VMEM-resident Pallas form of ops/mac.cbcmac_fold_batch:
    kpw uint32[R+1,8,16,W] (key_planes_packed), init uint8[B,16],
    blocks uint8[B,nb,16], nvalid int32[B]; B % 32 == 0.
    Returns uint8[B,16]."""
    from ..core.bitslice import pack_planes, unpack_planes

    b, nb = blocks.shape[0], blocks.shape[1]
    w = b // 32
    rounds = kpw.shape[0] - 1
    tile = _tile_for(w)
    kpw2 = _to_rm(kpw.reshape(-1, w))
    c2 = _to_rm(pack_planes(init).reshape(128, w))
    x = _to_wordstream(blocks)
    lanes = nvalid.astype(jnp.int32).reshape(w, 32)
    steps = jnp.arange(nb, dtype=jnp.int32)
    bits = (steps[:, None, None] < lanes[None, :, :]).astype(jnp.uint32)
    masks = jnp.sum(bits << jnp.arange(32, dtype=jnp.uint32)[None, None, :],
                    axis=-1, dtype=jnp.uint32)  # [nb, W]
    co = pl.pallas_call(
        functools.partial(_cbcmac_kernel, rounds, nb),
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((128, w), jnp.uint32),
        grid=(w // tile, nb),
        in_specs=[
            pl.BlockSpec((kpw2.shape[0], tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, tile), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            # whole mask resident per tile (nb x tile x 4 B), row-sliced
            # by program_id in-kernel: a (1, tile) per-step block violates
            # the TPU block-shape divisibility rule for nb not % 8
            pl.BlockSpec((masks.shape[0], tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((128, tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((128, tile), jnp.uint32)],
        compiler_params=_SEQ2,
    )(kpw2, c2, x, masks)
    return unpack_planes(_to_rm(co).reshape(8, 16, w), b)
