"""Pallas TPU chain kernels: CBC/CFB encrypt + OFB keystream with the
loop-carried block dependency INSIDE the kernel.

The XLA scan form of the lane-packed chain engines (modes/_scan.
*_scan_packed) round-trips the carry and per-step planes through HBM on
every block step — each step is a tiny dispatch and the chip idles
between them.  Here the serial loop runs inside the kernel: the carry
planes stay in VMEM across all steps of a segment, so HBM traffic is
one read of the input planes + one write of the outputs per segment.

Layout is the lane-packed multikey form (32 messages per uint32 word,
per-lane round keys from core.bitslice.key_planes_packed): within one
message the chain is strictly serial (SURVEY §3.2), across messages the
word lanes carry the parallelism.

Parity: CBC chain micro_aes.c:712-717, CFB c:799-817 (mode=1), OFB
c:872-876.  Bit-equality with the scan twins is pinned by
tests/test_chain_bulk.py (interpret mode off-TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from ..core.bitslice import sbox_planes
from .pallas_seal import _RM, _mix_columns_rm, _shift_rows_rm

# steps per kernel segment: x/y segments are [SEG*128, 128] u32 (4 MB
# each) + ~1 MB of key planes — inside the ~16 MB VMEM budget.  Tile
# width stays 128: wider tiles measured NO gain (2.42 vs 2.61 GB/s at
# 512 — the serial chain is bound by in-kernel instruction issue, not
# op width) and at W=2048 XLA places the full outputs in scoped VMEM
# and OOMs.
CHAIN_SEG = 64


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


# The kernels run entirely in the seal kernel's ROW-MAJOR row layout
# (rm = 4*row + col): ShiftRows is three 4-row group rolls and
# MixColumns' row selections are full 16-row rolls, replacing the 8
# general 16-row gathers per plane per round of the position layout.
# All pos<->rm conversion happens OUTSIDE the kernel as one XLA row
# gather over the whole stream, so the per-step loop has zero permutes.
# Measured A/B on v5e (4096 msgs x 4 KiB CBC): 2.56 -> 2.57 GB/s — flat,
# unlike the parallel seal kernel where this layout bought ~45%.  Two
# more levers also measured flat here (2-way ILP half-tile interleave
# +2%; tile 512 no gain), so the serial chain's bound is neither row
# permutes, dependency latency, nor op width — the remaining suspect is
# in-loop register pressure from the 8-plane circuit's live set.  The
# layout is kept for parity with pallas_seal, not for speed.
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


def _chain_kernel(kind: str, rounds: int, nsteps: int, kpw_ref, c_ref,
                  x_ref, y_ref, co_ref):
    def body(i, carry):
        x = x_ref[pl.ds(i * 128, 128), :]
        xp = [x[b * 16:(b + 1) * 16, :] for b in range(8)]
        if kind == "cbc":      # y = E(carry ^ x); carry = y   (c:712-717)
            out = _cipher_lanekeys(
                rounds, kpw_ref, [carry[b] ^ xp[b] for b in range(8)])
        elif kind == "cfb":    # y = E(carry) ^ x; carry = y   (c:808-814)
            ks = _cipher_lanekeys(rounds, kpw_ref, list(carry))
            out = [ks[b] ^ xp[b] for b in range(8)]
        else:                  # ofb: y = E(carry); carry = y  (c:872-876)
            out = _cipher_lanekeys(rounds, kpw_ref, list(carry))
        y_ref[pl.ds(i * 128, 128), :] = jnp.concatenate(out, axis=0)
        return tuple(out)

    carry0 = tuple(c_ref[b * 16:(b + 1) * 16, :] for b in range(8))
    carry = jax.lax.fori_loop(0, nsteps, body, carry0)
    co_ref[:] = jnp.concatenate(list(carry), axis=0)


def _chain_seg(kind: str, rounds: int, nsteps: int, tile: int,
               kpw2, c2, x2):
    w = x2.shape[-1]
    return pl.pallas_call(
        functools.partial(_chain_kernel, kind, rounds, nsteps),
        interpret=_interpret(),
        out_shape=(
            jax.ShapeDtypeStruct((nsteps * 128, w), jnp.uint32),
            jax.ShapeDtypeStruct((128, w), jnp.uint32),
        ),
        grid=(w // tile,),
        in_specs=[
            pl.BlockSpec((kpw2.shape[0], tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsteps * 128, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nsteps * 128, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
    )(kpw2, c2, x2)


@functools.partial(jax.jit, static_argnames=("kind",))
def chain_fused(kind: str, kpw, carry0, x):
    """kpw uint32[R+1,8,16,W] (key_planes_packed), carry0 uint32[8,16,W],
    x uint32[nb,8,16,W] -> (y uint32[nb,8,16,W], carry uint32[8,16,W]).
    Each grid tile's 32-message lanes are independent chains; segments
    of CHAIN_SEG steps bound VMEM, with the carry threaded between
    segment calls (W*512 B — ~3% of a segment's data)."""
    nb, _, _, w = x.shape
    rounds = kpw.shape[0] - 1
    tile = _tile_for(w)
    seg = CHAIN_SEG
    kpw2 = _to_rm(kpw.reshape(-1, w))
    c2 = _to_rm(carry0.reshape(128, w))
    x2 = _to_rm(x.reshape(nb * 128, w))
    ys = []
    i = 0
    while i < nb:
        nsteps = min(seg, nb - i)
        y, c2 = _chain_seg(kind, rounds, nsteps, tile, kpw2, c2,
                           jax.lax.slice(x2, (i * 128, 0),
                                         ((i + nsteps) * 128, w)))
        ys.append(y)
        i += nsteps
    out = jnp.concatenate(ys, axis=0) if len(ys) > 1 else ys[0]
    return (_to_rm(out).reshape(nb, 8, 16, w),
            _to_rm(c2).reshape(8, 16, w))


def _ofb_kernel(rounds: int, nsteps: int, kpw_ref, c_ref, y_ref, co_ref):
    """OFB keystream (y = E(carry); carry = y, micro_aes.c:872-876):
    no data operand at all — the x input the general chain kernel DMAs
    per segment would be pure wasted HBM traffic here."""
    def body(i, carry):
        out = _cipher_lanekeys(rounds, kpw_ref, list(carry))
        y_ref[pl.ds(i * 128, 128), :] = jnp.concatenate(out, axis=0)
        return tuple(out)

    carry0 = tuple(c_ref[b * 16:(b + 1) * 16, :] for b in range(8))
    carry = jax.lax.fori_loop(0, nsteps, body, carry0)
    co_ref[:] = jnp.concatenate(list(carry), axis=0)


def _ofb_seg(rounds: int, nsteps: int, tile: int, kpw2, c2):
    w = c2.shape[-1]
    return pl.pallas_call(
        functools.partial(_ofb_kernel, rounds, nsteps),
        interpret=_interpret(),
        out_shape=(
            jax.ShapeDtypeStruct((nsteps * 128, w), jnp.uint32),
            jax.ShapeDtypeStruct((128, w), jnp.uint32),
        ),
        grid=(w // tile,),
        in_specs=[
            pl.BlockSpec((kpw2.shape[0], tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nsteps * 128, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
    )(kpw2, c2)


@functools.partial(jax.jit, static_argnames=("nb",))
def ofb_packed_fused(kpw, ivs, nb: int):
    """Lane-packed OFB keystreams, VMEM-resident: ivs uint8[B,16],
    B % 32 == 0 -> uint8[B,nb,16] of keystream blocks (no data operand;
    callers xor host-side or on device)."""
    from ..core.bitslice import pack_planes, unpack_planes

    b = ivs.shape[0]
    w = b // 32
    rounds = kpw.shape[0] - 1
    tile = _tile_for(w)
    kpw2 = _to_rm(kpw.reshape(-1, w))
    c2 = _to_rm(pack_planes(ivs).reshape(128, w))
    ys = []
    i = 0
    while i < nb:
        nsteps = min(CHAIN_SEG, nb - i)
        y, c2 = _ofb_seg(rounds, nsteps, tile, kpw2, c2)
        ys.append(y)
        i += nsteps
    out = jnp.concatenate(ys, axis=0) if len(ys) > 1 else ys[0]
    return jax.vmap(lambda p: unpack_planes(p, b), out_axes=1)(
        _to_rm(out).reshape(nb, 8, 16, w))


def _cbcmac_kernel(rounds: int, nsteps: int, kpw_ref, c_ref, x_ref,
                   m_ref, co_ref):
    """Masked CBC-MAC fold (xMac with mix = cipher, micro_aes.c:551-571):
    a CBC chain that keeps only the final carry; steps at or beyond a
    lane's nvalid keep its accumulator (mask bit j of m_ref[i, w] =
    step i valid for the message in lane j of word w)."""
    def body(i, carry):
        x = x_ref[pl.ds(i * 128, 128), :]
        m2 = _cipher_lanekeys(
            rounds, kpw_ref,
            [carry[b] ^ x[b * 16:(b + 1) * 16, :] for b in range(8)])
        mask = m_ref[pl.ds(i, 1), :]  # [1, TILE], broadcasts over rows
        return tuple(carry[b] ^ (mask & (m2[b] ^ carry[b]))
                     for b in range(8))

    carry0 = tuple(c_ref[b * 16:(b + 1) * 16, :] for b in range(8))
    carry = jax.lax.fori_loop(0, nsteps, body, carry0)
    co_ref[:] = jnp.concatenate(list(carry), axis=0)


def _cbcmac_seg(rounds: int, nsteps: int, tile: int, kpw2, c2, x2, m2):
    w = x2.shape[-1]
    return pl.pallas_call(
        functools.partial(_cbcmac_kernel, rounds, nsteps),
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((128, w), jnp.uint32),
        grid=(w // tile,),
        in_specs=[
            pl.BlockSpec((kpw2.shape[0], tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsteps * 128, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsteps, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((128, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(kpw2, c2, x2, m2)


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
    x2 = _to_rm(
        jax.vmap(pack_planes, in_axes=1)(blocks).reshape(nb * 128, w))
    lanes = nvalid.astype(jnp.int32).reshape(w, 32)
    steps = jnp.arange(nb, dtype=jnp.int32)
    bits = (steps[:, None, None] < lanes[None, :, :]).astype(jnp.uint32)
    masks = jnp.sum(bits << jnp.arange(32, dtype=jnp.uint32)[None, None, :],
                    axis=-1, dtype=jnp.uint32)  # [nb, W]
    i = 0
    while i < nb:
        nsteps = min(CHAIN_SEG, nb - i)
        c2 = _cbcmac_seg(rounds, nsteps, tile, kpw2, c2,
                         jax.lax.slice(x2, (i * 128, 0),
                                       ((i + nsteps) * 128, w)),
                         jax.lax.slice(masks, (i, 0), (i + nsteps, w)))
        i += nsteps
    return unpack_planes(_to_rm(c2).reshape(8, 16, w), b)


@functools.partial(jax.jit, static_argnames=("kind",))
def chain_packed_fused(kind: str, kpw, ivs, blocks):
    """uint8-level wrapper matching the modes/_scan.*_scan_packed
    contract: ivs uint8[B,16], blocks uint8[B,nb,16] (contents ignored
    for OFB), B % 32 == 0 -> uint8[B,nb,16]."""
    from ..core.bitslice import pack_planes, unpack_planes

    b = ivs.shape[0]
    x = jax.vmap(pack_planes, in_axes=1)(blocks)
    y, _ = chain_fused(kind, kpw, pack_planes(ivs), x)
    return jax.vmap(lambda p: unpack_planes(p, b), out_axes=1)(y)
