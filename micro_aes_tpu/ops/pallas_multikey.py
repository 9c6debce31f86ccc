"""Multi-key fused cipher: one dispatch, B independent keys.

The single-key stream kernels broadcast one key's bit-planes over every
lane; serving workloads (per-connection / per-tenant keys) instead have
B messages under B different keys.  The grid maps one (or more) steps
per MESSAGE and the key-plane BlockSpec follows the message index, so
each grid step runs the standard bitsliced rounds with its own key —
zero per-key dispatch cost.  Cites: the reference is strictly
single-key-per-call (micro_aes.c:1164); this engine is the batch-axis
parallelism the survey's §2.6 mandates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_seal import (
    SEAL_TILE_W,
    _ctrw_math,
    _interpret,
    _kp_rm,
    ctrw_fused_jnp,
)


def mk_window_words(nblocks: int) -> int:
    """Per-message window width (u32[*,128] rows of 32 blocks) the
    multikey kernel's grid contract requires: ceil(nblocks/32) padded to
    a multiple of 8 (the u32 sublane tile).  THE single definition —
    bulk.py and seal_batch.py must agree with the kernel.  Round 4:
    windows above SEAL_TILE_W used to round up to a full tile multiple,
    which padded a 513-row window (256 KB message) to 1024 rows — ~50%
    wasted cipher work on exactly the serving shape the engine exists
    for; the kernel now picks a divisor tile instead (mk_tile)."""
    wm = -(-nblocks // 32)
    wm += (-wm) % 8
    # Tile floor (ADVICE r4): an unlucky wm (e.g. 536 = 8*67) has no
    # multiple-of-8 divisor above 8, degrading the grid to tiny steps.
    # Pad minimally until a tile >= 64 divides the window — bounded by
    # the next multiple of 64, so at most 56 padded rows.
    while wm >= 64 and mk_tile(wm) < 64:
        wm += 8
    return wm


def mk_tile(wm: int) -> int:
    """Largest row-tile that divides the window, is a multiple of 8, and
    fits the Pallas tile budget."""
    best = 8
    for t in range(8, min(wm, SEAL_TILE_W) + 1, 8):
        if wm % t == 0:
            best = t
    return best


def _mk_kernel(rounds: int, decrypt: bool, kp_ref, ctrw_ref, ptw_ref,
               ctw_ref):
    ctw_ref[:] = jnp.transpose(_ctrw_math(
        rounds, kp_ref, jnp.transpose(ctrw_ref[:]),
        jnp.transpose(ptw_ref[:]), decrypt))


@functools.partial(jax.jit, static_argnames=("b", "decrypt"))
def ctrw_fused_multikey(kp_stack, ctr_words, pt_words, b: int,
                        decrypt: bool = False):
    """Cipher-and-xor over B messages with per-message keys in ONE
    dispatch: kp_stack uint32[B*(R+1)*128, 1] (B stacked rm-ready key
    plane columns — use mk_key_stack), ctr_words/pt_words
    uint32[B*Wm, 128] (Wm words per message, a multiple of 8; messages
    concatenated).  Grid = (B, Wm/tile): the key block follows the
    message index."""
    n = kp_stack.shape[0] // b
    rounds = n // 128 - 1
    w_total = pt_words.shape[0]
    wm = w_total // b
    tile = mk_tile(wm)
    tiles_per_msg = wm // tile
    return pl.pallas_call(
        functools.partial(_mk_kernel, rounds, decrypt),
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((w_total, 128), jnp.uint32),
        grid=(b, tiles_per_msg),
        in_specs=[
            pl.BlockSpec((n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 128),
                         lambda i, j, t=tiles_per_msg: (i * t + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 128),
                         lambda i, j, t=tiles_per_msg: (i * t + j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 128),
                               lambda i, j, t=tiles_per_msg: (i * t + j, 0),
                               memory_space=pltpu.VMEM),
            input_output_aliases={2: 0},
    )(_kp_rm(kp_stack), ctr_words, pt_words)


@functools.partial(jax.jit, static_argnames=("b", "decrypt"))
def ctrw_fused_multikey_jnp(kp_stack, ctr_words, pt_words, b: int,
                            decrypt: bool = False):
    """jnp twin: vmap the single-key twin over the message axis."""
    n = kp_stack.shape[0] // b
    wm = pt_words.shape[0] // b
    return jax.vmap(
        lambda kp, cw, pw: ctrw_fused_jnp(kp, cw, pw, decrypt=decrypt)
    )(kp_stack.reshape(b, n, 1), ctr_words.reshape(b, wm, 128),
      pt_words.reshape(b, wm, 128)).reshape(b * wm, 128)


def ctrw_fused_multikey_auto(kp_stack, ctr_words, pt_words, b: int,
                             decrypt: bool = False):
    fn = (ctrw_fused_multikey if jax.default_backend() == "tpu"
          else ctrw_fused_multikey_jnp)
    return fn(kp_stack, ctr_words, pt_words, b, decrypt=decrypt)


def mk_key_stack(kps) -> jnp.ndarray:
    """Stack per-message key planes (uint32[R+1, 8, 16] each, from
    core.bitslice.key_planes) into one uint32[B*(R+1)*128, 1] column
    (the rm permutation is applied inside the kernel wrapper; _kp_rm's
    per-128-row formula handles the stacked layout unchanged)."""
    return jnp.concatenate([kp.reshape(-1, 1) for kp in kps], axis=0)
