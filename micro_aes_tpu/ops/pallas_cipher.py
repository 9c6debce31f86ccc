"""Pallas TPU kernel: bitsliced AES rounds, VMEM-resident.

The jnp bitsliced path (core/bitslice.py) is correct but HBM-bound: XLA
materializes intermediate planes between fusions, amplifying traffic by
~50-100x.  This kernel runs ALL rounds on a [128, TILE_W] plane tile that
never leaves VMEM: per tile the only HBM traffic is one read + one write.

Layout: planes uint32[128, W] with row = 16*bit + byte_pos (i.e. the
[8,16,W] planes of core/bitslice reshaped); key planes uint32[R+1, 128]
of 0/0xFFFFFFFF broadcast words.  The S-box circuit functions are shared
with the jnp path — they are pure plane algebra and trace identically
inside the kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.bitslice import _xtime_planes, sbox_planes
from ..core.cipher import INV_SHIFT_PERM, SHIFT_PERM

TILE_W = 256  # 32 * TILE_W blocks per grid program (128 KiB per buffer)

_ROLL_PERMS = {
    k: np.array([4 * (j // 4) + (j % 4 + k) % 4 for j in range(16)])
    for k in (1, 2, 3)
}


def _permute_rows(x, perm):
    """Static row permutation of [16, W] via slice+concat (Mosaic-safe)."""
    return jnp.concatenate([x[i: i + 1, :] for i in perm], axis=0)


def _mix_columns(p):
    a1 = [_permute_rows(x, _ROLL_PERMS[1]) for x in p]
    a2 = [_permute_rows(x, _ROLL_PERMS[2]) for x in p]
    a3 = [_permute_rows(x, _ROLL_PERMS[3]) for x in p]
    xt = _xtime_planes(p)
    xt1 = _xtime_planes(a1)
    return [xt[b] ^ xt1[b] ^ a1[b] ^ a2[b] ^ a3[b] for b in range(8)]


def _inv_mix_columns(p):
    """InvMixColumns = MixColumns ∘ (column multiply by d(z) = {04}z² +
    {05}), since c(z)·d(z) = c⁻¹(z) mod z⁴+1 — 60 XOR vs 89 direct."""
    x4 = _xtime_planes(_xtime_planes(p))
    pre = [p[b] ^ x4[b] ^ _permute_rows(x4[b], _ROLL_PERMS[2])
           for b in range(8)]
    return _mix_columns(pre)


def _key_slice(kp_ref, r: int, b: int):
    """Static [16,1] slice of the [(R+1)*128, 1] key-plane ref."""
    base = r * 128 + b * 16
    return kp_ref[base: base + 16, :]


def _encrypt_kernel(rounds: int, kp_ref, x_ref, o_ref):
    x = x_ref[:]  # [128, TILE_W]
    p = [x[b * 16:(b + 1) * 16, :] ^ _key_slice(kp_ref, 0, b)
         for b in range(8)]
    for r in range(1, rounds + 1):
        p = sbox_planes(p, True)
        p = [_permute_rows(x, SHIFT_PERM) for x in p]
        if r != rounds:
            p = _mix_columns(p)
        p = [p[b] ^ _key_slice(kp_ref, r, b) for b in range(8)]
    o_ref[:] = jnp.concatenate(p, axis=0)


def _decrypt_kernel(rounds: int, kp_ref, x_ref, o_ref):
    x = x_ref[:]
    p = [x[b * 16:(b + 1) * 16, :] ^ _key_slice(kp_ref, rounds, b)
         for b in range(8)]
    for r in range(rounds - 1, -1, -1):
        p = [_permute_rows(x, INV_SHIFT_PERM) for x in p]
        p = sbox_planes(p, False)
        p = [p[b] ^ _key_slice(kp_ref, r, b) for b in range(8)]
        if r != 0:
            p = _inv_mix_columns(p)
    o_ref[:] = jnp.concatenate(p, axis=0)


@functools.partial(jax.jit, static_argnames=("decrypt",))
def cipher_planes_pallas(kp, planes, decrypt: bool = False):
    """planes uint32[8,16,W] -> uint32[8,16,W]; kp uint32[R+1,8,16].
    W must be a multiple of TILE_W (pad the word axis; extra words are
    garbage-in/garbage-out)."""
    rounds = kp.shape[0] - 1
    w = planes.shape[-1]
    assert w % TILE_W == 0, f"W={w} not a multiple of {TILE_W}"
    x = planes.reshape(128, w)
    kp_flat = kp.reshape((rounds + 1) * 128, 1)
    kernel = functools.partial(
        _decrypt_kernel if decrypt else _encrypt_kernel, rounds)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, w), jnp.uint32),
        grid=(w // TILE_W,),
        in_specs=[
            pl.BlockSpec(((rounds + 1) * 128, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, TILE_W), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((128, TILE_W), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(kp_flat, x)
    return out.reshape(8, 16, w)


def cipher_planes_auto(kp, planes, decrypt: bool = False):
    """Backend dispatch: the Pallas kernel on TPU (padding the word axis
    to the tile internally), the jnp bitsliced path elsewhere.  Padded
    tail words are garbage-in/garbage-out; callers slice by position."""
    from ..core.bitslice import decrypt_planes, encrypt_planes

    if jax.default_backend() != "tpu":
        return decrypt_planes(kp, planes) if decrypt else encrypt_planes(kp, planes)
    w = planes.shape[-1]
    pad = (-w) % TILE_W
    if pad:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, pad)))
    out = cipher_planes_pallas(kp, planes, decrypt)
    return out[..., :w] if pad else out
