"""Bulk XTS disk-sector engine: many sectors in one dispatch.

The reference doubles the tweak serially per block (micro_aes.c:1035).
Doubling in GF(2^128) is linear over GF(2), so the whole per-sector tweak
chain T·alpha^j is one batched matmul against precomputed powers of the
doubling matrix D (key-independent!), and the XEX body is the bitsliced
Pallas cipher over all sectors at once:

    T0 = E_k2(sector tweak)                  (bitsliced cipher)
    T[s, j] = D^j @ bits(T0[s])              (int8 MXU matmul)
    out = T ^ CIPH_k1(T ^ data)              (bitsliced cipher)

Whole sectors only (the ragged CTS tail stays on the general modes/xts.py
path; disk workloads are sector-aligned by construction).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bitslice import key_planes
from ..core.keyschedule import expand_key
from ..errors import DataLengthError
from ..ops.gf128 import bits_to_blocks, blocks_to_bits, double_le
from ..ops.pallas_cipher import cipher_planes_auto
from ..utils.bytesio import BLOCK
from .common import to_u8

BLOCKS_PER_SECTOR_MAX = 512  # up to 8 KiB sectors


@functools.lru_cache(maxsize=8)
def _double_powers_t(nblocks: int):
    """[(D^j)^T for j=0..nblocks-1] as int8 [J,128,128]; D = the
    little-endian doubling map (micro_aes.c:449-458), probed from the
    oracle column by column."""
    eye = np.eye(128, dtype=np.uint8)
    unit_blocks = bits_to_blocks(jnp.asarray(eye))
    d_cols = blocks_to_bits(double_le(unit_blocks))      # [128 in, 128 bits]
    d = np.asarray(d_cols).T.astype(np.uint8)            # D[out, in]
    mats = [eye]
    for _ in range(nblocks - 1):
        mats.append((mats[-1].astype(np.int32) @ d.astype(np.int32) % 2
                     ).astype(np.uint8))
    # careful: T_{j+1} = D @ T_j, so alpha^j map = D^j; stack transposed
    # for row-vector application  bits_row @ (D^j)^T
    stack = np.stack([m.T for m in mats]).astype(np.int8)
    return jnp.asarray(stack)


def _cipher_blocks(kp, blocks, decrypt=False):
    """Bitsliced cipher over uint8[N,16] (pads N to a multiple of 32)."""
    from ..core.bitslice import pack_planes, unpack_planes

    n = blocks.shape[0]
    npad = (-n) % 32
    if npad:
        blocks = jnp.pad(blocks, ((0, npad), (0, 0)))
    planes = pack_planes(blocks)
    planes = cipher_planes_auto(kp, planes, decrypt)
    return unpack_planes(planes, n + npad)[:n]


@functools.partial(jax.jit, static_argnames=("decrypt",))
def xts_sectors_kernel(kp1, kp2, pows_t, tweaks, data, decrypt: bool = False):
    """tweaks uint8[S,16], data uint8[S, J, 16] -> uint8[S, J, 16]."""
    s, j, _ = data.shape
    t0 = _cipher_blocks(kp2, tweaks)                     # E_k2(tweak)
    tbits = blocks_to_bits(t0).astype(jnp.int8)          # [S,128]
    tw = jax.lax.dot_general(
        tbits, pows_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32) & 1            # [S, J, 128]
    tw = bits_to_blocks(tw.astype(jnp.uint8))            # [S, J, 16]
    x = (data ^ tw).reshape(s * j, BLOCK)
    y = _cipher_blocks(kp1, x, decrypt).reshape(s, j, BLOCK)
    return y ^ tw


def _prepare(keys, sector_ids, data, sector_size):
    keys = bytes(keys)
    klen = len(keys) // 2
    kp1 = jnp.asarray(key_planes(expand_key(keys[:klen])))
    kp2 = jnp.asarray(key_planes(expand_key(keys[klen:])))
    flat = to_u8(data)
    if sector_size % BLOCK or len(flat) % sector_size:
        raise DataLengthError("data must be whole 16-byte-aligned sectors")
    j = sector_size // BLOCK
    if j > BLOCKS_PER_SECTOR_MAX:
        raise DataLengthError(f"sector size > {BLOCKS_PER_SECTOR_MAX * BLOCK}")
    s = len(flat) // sector_size
    tweaks = np.zeros((s, BLOCK), np.uint8)
    for i, sid in enumerate(sector_ids):
        if isinstance(sid, (bytes, bytearray, np.ndarray)):
            tweaks[i, : len(sid)] = np.frombuffer(bytes(sid), np.uint8)[:BLOCK]
        else:  # integer sector id, little-endian (copyLint, c:399-404)
            v = int(sid)
            k = 0
            while True:
                tweaks[i, k] = v & 0xFF
                v >>= 8
                k += 1
                if not v:
                    break
    blocks = flat.reshape(s, j, BLOCK)
    return kp1, kp2, _double_powers_t(j), jnp.asarray(tweaks), jnp.asarray(blocks)


def xts_seal_sectors(keys, sector_ids, data, sector_size: int = 4096) -> bytes:
    """Encrypt S whole sectors, each under tweak sector_ids[i].
    keys = key1 || key2; sector_ids: ints or 16-byte tweaks."""
    kp1, kp2, pows, tweaks, blocks = _prepare(keys, sector_ids, data, sector_size)
    out = xts_sectors_kernel(kp1, kp2, pows, tweaks, blocks, decrypt=False)
    return bytes(np.asarray(out).reshape(-1))


def xts_open_sectors(keys, sector_ids, data, sector_size: int = 4096) -> bytes:
    """Decrypt S whole sectors (inverse of xts_seal_sectors)."""
    kp1, kp2, pows, tweaks, blocks = _prepare(keys, sector_ids, data, sector_size)
    out = xts_sectors_kernel(kp1, kp2, pows, tweaks, blocks, decrypt=True)
    return bytes(np.asarray(out).reshape(-1))
