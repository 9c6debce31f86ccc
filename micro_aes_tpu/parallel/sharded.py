"""Mesh-sharded bulk AES-GCM: the multi-chip scaling path (SURVEY §2.6).

Layout over a 2D mesh (dp, sp):
  * dp — independent messages (embarrassingly parallel);
  * sp — the block axis *within* each message: every shard generates its
    own counter window from the global block index (no communication),
    ciphers it bitsliced, folds a local GHASH partial, applies its
    per-shard adjustment power M^(L*(S-1-s)), and the tag emerges from
    ONE xor-psum over sp (GF(2) sum == parity of an integer psum).

Collectives ride the mesh (ICI on real hardware); there is no other
cross-device traffic — by construction the design scales linearly until
the single psum dominates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:  # JAX >= 0.7 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from jax.sharding import Mesh, PartitionSpec as P

from ..core.bitslice import (
    blocks_to_words,
    planes_to_words,
    words_to_blocks,
    words_to_planes,
)
from ..ops.counter import counter_planes_be
from ..ops.pallas_cipher import cipher_planes_auto
from ..ops.gf128 import mat_power_gf2_np
from ..ops.ghash_bulk import (
    _gf2_matmul_i8,
    ghash_finalize,
    ghash_from_bits,
    planes_to_bits_i8,
)
from ..utils.bytesio import BLOCK


def shard_adjust_matrices(m_h: jax.Array, blocks_per_shard: int,
                          num_shards: int) -> jax.Array:
    """adj[s] = (M^(L*(S-1-s)))^T as int8, for the cross-shard combine."""
    m_l = mat_power_gf2_np(np.asarray(m_h), blocks_per_shard).astype(np.int64)
    mats = [np.eye(128, dtype=np.int64)]
    for _ in range(num_shards - 1):
        mats.append((mats[-1] @ m_l) % 2)
    stack = np.stack(
        [mats[num_shards - 1 - s].T for s in range(num_shards)])
    return jnp.asarray(stack.astype(np.int8))


def _local_seal(kp, tables, j0, pt, start, tile):
    """Per-(message, shard) pipeline in the bit-plane domain."""
    l = pt.shape[0]
    nwords = -(-(l + 2) // 32)
    nwords += (-nwords) % 4
    ctr_planes = counter_planes_be(j0, nwords, start)
    ks_planes = cipher_planes_auto(kp, ctr_planes)
    pt_words = blocks_to_words(pt)
    pt_words = jnp.pad(pt_words, ((0, 0), (2, 32 * nwords - l - 2)))
    ct_planes = words_to_planes(pt_words) ^ ks_planes
    ct = words_to_blocks(planes_to_words(ct_planes)[:, 2: l + 2])
    bits = planes_to_bits_i8(ct_planes)[2: l + 2]
    gpad = (-l) % tile
    if gpad:
        bits = jnp.concatenate(
            [jnp.zeros((gpad, 128), jnp.int8), bits], axis=0)
    acc = ghash_from_bits(tables, bits)
    return ct, acc


def shard_adjust_matrices_fused(m_h: jax.Array, blocks_per_shard: int,
                                num_shards: int) -> jax.Array:
    """Per-shard combine matrices for the *fused-kernel* local pipeline:
    A_s = M^(L*(S-1-s)) . M^(-z) where z is the local trailing stream pad
    (modes/seal.fused_trailing_pad) — one matrix absorbs both the shard
    offset and the local pad compensation.  Returned transposed, int8."""
    from ..modes.seal import fused_trailing_pad
    from ..ops.gf128 import gf2_matinv_np

    z = fused_trailing_pad(blocks_per_shard)
    minv_z = (gf2_matinv_np(mat_power_gf2_np(np.asarray(m_h), z))
              if z else np.eye(128, dtype=np.uint8))
    m_l = mat_power_gf2_np(np.asarray(m_h), blocks_per_shard)
    mats = [np.eye(128, dtype=np.uint8)]
    for _ in range(num_shards - 1):
        mats.append((mats[-1].astype(np.int32) @ m_l.astype(np.int32) % 2
                     ).astype(np.uint8))
    stack = np.stack([
        ((mats[num_shards - 1 - s].astype(np.int32) @ minv_z.astype(np.int32))
         % 2).astype(np.int8).T
        for s in range(num_shards)
    ])
    return jnp.asarray(stack)


def gcm_seal_sharded_fused_fn(mesh: Mesh, total_blocks: int):
    """Fused-Pallas-kernel variant of gcm_seal_sharded_fn (TPU only).
    Same signature; adj must come from shard_adjust_matrices_fused."""
    from ..modes.seal import _len_block, fused_seal_body

    sp = mesh.shape["sp"]
    assert total_blocks % sp == 0
    l_shard = total_blocks // sp
    assert l_shard % 32 == 0

    def local_fn(kp, tables, adj, j0, ek_j0, pt):
        sp_idx = jax.lax.axis_index("sp")
        start = (sp_idx * l_shard - 1).astype(jnp.int32)
        ct, _ek, acc = jax.vmap(
            lambda j, x: fused_seal_body(kp, tables, j, x, False, start)
        )(j0, pt)
        g_adj = _gf2_matmul_i8(acc.astype(jnp.int8), adj[0])
        g = jax.lax.psum(g_adj, "sp") & 1
        tag = ek_j0 ^ jax.vmap(
            lambda gb: ghash_finalize(tables, gb.astype(jnp.uint8),
                                      _len_block(total_blocks))
        )(g)
        return ct, tag

    fn = _shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P("sp"), P("dp"), P("dp"), P("dp", "sp")),
        out_specs=(P("dp", "sp"), P("dp")),
        check_vma=False,
    )
    return jax.jit(fn)


def gcm_seal_sharded_fn(mesh: Mesh, total_blocks: int):
    """Build the jitted sharded seal for a given mesh and message length.

    Returns fn(kp, tables, adj, j0[B,16], ek_j0[B,16], pt[B,N,16])
    -> (ct[B,N,16], tag[B,16]).  J0 low word must be 1 (12-byte nonce)."""
    sp = mesh.shape["sp"]
    assert total_blocks % sp == 0
    l_shard = total_blocks // sp
    assert l_shard % 32 == 0, "per-shard length must be 32-block aligned"

    def local_fn(kp, tables, adj, j0, ek_j0, pt):
        tile = 32 * (tables[1].shape[0] // 128)
        sp_idx = jax.lax.axis_index("sp")
        start = (sp_idx * l_shard - 1).astype(jnp.int32)
        ct, acc = jax.vmap(
            lambda j, x: _local_seal(kp, tables, j, x, start, tile)
        )(j0, pt)
        g_adj = _gf2_matmul_i8(acc.astype(jnp.int8), adj[0])  # [Bl,128]
        g = jax.lax.psum(g_adj, "sp") & 1  # XOR across shards == parity
        len_block = jnp.zeros(BLOCK, jnp.uint8)
        nbits = total_blocks * BLOCK * 8
        for i in range(8):
            len_block = len_block.at[15 - i].set((nbits >> (8 * i)) & 0xFF)
        tag = ek_j0 ^ jax.vmap(
            lambda gb: ghash_finalize(tables, gb.astype(jnp.uint8), len_block)
        )(g)
        return ct, tag

    fn = _shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P("sp"), P("dp"), P("dp"), P("dp", "sp")),
        out_specs=(P("dp", "sp"), P("dp")),
        check_vma=False,
    )
    return jax.jit(fn)
