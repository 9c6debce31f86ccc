"""Mesh-sharded bulk AES-GCM: the multi-chip scaling path (SURVEY §2.6).

Layout over a 2D mesh (dp, sp):
  * dp — independent messages (embarrassingly parallel);
  * sp — the block axis *within* each message: every shard generates its
    own counter window from the global block index (no communication),
    ciphers it, folds a local GHASH partial, applies its per-shard
    adjustment power M^(L*(S-1-s)), and the tag emerges from ONE xor-psum
    over sp (GF(2) sum == parity of an integer psum).

Collectives ride the mesh (ICI on real hardware); there is no other
cross-device traffic — by construction the design scales linearly until
the single psum dominates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # JAX >= 0.7 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from jax.sharding import Mesh, PartitionSpec as P

from ..core.bitslice import encrypt_planes, pack_planes, unpack_planes
from ..ops.counter import counter_blocks
from ..ops.gf128 import blocks_to_bits, mat_power_gf2
from ..ops.ghash_bulk import _gf2_matmul_bf16, ghash_bulk, ghash_finalize
from ..utils.bytesio import BLOCK


def shard_adjust_matrices(m_h: jax.Array, blocks_per_shard: int,
                          num_shards: int) -> jax.Array:
    """adj[s] = (M^(L*(S-1-s)))^T as bf16, for the cross-shard combine."""
    m_l = mat_power_gf2(m_h, blocks_per_shard)
    mats = [jnp.eye(128, dtype=jnp.uint8)]
    for _ in range(num_shards - 1):
        mats.append((mats[-1].astype(jnp.int32) @ m_l.astype(jnp.int32) & 1).astype(jnp.uint8))
    # mats[k] = M^(L*k); shard s needs exponent S-1-s
    stack = jnp.stack([jnp.transpose(mats[num_shards - 1 - s]) for s in range(num_shards)])
    return stack.astype(jnp.bfloat16)


def _local_seal(kp, tables, j0, pt, sp_idx, nblocks_local):
    """Per-(message, shard) pipeline: counters -> cipher -> xor -> partial."""
    l = pt.shape[0]
    lc = ((l + 31) // 32) * 32
    offset = 1 + sp_idx * nblocks_local
    ctrs = counter_blocks(j0, lc, offset, "be")
    ks = unpack_planes(encrypt_planes(kp, pack_planes(ctrs)), lc)
    ct = pt ^ ks[:l]
    acc = ghash_bulk(tables, ct)  # local Horner partial, bits uint8[128]
    return ct, acc


def gcm_seal_sharded_fn(mesh: Mesh, total_blocks: int):
    """Build the jitted sharded seal for a given mesh and message length.

    Returns fn(kp, tables, adj, j0[B,16], ek_j0[B,16], pt[B,N,16])
    -> (ct[B,N,16], tag[B,16])."""
    sp = mesh.shape["sp"]
    assert total_blocks % sp == 0
    l_shard = total_blocks // sp

    def local_fn(kp, tables, adj, j0, ek_j0, pt):
        # shapes here are per-shard: j0 [Bl,16], pt [Bl, L, 16], adj [1,128,128]
        sp_idx = jax.lax.axis_index("sp")
        ct, acc = jax.vmap(
            lambda j, x: _local_seal(kp, tables, j, x, sp_idx, l_shard)
        )(j0, pt)
        g_adj = _gf2_matmul_bf16(acc.astype(jnp.bfloat16), adj[0])  # [Bl,128]
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
