"""Counter-block generation for all CTR-based modes.

The reference drives six modes through one serial `CTR_cipher` loop with
per-mode counter conventions (micro_aes.c:901-950 + incBlock c:421-428).
On TPU the counter stream is *computed from the block index alone*, so the
whole keystream is embarrassingly parallel: `counter_blocks` maps
`(base_block, arange(n))` to the n counter blocks in one vectorized shot.

incBlock's dual-endian contract (micro_aes.c:421-428) is reproduced
exactly:
  * index = LAST: big-endian counting over bytes 15 down to 9 (56-bit
    counter; the carry chain stops after byte 9) — CTR/GCM/CCM/SIV/EAX.
  * index = 0: little-endian counting over bytes 0..3 (32-bit counter) —
    GCM-SIV only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Per-mode setup (ctr_based_modes, micro_aes.c:903-909):
#   CTR_DEFAULT: use base as-is, count BE from offset 0
#   CCM_GCM:     pre-increment (count BE from offset 1)
#   SIV_CTR:     clear bit7 of bytes 8 and 12, count BE
#   SIVGCM_CTR:  set bit7 of byte 15, count LE32


def prepare_counter_base(base: jax.Array, mode: str) -> tuple[jax.Array, int, str]:
    """Apply the mode's bit-fiddling; return (base, start_offset, endianness)."""
    if mode == "ctr":
        return base, 0, "be"
    if mode == "ccm_gcm":
        return base, 1, "be"
    if mode == "siv":
        base = base.at[8].set(base[8] & 0x7F).at[12].set(base[12] & 0x7F)
        return base, 0, "be"
    if mode == "gcm_siv":
        base = base.at[15].set(base[15] | 0x80)
        return base, 0, "le32"
    raise ValueError(f"unknown counter mode {mode!r}")


def counter_blocks(base: jax.Array, n: int, offset=0, endian: str = "be") -> jax.Array:
    """uint8[16] base -> uint8[n, 16] counter blocks base+offset .. base+offset+n-1."""
    i = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(offset)
    out = jnp.broadcast_to(base, (n, 16))

    if endian == "be":
        # 56-bit BE counter in bytes 9..15, split as hi24 (9..11) | lo32 (12..15)
        b = base.astype(jnp.uint32)
        lo0 = (b[12] << 24) | (b[13] << 16) | (b[14] << 8) | b[15]
        hi0 = (b[9] << 16) | (b[10] << 8) | b[11]
        lo = lo0 + i
        carry = (lo < lo0).astype(jnp.uint32)
        hi = (hi0 + carry) & 0xFFFFFF
        cols = [
            (hi >> 16) & 0xFF, (hi >> 8) & 0xFF, hi & 0xFF,
            (lo >> 24) & 0xFF, (lo >> 16) & 0xFF, (lo >> 8) & 0xFF, lo & 0xFF,
        ]
        tail = jnp.stack(cols, axis=-1).astype(jnp.uint8)
        return jnp.concatenate([out[:, :9], tail], axis=1)

    if endian == "le32":
        b = base.astype(jnp.uint32)
        v0 = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)
        v = v0 + i  # 32-bit wrap
        head = jnp.stack(
            [v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF],
            axis=-1,
        ).astype(jnp.uint8)
        return jnp.concatenate([head, out[:, 4:]], axis=1)

    raise ValueError(f"unknown endian {endian!r}")
