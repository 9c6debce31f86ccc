"""Serial-chain device kernels (lax.scan): CBC/CFB encrypt, OFB keystream.

These chains have strict loop-carried dependence (SURVEY §3.2), so within
one message they run as a `lax.scan`; batching across messages is how they
parallelize (see parallel/).  Scans are causal, so shape-bucketed padded
tails never affect the valid prefix.
"""
from __future__ import annotations

import jax

from ..core.cipher import encrypt_blocks


@jax.jit
def cbc_encrypt_scan(round_keys, iv, blocks):
    """y_i = E(iv ^ x_i); iv = y_i  (micro_aes.c:712-717)."""

    def step(carry, x):
        y = encrypt_blocks(round_keys, (carry ^ x)[None, :])[0]
        return y, y

    _, ys = jax.lax.scan(step, iv, blocks)
    return ys


@jax.jit
def cfb_encrypt_scan(round_keys, iv, blocks):
    """y_i = E(iv) ^ x_i; iv = y_i  (micro_aes.c:808-814, mode=1)."""

    def step(carry, x):
        y = encrypt_blocks(round_keys, carry[None, :])[0] ^ x
        return y, y

    _, ys = jax.lax.scan(step, iv, blocks)
    return ys


@jax.jit
def ofb_keystream_scan(round_keys, iv, nblocks_arr):
    """iv_{i+1} = E(iv_i); emits the keystream blocks (micro_aes.c:872-876).
    nblocks_arr is a dummy [N] array fixing the scan length."""

    def step(carry, _):
        y = encrypt_blocks(round_keys, carry[None, :])[0]
        return y, y

    _, ks = jax.lax.scan(step, iv, nblocks_arr)
    return ks
