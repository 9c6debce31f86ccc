"""AES Key Wrap (RFC 3394 / NIST SP 800-38F KW) — micro_aes.c:1820-1894.

The 6n-step wheel is strictly serial; it runs as one lax.scan on device
(single dispatch) rather than 6n host round trips.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cipher import encrypt_blocks, decrypt_blocks
from ..errors import AuthenticationError, DataLengthError
from ..utils.bytesio import verify_tag
from .common import round_keys, to_u8

HB = 8  # semi-block


@functools.partial(jax.jit, static_argnames=("n",))
def _wrap_scan(rk, a0, r0, n: int):
    def step(carry, t):
        a, r = carry
        idx = (t - 1) % n
        block = jnp.concatenate([a, r[idx]])
        b = encrypt_blocks(rk, block[None, :])[0]
        tb = t.astype(jnp.uint32)
        xor = jnp.zeros(HB, jnp.uint8)
        xor = xor.at[4].set((tb >> 24).astype(jnp.uint8))
        xor = xor.at[5].set((tb >> 16).astype(jnp.uint8))
        xor = xor.at[6].set((tb >> 8).astype(jnp.uint8))
        xor = xor.at[7].set(tb.astype(jnp.uint8))
        a2 = b[:HB] ^ xor
        r2 = r.at[idx].set(b[HB:])
        return (a2, r2), None

    (a, r), _ = jax.lax.scan(step, (a0, r0), jnp.arange(1, 6 * n + 1))
    return a, r


@functools.partial(jax.jit, static_argnames=("n",))
def _unwrap_scan(rk, a0, r0, n: int):
    def step(carry, t):
        a, r = carry
        idx = (t - 1) % n
        tb = t.astype(jnp.uint32)
        xor = jnp.zeros(HB, jnp.uint8)
        xor = xor.at[4].set((tb >> 24).astype(jnp.uint8))
        xor = xor.at[5].set((tb >> 16).astype(jnp.uint8))
        xor = xor.at[6].set((tb >> 8).astype(jnp.uint8))
        xor = xor.at[7].set(tb.astype(jnp.uint8))
        block = jnp.concatenate([a ^ xor, r[idx]])
        b = decrypt_blocks(rk, block[None, :])[0]
        r2 = r.at[idx].set(b[HB:])
        return (b[:HB], r2), None

    (a, r), _ = jax.lax.scan(
        step, (a0, r0), jnp.arange(6 * n, 0, -1)
    )
    return a, r


def key_wrap(kek, secret) -> bytes:
    """AES_KEY_wrap (micro_aes.c:1829-1855): returns ICV-semiblock || wrapped."""
    kek = bytes(kek)
    secret = to_u8(secret)
    n = len(secret) // HB
    if n < 2 or len(secret) % HB:
        raise DataLengthError("KW secret must be >= 2 whole semi-blocks")
    a0 = jnp.full((HB,), 0xA6, jnp.uint8)
    r0 = jnp.asarray(secret.reshape(n, HB))
    a, r = _wrap_scan(round_keys(kek), a0, r0, n)
    return bytes(np.asarray(a)) + bytes(np.asarray(r).reshape(-1))


def key_unwrap(kek, wrapped) -> bytes:
    """AES_KEY_unwrap (micro_aes.c:1865-1894): verifies the 0xA6 ICV."""
    kek = bytes(kek)
    wrapped = to_u8(wrapped)
    n = len(wrapped) // HB
    if n < 3 or len(wrapped) % HB:
        raise DataLengthError("KW input must be >= 3 whole semi-blocks")
    a0 = jnp.asarray(wrapped[:HB])
    r0 = jnp.asarray(wrapped[HB:].reshape(n - 1, HB))
    a, r = _unwrap_scan(round_keys(kek), a0, r0, n - 1)
    if not verify_tag(np.full(HB, 0xA6, np.uint8), np.asarray(a)):
        raise AuthenticationError("KW integrity check failed")
    return bytes(np.asarray(r).reshape(-1))
