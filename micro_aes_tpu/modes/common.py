"""Shared glue for all modes: key caching, device dispatch, padding, MACs.

Host code (numpy, per-message O(16) byte fiddling) orchestrates; all bulk
block work happens in jitted device kernels with shape-bucketed batches.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cipher import _decrypt_jit, _encrypt_jit
from ..core.keyschedule import expand_key
from ..errors import DataLengthError
from ..ops.counter import counter_blocks, prepare_counter_base
from ..ops.mac import cbcmac_fold, double_be_np, double_le_np
from ..utils.bytesio import BLOCK, block_bucket, from_blocks, to_blocks, to_u8

# ---------------------------------------------------------------------------
# key / cipher helpers
# ---------------------------------------------------------------------------


from ..utils.keycache import key_cache


@key_cache(maxsize=512)
def round_keys(key: bytes) -> jax.Array:
    return jnp.asarray(expand_key(key))


def enc_blocks_np(key: bytes, blocks: np.ndarray) -> np.ndarray:
    """Encrypt a host batch uint8[N,16]; shape-bucketed to bound jit cache."""
    n = blocks.shape[0]
    if n == 0:
        return blocks
    nb = block_bucket(n)
    buf = np.zeros((nb, BLOCK), np.uint8)
    buf[:n] = blocks
    out = _encrypt_jit(round_keys(key), jnp.asarray(buf))
    return np.asarray(out)[:n]


def dec_blocks_np(key: bytes, blocks: np.ndarray) -> np.ndarray:
    n = blocks.shape[0]
    if n == 0:
        return blocks
    nb = block_bucket(n)
    buf = np.zeros((nb, BLOCK), np.uint8)
    buf[:n] = blocks
    out = _decrypt_jit(round_keys(key), jnp.asarray(buf))
    return np.asarray(out)[:n]


def enc_block(key: bytes, block: np.ndarray) -> np.ndarray:
    """Encrypt a single 16-byte block (host ndarray in/out).

    Uses the native C++ oracle (differentially tested against the JAX
    paths) — tiny setup-time encrypts must never pay a remote-device
    compile."""
    from .. import native

    return native.oracle_encrypt(key, np.asarray(block, np.uint8).reshape(1, 16))[0]


def keystream(key: bytes, base: np.ndarray, mode: str, nblocks: int) -> np.ndarray:
    """E(ctr_i) for i = 0..nblocks-1 with the mode's counter convention
    (replaces the serial loop of CTR_cipher, micro_aes.c:919-950)."""
    if nblocks == 0:
        return np.zeros((0, BLOCK), np.uint8)
    base_j, offset, endian = prepare_counter_base(jnp.asarray(base, jnp.uint8), mode)
    nb = block_bucket(nblocks)
    ctrs = _counter_jit(base_j, nb, offset, endian)
    ks = _encrypt_jit(round_keys(key), ctrs)
    return np.asarray(ks)[:nblocks]


@functools.partial(jax.jit, static_argnames=("n", "offset", "endian"))
def _counter_jit(base, n, offset, endian):
    return counter_blocks(base, n, offset, endian)


def ctr_xcrypt(key: bytes, base: np.ndarray, mode: str, data) -> bytes:
    """data ^ keystream — the body of CTR_cipher for full+partial blocks."""
    flat = to_u8(data)
    n = len(flat)
    nblocks = (n + BLOCK - 1) // BLOCK
    ks = keystream(key, base, mode, nblocks).reshape(-1)[:n]
    return bytes(flat ^ ks)


# ---------------------------------------------------------------------------
# padding (padBlock, micro_aes.c:610-621)
# ---------------------------------------------------------------------------

PAD_ZERO, PAD_PKCS7, PAD_ISO7816 = 0, 1, 2


def pad_message(data: np.ndarray, padding: int) -> tuple[np.ndarray, bool]:
    """Return (padded bytes, whether a final padded block exists)."""
    n = len(data)
    r = n % BLOCK
    if padding == PAD_ZERO:
        if r == 0:
            return data, False
        out = np.zeros(n + BLOCK - r, np.uint8)
        out[:n] = data
        return out, True
    pad = BLOCK - r  # full block of padding when r == 0
    out = np.zeros(n + pad, np.uint8)
    out[:n] = data
    if padding == PAD_PKCS7:
        out[n:] = pad
    else:  # ISO/IEC 7816-4
        out[n] = 0x80
    return out, True


# ---------------------------------------------------------------------------
# CMAC machinery (cMac/getSubkeys, micro_aes.c:573-605)
# ---------------------------------------------------------------------------


@key_cache(maxsize=512)
def cmac_subkeys(key: bytes, little_endian: bool = False, quad: bool = True):
    """(K1, K2) per getSubkeys: K1 = double^quad(E_K(0)), K2 = double(K1)."""
    dbl = double_le_np if little_endian else double_be_np
    L = enc_block(key, np.zeros(16, np.uint8))
    K1 = dbl(L) if quad else L
    K2 = dbl(K1)
    K1.setflags(write=False)
    K2.setflags(write=False)
    return K1, K2


def cbcmac_np(key: bytes, init: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    """Fold M = E(M ^ x_i) over host blocks via one lax.scan device call."""
    n = blocks.shape[0]
    if n == 0:
        return np.asarray(init, np.uint8).copy()
    nb = block_bucket(n)
    buf = np.zeros((nb, BLOCK), np.uint8)
    buf[:n] = blocks
    out = cbcmac_fold(
        round_keys(key), jnp.asarray(init, jnp.uint8), jnp.asarray(buf),
        jnp.int32(n),
    )
    return np.asarray(out)


def xmac_blocks(data) -> np.ndarray:
    """xMac block prep (micro_aes.c:551-571): zero-padded full blocks.
    Folding zero-padded tails is bit-identical to the reference's partial
    xor-then-mix."""
    return to_blocks(data) if len(to_u8(data)) else np.zeros((0, BLOCK), np.uint8)


def cmac_digest(
    key: bytes,
    data,
    init: np.ndarray | None = None,
    subkeys=None,
    little_endian: bool = False,
) -> np.ndarray:
    """cMac (micro_aes.c:576-590): CBC-MAC with K1/K2 last-block tweak,
    optionally continuing from a nonzero init (used by EAX/OCB/SIV)."""
    K1, K2 = subkeys if subkeys is not None else cmac_subkeys(key, little_endian)
    flat = to_u8(data)
    n = len(flat)
    s = (n - 1) % BLOCK + 1 if n else 0
    head = to_blocks(flat[: n - s]) if n - s else np.zeros((0, BLOCK), np.uint8)
    last = np.zeros(BLOCK, np.uint8)
    last[:s] = flat[n - s:]
    if s < BLOCK:
        last[s] ^= 0x80
        last ^= K2
    else:
        last ^= K1
    mac = np.zeros(BLOCK, np.uint8) if init is None else np.asarray(init, np.uint8)
    blocks = np.concatenate([head, last[None, :]], axis=0)
    return cbcmac_np(key, mac, blocks)


def check_block_multiple(nbytes: int):
    if nbytes % BLOCK:
        raise DataLengthError(f"length {nbytes} is not a multiple of {BLOCK}")


__all__ = [
    "BLOCK",
    "round_keys",
    "enc_blocks_np",
    "dec_blocks_np",
    "enc_block",
    "keystream",
    "ctr_xcrypt",
    "pad_message",
    "PAD_ZERO",
    "PAD_PKCS7",
    "PAD_ISO7816",
    "cmac_subkeys",
    "cbcmac_np",
    "xmac_blocks",
    "cmac_digest",
    "check_block_multiple",
    "to_u8",
    "to_blocks",
    "from_blocks",
]
