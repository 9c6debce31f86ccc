"""Byte/array conversion helpers shared across the framework.

All public mode APIs speak `bytes`; device kernels speak `uint8[N, 16]`
block arrays.  These helpers are the single boundary between the two.
"""
from __future__ import annotations

import hmac

import numpy as np

BLOCK = 16


def verify_tag(expect, got) -> bool:
    """Constant-time tag/IV/ICV comparison (reference: the memcmp_s helper
    under INCREASE_SECURITY, micro_aes.c:369-384).

    Both sides are reduced to host bytes first (any device/array work is
    over by then), and the comparison itself is `hmac.compare_digest`,
    which runs in time independent of where the first mismatch occurs —
    no tag-prefix timing oracle.  Length mismatch returns False.
    """
    eb = bytes(np.asarray(expect, dtype=np.uint8).reshape(-1)) \
        if not isinstance(expect, (bytes, bytearray)) else bytes(expect)
    gb = bytes(np.asarray(got, dtype=np.uint8).reshape(-1)) \
        if not isinstance(got, (bytes, bytearray)) else bytes(got)
    if len(eb) != len(gb):
        return False
    return hmac.compare_digest(eb, gb)


def to_u8(data) -> np.ndarray:
    """bytes / bytearray / ndarray -> flat uint8 ndarray (no copy if possible)."""
    if isinstance(data, np.ndarray):
        return np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    if data is None:
        return np.zeros(0, dtype=np.uint8)
    return np.frombuffer(bytes(data), dtype=np.uint8)


def to_blocks(data, pad_to_blocks: int | None = None) -> np.ndarray:
    """Flat bytes -> zero-padded uint8[N, 16] block array.

    If `pad_to_blocks` is given the result is padded up to that many blocks
    (for shape-bucketing under jit); otherwise to the next block multiple.
    """
    flat = to_u8(data)
    n = len(flat)
    nblocks = (n + BLOCK - 1) // BLOCK
    if pad_to_blocks is not None:
        nblocks = max(nblocks, pad_to_blocks)
    out = np.zeros(nblocks * BLOCK, dtype=np.uint8)
    out[:n] = flat
    return out.reshape(nblocks, BLOCK)


def from_blocks(blocks, nbytes: int) -> bytes:
    """uint8[N, 16] (device or host) -> first `nbytes` as Python bytes."""
    return bytes(np.asarray(blocks, dtype=np.uint8).reshape(-1)[:nbytes])


def hex2bytes(s: str) -> bytes:
    """Forgiving hex decoder (ignores whitespace), like main.c:97-106."""
    return bytes.fromhex("".join(s.split()))


def block_bucket(nblocks: int, floor: int = 1) -> int:
    """Round a block count up to a small set of bucket sizes to bound the
    number of jit specializations across a variable-length test corpus."""
    n = max(nblocks, floor)
    b = floor
    while b < n:
        b *= 2
    return b
