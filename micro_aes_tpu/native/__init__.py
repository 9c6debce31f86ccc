"""ctypes loader for the native host library (host_aes.cpp).

Compiles on demand with g++ (cached next to the source); every entry
point has a pure-Python fallback so the package works without a
toolchain.  `available()` reports whether the native path is active.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_aes.cpp")
_SO = os.path.join(_HERE, "libuaes_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.uaes_oracle_encrypt.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
                ctypes.c_void_p, ctypes.c_size_t]
            lib.uaes_oracle_decrypt.argtypes = lib.uaes_oracle_encrypt.argtypes
            lib.uaes_hex_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p]
            lib.uaes_hex_decode.restype = ctypes.c_size_t
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def oracle_encrypt(key: bytes, blocks: np.ndarray) -> np.ndarray:
    """Independent C++ AES oracle over uint8[N,16] (ECB semantics)."""
    lib = _load()
    blocks = np.ascontiguousarray(blocks, np.uint8)
    n = blocks.shape[0]
    if lib is None:  # pure-python fallback via the jnp oracle
        from ..modes.common import enc_blocks_np
        return enc_blocks_np(bytes(key), blocks)
    out = np.empty_like(blocks)
    lib.uaes_oracle_encrypt(bytes(key), len(key), blocks.tobytes(),
                            out.ctypes.data_as(ctypes.c_void_p), n)
    return out


def oracle_decrypt(key: bytes, blocks: np.ndarray) -> np.ndarray:
    lib = _load()
    blocks = np.ascontiguousarray(blocks, np.uint8)
    n = blocks.shape[0]
    if lib is None:
        from ..modes.common import dec_blocks_np
        return dec_blocks_np(bytes(key), blocks)
    out = np.empty_like(blocks)
    lib.uaes_oracle_decrypt(bytes(key), len(key), blocks.tobytes(),
                            out.ctypes.data_as(ctypes.c_void_p), n)
    return out


def hex_decode(text: str) -> bytes:
    """Forgiving hex decode (native when available)."""
    lib = _load()
    if lib is None:
        return bytes.fromhex("".join(c for c in text if c in "0123456789abcdefABCDEF"))
    raw = text.encode()
    out = np.empty(len(raw) // 2 + 1, np.uint8)
    n = lib.uaes_hex_decode(raw, len(raw),
                            out.ctypes.data_as(ctypes.c_void_p))
    return bytes(out[:n])
