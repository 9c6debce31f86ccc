"""AES-CMAC (NIST SP 800-38B) — parity with micro_aes.c:1100-1117."""
from __future__ import annotations

from .common import cmac_digest


def cmac(key, data) -> bytes:
    """AES_CMAC: 16-byte MAC of `data`."""
    return bytes(cmac_digest(bytes(key), data))
