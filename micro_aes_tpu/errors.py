"""Error codes and exceptions mirroring the reference C API.

The reference (micro_aes.h:469-476) returns `char` codes from fallible
functions.  Note the `0x1L` quirk: `M_DATALENGTH_ERROR = 0x1L` is the *long
literal 1*, not 0x1C — we reproduce the numeric value 1 faithfully.
"""
from __future__ import annotations

import enum


class ResultCode(enum.IntEnum):
    """Numeric result codes, bit-compatible with micro_aes.h:469-476."""

    SUCCESS = 0
    ENCRYPTION_ERROR = 0x1E
    DECRYPTION_ERROR = 0x1D
    AUTHENTICATION_ERROR = 0x1A
    DATALENGTH_ERROR = 0x1  # sic: `0x1L` in the reference is the long 1


class MicroAesError(Exception):
    """Base error; carries the C-compatible result code."""

    code: ResultCode = ResultCode.ENCRYPTION_ERROR


class EncryptionError(MicroAesError):
    code = ResultCode.ENCRYPTION_ERROR


class DecryptionError(MicroAesError):
    code = ResultCode.DECRYPTION_ERROR


class AuthenticationError(MicroAesError):
    """Tag/ICV verification failed (AEAD decrypt, KW unwrap, SIV verify)."""

    code = ResultCode.AUTHENTICATION_ERROR


class DataLengthError(MicroAesError):
    """Input length violates the mode's constraints."""

    code = ResultCode.DATALENGTH_ERROR
