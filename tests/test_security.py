"""Security-opts parity (micro_aes.c:362-384 under INCREASE_SECURITY):
constant-time tag verification + strict nonce validation."""
import numpy as np
import pytest

import micro_aes_tpu as aes
from micro_aes_tpu.errors import AuthenticationError, DataLengthError
from micro_aes_tpu.utils.bytesio import verify_tag


class TestVerifyTag:
    def test_equal(self):
        assert verify_tag(b"\x01\x02\x03", b"\x01\x02\x03")
        assert verify_tag(np.array([1, 2, 3], np.uint8), b"\x01\x02\x03")
        assert verify_tag(np.array([1, 2], np.uint8), np.array([1, 2], np.uint8))

    def test_mismatch(self):
        assert not verify_tag(b"\x01\x02\x03", b"\x01\x02\x04")
        assert not verify_tag(b"\x01\x02\x03", b"\xff\x02\x03")

    def test_length_mismatch(self):
        assert not verify_tag(b"\x01\x02", b"\x01\x02\x03")
        assert not verify_tag(b"", b"\x00")

    def test_empty_equal(self):
        assert verify_tag(b"", b"")


def _flip_last(blob: bytes) -> bytes:
    return blob[:-1] + bytes([blob[-1] ^ 1])


class TestTamperedTagsRaise:
    """Every AEAD/KW verify path must go through the constant-time helper
    and still reject a tampered tag."""

    KEY = bytes(range(16))
    KEY32 = bytes(range(32))
    NONCE12 = bytes(range(12))
    PT = b"constant-time verification parity!!!"  # 36 bytes

    def test_gcm(self):
        blob = aes.gcm_encrypt(self.KEY, self.NONCE12, b"aad", self.PT)
        with pytest.raises(AuthenticationError):
            aes.gcm_decrypt(self.KEY, self.NONCE12, b"aad", _flip_last(blob))

    def test_ccm(self):
        blob = aes.ccm_encrypt(self.KEY, self.NONCE12[:11], b"aad", self.PT)
        with pytest.raises(AuthenticationError):
            aes.ccm_decrypt(self.KEY, self.NONCE12[:11], b"aad", _flip_last(blob))

    def test_eax(self):
        blob = aes.eax_encrypt(self.KEY, self.NONCE12, b"aad", self.PT)
        with pytest.raises(AuthenticationError):
            aes.eax_decrypt(self.KEY, self.NONCE12, b"aad", _flip_last(blob))

    def test_ocb(self):
        blob = aes.ocb_encrypt(self.KEY, self.NONCE12, b"aad", self.PT)
        with pytest.raises(AuthenticationError):
            aes.ocb_decrypt(self.KEY, self.NONCE12, b"aad", _flip_last(blob))

    def test_gcm_siv(self):
        blob = aes.gcm_siv_encrypt(self.KEY, self.NONCE12, b"aad", self.PT)
        with pytest.raises(AuthenticationError):
            aes.gcm_siv_decrypt(self.KEY, self.NONCE12, b"aad", _flip_last(blob))

    def test_siv(self):
        iv, ct = aes.siv_encrypt(self.KEY32, b"aad", self.PT)
        with pytest.raises(AuthenticationError):
            aes.siv_decrypt(self.KEY32, _flip_last(iv), b"aad", ct)

    def test_kw(self):
        blob = aes.key_wrap(self.KEY, bytes(range(32)))
        with pytest.raises(AuthenticationError):
            aes.key_unwrap(self.KEY, _flip_last(blob[:8]) + blob[8:])


class TestNonceValidation:
    KEY = bytes(range(16))

    def test_ocb_nonce_too_long(self):
        with pytest.raises(DataLengthError):
            aes.ocb_encrypt(self.KEY, bytes(16), b"", b"x" * 16)

    def test_ocb_nonce_empty(self):
        with pytest.raises(DataLengthError):
            aes.ocb_encrypt(self.KEY, b"", b"", b"x" * 16)

    def test_gcm_siv_nonce_wrong_length(self):
        for n in (0, 8, 11, 13, 16):
            with pytest.raises(DataLengthError):
                aes.gcm_siv_encrypt(self.KEY, bytes(n), b"", b"x" * 16)
            with pytest.raises(DataLengthError):
                aes.gcm_siv_decrypt(self.KEY, bytes(n), b"", b"x" * 32)
