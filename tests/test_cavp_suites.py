"""Remaining conformance suites: CCM (VNT), XTS, CMAC, GCM-SIV, EAX, OCB,
Poly1305 — full corpora from /root/reference/testvectors (SURVEY §4)."""
import numpy as np
import pytest

from micro_aes_tpu.errors import AuthenticationError
from micro_aes_tpu.modes import (
    ccm_decrypt, ccm_encrypt, eax_decrypt, eax_encrypt,
    gcm_siv_decrypt, gcm_siv_encrypt, ocb_decrypt, ocb_encrypt,
    poly1305_aes,
)
from micro_aes_tpu.modes.bulk import cmac_batch, xts_batch
from micro_aes_tpu.modes.xts import xts_decrypt, xts_encrypt
from micro_aes_tpu.testing import rsp


@pytest.mark.parametrize("keylen", [128, 192, 256])
def test_ccm_vnt(keylen):
    recs = rsp.load_ccm(keylen)
    assert len(recs) == 70
    for r in recs:
        nlen = int(r["Nlen"])
        tlen = int(r["Tlen"])
        key, nonce = rsp.hexval(r, "Key"), rsp.hexval(r, "Nonce")
        aad, pt = rsp.hexval(r, "Adata"), rsp.hexval(r, "Payload")
        expect = rsp.hexval(r, "CT")
        out = ccm_encrypt(key, nonce, aad, pt, nonce_len=nlen, tag_len=tlen)
        assert out == expect, f"CCM-{keylen} Nlen={nlen} count={r['Count']}"
        assert ccm_decrypt(key, nonce, aad, expect, nonce_len=nlen,
                           tag_len=tlen) == pt


@pytest.mark.parametrize("keylen", [128, 256])
def test_xts_cavp(keylen):
    """ALL 1000 records per file, including the bit-granular 130-bit
    data units the reference's own harness skips
    (aes_testvectors_XTS.h:85) — beyond-reference coverage via
    xts_encrypt(bit_len=...)."""
    recs = rsp.load_xts(keylen)
    assert len(recs) == 1000
    by_len: dict[int, list] = {}
    for r in recs:
        by_len.setdefault(int(r["DataUnitLen"]), []).append(r)
    verified = 0
    for nbits, group in by_len.items():
        keys = [rsp.hexval(r, "Key") for r in group]
        tweaks = [rsp.hexval(r, "i") for r in group]
        pts = [rsp.hexval(r, "PT") for r in group]
        cts = [rsp.hexval(r, "CT") for r in group]
        if nbits % 128 == 0:
            got_enc = xts_batch(keys, tweaks, pts, encrypt=True)
            got_dec = xts_batch(keys, tweaks, cts, encrypt=False)
        else:  # ragged tail: CTS path (bit-granular when nbits % 8 != 0)
            got_enc = [xts_encrypt(k, t, p, bit_len=nbits)
                       for k, t, p in zip(keys, tweaks, pts)]
            got_dec = [xts_decrypt(k, t, c, bit_len=nbits)
                       for k, t, c in zip(keys, tweaks, cts)]
        for i, r in enumerate(group):
            assert got_enc[i] == cts[i], f"XTS-{keylen} enc COUNT={r['COUNT']}"
            assert got_dec[i] == pts[i], f"XTS-{keylen} dec COUNT={r['COUNT']}"
            verified += 1
    assert verified == 1000


@pytest.mark.parametrize("keylen", [128, 192, 256])
def test_cmac_cavp(keylen):
    recs = rsp.load_cmac(keylen)
    assert len(recs) >= 40
    keys, msgs = [], []
    for r in recs:
        mlen = int(r["Mlen"])
        keys.append(rsp.hexval(r, "Key"))
        msgs.append(rsp.hexval(r, "Msg")[:mlen])
    outs = cmac_batch(keys, msgs)
    for r, out in zip(recs, outs):
        tlen = int(r["Tlen"])
        assert out[:tlen] == rsp.hexval(r, "Mac"), f"CMAC-{keylen} {r['Count']}"


def test_gcm_siv_acvp():
    recs = rsp.load_gcm_siv()
    assert len(recs) == 102 or len(recs) >= 90
    for r in recs:
        key, iv = rsp.hexval(r, "key"), rsp.hexval(r, "iv")
        aad, pt = rsp.hexval(r, "aad"), rsp.hexval(r, "pt")
        expect = rsp.hexval(r, "ct")
        out = gcm_siv_encrypt(key, iv, aad, pt)
        assert out == expect, f"GCM-SIV count={r['Count']}"
        assert gcm_siv_decrypt(key, iv, aad, expect) == pt


def test_eax_tv():
    recs = rsp.load_eax()
    assert len(recs) == 10
    for r in recs:
        key, nonce = rsp.hexval(r, "KEY"), rsp.hexval(r, "NONCE")
        aad, pt = rsp.hexval(r, "HEADER"), rsp.hexval(r, "MSG")
        expect = rsp.hexval(r, "CIPHER")
        out = eax_encrypt(key, nonce, aad, pt)
        assert out == expect
        assert eax_decrypt(key, nonce, aad, expect) == pt


def test_ocb_tv():
    recs = rsp.load_ocb()
    assert len(recs) == 24  # ("Ciphertext" lines also start with "Cipher")
    for r in recs:
        key, nonce = rsp.hexval(r, "Key"), rsp.hexval(r, "IV")
        aad = rsp.hexval(r, "AAD")
        pt, ct = rsp.hexval(r, "Plaintext"), rsp.hexval(r, "Ciphertext")
        tag = rsp.hexval(r, "Tag")
        taglen = len(tag)
        if r.get("Result") == "CIPHERFINAL_ERROR":
            with pytest.raises(AuthenticationError):
                ocb_decrypt(key, nonce, aad, ct + tag, tag_len=taglen)
            continue
        out = ocb_encrypt(key, nonce, aad, pt, tag_len=taglen)
        assert out == ct + tag
        assert ocb_decrypt(key, nonce, aad, ct + tag, tag_len=taglen) == pt


def test_poly1305_tv():
    recs = rsp.load_poly1305()
    assert len(recs) == 96  # measured from the file (SURVEY's 102 was off)
    for r in recs:
        mlen = int(r["Mlen"])
        msg = rsp.hexval(r, "Msg")[:mlen]
        out = poly1305_aes(rsp.hexval(r, "Keys"), rsp.hexval(r, "Nonce"), msg)
        assert out == rsp.hexval(r, "PolyMac"), f"Poly1305 count={r['Count']}"
