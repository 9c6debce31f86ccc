"""CAVP GCM conformance: GcmEncryptExtIV{128,192,256}.rsp — all cases,
batched (7875 vectors per file, one handful of device dispatches)."""
import numpy as np
import pytest

from micro_aes_tpu.modes.bulk import gcm_encrypt_batch
from micro_aes_tpu.modes.gcm import gcm_decrypt, gcm_encrypt
from micro_aes_tpu.testing import rsp


@pytest.mark.parametrize("keylen", [128, 192, 256])
def test_gcm_cavp_encrypt_all(keylen):
    recs = rsp.load_gcm(keylen)
    assert len(recs) == 7875
    keys = [rsp.hexval(r, "Key") for r in recs]
    ivs = [rsp.hexval(r, "IV") for r in recs]
    aads = [rsp.hexval(r, "AAD") for r in recs]
    pts = [rsp.hexval(r, "PT") for r in recs]
    outs = gcm_encrypt_batch(keys, ivs, aads, pts)
    bad = 0
    for r, out in zip(recs, outs):
        taglen = int(r["Taglen"]) // 8
        ct, tag = rsp.hexval(r, "CT"), rsp.hexval(r, "Tag")
        if out[: len(ct)] != ct or out[len(ct): len(ct) + taglen] != tag:
            bad += 1
    assert bad == 0, f"{bad}/{len(recs)} GCM-{keylen} vectors failed"


def test_gcm_cavp_decrypt_sample():
    recs = rsp.load_gcm(128)[::250]  # decrypt path, sampled
    for r in recs:
        taglen = int(r["Taglen"]) // 8
        ct_tag = rsp.hexval(r, "CT") + rsp.hexval(r, "Tag")
        pt = gcm_decrypt(rsp.hexval(r, "Key"), rsp.hexval(r, "IV"),
                         rsp.hexval(r, "AAD"), ct_tag, tag_len=taglen)
        assert pt == rsp.hexval(r, "PT")


def test_gcm_single_matches_batch():
    recs = rsp.load_gcm(128)[1000:1003]
    for r in recs:
        taglen = int(r["Taglen"]) // 8
        out = gcm_encrypt(rsp.hexval(r, "Key"), rsp.hexval(r, "IV"),
                          rsp.hexval(r, "AAD"), rsp.hexval(r, "PT"),
                          tag_len=taglen)
        assert out == rsp.hexval(r, "CT") + rsp.hexval(r, "Tag")
