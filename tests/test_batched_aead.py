"""Batched CCM / EAX engines (modes/bulk): full conformance corpora and
randomized differential checks against the per-message host paths."""
import numpy as np
import pytest

from micro_aes_tpu.modes.bulk import (
    ccm_decrypt_batch,
    ccm_encrypt_batch,
    eax_decrypt_batch,
    eax_encrypt_batch,
)
from micro_aes_tpu.modes.ccm import ccm_decrypt, ccm_encrypt
from micro_aes_tpu.modes.eax import eax_decrypt, eax_encrypt
from micro_aes_tpu.testing import rsp


@pytest.mark.parametrize("keylen", [128, 192, 256])
def test_ccm_vnt_batched(keylen):
    recs = rsp.load_ccm(keylen)
    assert len(recs) == 70
    keys = [rsp.hexval(r, "Key") for r in recs]
    nonces = [rsp.hexval(r, "Nonce") for r in recs]
    aads = [rsp.hexval(r, "Adata") for r in recs]
    pts = [rsp.hexval(r, "Payload") for r in recs]
    tlen = len(rsp.hexval(recs[0], "CT")) - len(pts[0])
    outs = ccm_encrypt_batch(keys, nonces, aads, pts, tag_len=tlen)
    for r, out in zip(recs, outs):
        assert out == rsp.hexval(r, "CT"), f"CCM-{keylen} count={r['Count']}"
    backs = ccm_decrypt_batch(keys, nonces, aads, outs, tag_len=tlen)
    for r, back in zip(recs, backs):
        assert back == rsp.hexval(r, "Payload")


def test_ccm_batch_random_vs_single():
    rng = np.random.default_rng(3)
    keys, nonces, aads, pts = [], [], [], []
    for ln in [0, 1, 15, 16, 17, 100, 300]:
        keys.append(rng.integers(0, 256, 16, dtype=np.uint8).tobytes())
        nonces.append(rng.integers(0, 256, 11, dtype=np.uint8).tobytes())
        aads.append(rng.integers(0, 256, (ln * 7) % 60, dtype=np.uint8).tobytes())
        pts.append(rng.integers(0, 256, ln, dtype=np.uint8).tobytes())
    outs = ccm_encrypt_batch(keys, nonces, aads, pts)
    for i in range(len(keys)):
        assert outs[i] == ccm_encrypt(keys[i], nonces[i], aads[i], pts[i])
    tampered = list(outs)
    tampered[2] = tampered[2][:-1] + bytes([tampered[2][-1] ^ 1])
    backs = ccm_decrypt_batch(keys, nonces, aads, tampered)
    for i in range(len(keys)):
        if i == 2:
            assert backs[i] is None
        else:
            assert backs[i] == pts[i]


def test_eax_tv_batched():
    recs = rsp.load_eax()
    assert len(recs) == 10
    keys = [rsp.hexval(r, "KEY") for r in recs]
    nonces = [rsp.hexval(r, "NONCE") for r in recs]
    aads = [rsp.hexval(r, "HEADER") for r in recs]
    pts = [rsp.hexval(r, "MSG") for r in recs]
    outs = eax_encrypt_batch(keys, nonces, aads, pts)
    for r, out in zip(recs, outs):
        assert out == rsp.hexval(r, "CIPHER"), f"EAX count mismatch"
    backs = eax_decrypt_batch(keys, nonces, aads, outs)
    for r, back in zip(recs, backs):
        assert back == rsp.hexval(r, "MSG")


def test_eax_batch_random_vs_single():
    rng = np.random.default_rng(4)
    keys, nonces, aads, pts = [], [], [], []
    for ln in [0, 1, 16, 33, 200]:
        keys.append(rng.integers(0, 256, 16, dtype=np.uint8).tobytes())
        nonces.append(rng.integers(0, 256, 16, dtype=np.uint8).tobytes())
        aads.append(rng.integers(0, 256, (ln * 3) % 40, dtype=np.uint8).tobytes())
        pts.append(rng.integers(0, 256, ln, dtype=np.uint8).tobytes())
    outs = eax_encrypt_batch(keys, nonces, aads, pts)
    for i in range(len(keys)):
        assert outs[i] == eax_encrypt(keys[i], nonces[i], aads[i], pts[i])
    tampered = list(outs)
    tampered[1] = tampered[1][:-1] + bytes([tampered[1][-1] ^ 1])
    backs = eax_decrypt_batch(keys, nonces, aads, tampered)
    for i in range(len(keys)):
        if i == 1:
            assert backs[i] is None
        else:
            assert backs[i] == pts[i]
