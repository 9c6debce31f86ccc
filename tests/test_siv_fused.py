"""Fused SIV kernels (ops/pallas_chain.siv_seal_chain_fused /
siv_open_chain_fused): differential equality against the per-message
host path through the interpret-mode kernels, driven by forcing the
bulk-engine gate (MICRO_AES_SIV_FUSED=1).

Covers the S2V last-block algebra the kernels receive as constants
(micro_aes.c:1336-1356): whole-block finals (y ^ D), ragged finals with
the xorend straddle onto the previous block, and sub-block messages
(dbl(y) ^ pad ^ D), plus decrypt-then-verify failure isolation
(micro_aes.c:1404-1408)."""
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _force_fused(monkeypatch):
    monkeypatch.setenv("MICRO_AES_SIV_FUSED", "1")


# lengths exercising every S2V final-block branch: sub-block (incl. the
# 0x80-at-0 empty pad), exact blocks, ragged with straddle, multi-block
_LENS = [0, 1, 5, 15, 16, 17, 31, 32, 33, 47, 48, 100]


@pytest.mark.parametrize("keybytes", [32, 64])
def test_siv_fused_seal_vs_single(keybytes):
    from micro_aes_tpu.modes.bulk import siv_encrypt_batch
    from micro_aes_tpu.modes.siv import siv_encrypt

    rng = np.random.default_rng(17 + keybytes)
    keys = [rng.integers(0, 256, keybytes, dtype=np.uint8).tobytes()
            for _ in _LENS]
    aads = [rng.integers(0, 256, (7 * n) % 37, dtype=np.uint8).tobytes()
            for n in _LENS]
    pts = [rng.integers(0, 256, n, dtype=np.uint8).tobytes() for n in _LENS]
    outs = siv_encrypt_batch(keys, aads, pts)
    for i in range(len(_LENS)):
        assert outs[i] == siv_encrypt(keys[i], aads[i], pts[i]), \
            f"fused SIV seal mismatch at len={_LENS[i]}"


def test_siv_fused_open_roundtrip_and_tamper():
    from micro_aes_tpu.modes.bulk import siv_decrypt_batch, siv_encrypt_batch

    rng = np.random.default_rng(23)
    keys = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
            for _ in _LENS]
    aads = [rng.integers(0, 256, n % 19, dtype=np.uint8).tobytes()
            for n in _LENS]
    pts = [rng.integers(0, 256, n, dtype=np.uint8).tobytes() for n in _LENS]
    outs = siv_encrypt_batch(keys, aads, pts)
    ivs = [iv for iv, _ in outs]
    cts = [ct for _, ct in outs]
    assert siv_decrypt_batch(keys, ivs, aads, cts) == pts
    bad = list(ivs)
    bad[4] = bytes([bad[4][0] ^ 1]) + bad[4][1:]
    backs = siv_decrypt_batch(keys, bad, aads, cts)
    for i in range(len(_LENS)):
        assert backs[i] == (None if i == 4 else pts[i])
