"""Segmented value-chain multi-key GCM engine (modes/seal_batch
gcm_*_batch_chain + ops/pallas_chain.gcm_chain_fused): differential
equality against the scalar GCM through the interpret-mode kernel,
driven by forcing the gate (MICRO_AES_GCM_CHAIN=1).

Exercises the segment machinery directly: right-aligned virtual lanes
(leading zeros fold free), uniform-exponent source masking, the AAD-fold
injection at each message's first data position, the fused power-table
combine, empty messages whose AAD enters via the length multiply, and
batch padding for 32-lane alignment."""
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _force_chain(monkeypatch):
    monkeypatch.setenv("MICRO_AES_GCM_CHAIN", "1")


def _drive(monkeypatch, lanes_target, lens, klen, seed):
    import micro_aes_tpu.modes.seal_batch as sb
    from micro_aes_tpu.modes.gcm import gcm_encrypt

    monkeypatch.setattr(sb, "_CHAIN_LANES", lanes_target)
    rng = np.random.default_rng(seed)
    B = len(lens)
    keys = [rng.integers(0, 256, klen, dtype=np.uint8).tobytes()
            for _ in range(B)]
    nonces = [rng.integers(0, 256, 12, dtype=np.uint8).tobytes()
              for _ in range(B)]
    aads = [rng.integers(0, 256, (7 * i) % 29, dtype=np.uint8).tobytes()
            for i in range(B)]
    pts = [rng.integers(0, 256, n, dtype=np.uint8).tobytes() for n in lens]
    got = sb.gcm_seal_batch(keys, nonces, aads, pts)
    for i in range(B):
        assert got[i] == gcm_encrypt(keys[i], nonces[i], aads[i], pts[i]), \
            f"chain seal mismatch at len={lens[i]}"
    backs = sb.gcm_open_batch(keys, nonces, aads, got)
    assert backs == pts
    bad = [got[0][:-1] + bytes([got[0][-1] ^ 1])] + list(got[1:])
    backs2 = sb.gcm_open_batch(keys, nonces, aads, bad)
    assert backs2[0] is None and backs2[1:] == pts[1:]


def test_chain_unsegmented(monkeypatch):
    """S = nb (one block per segment) and the no-split S=1 regime."""
    _drive(monkeypatch, 4096, [0, 16, 48, 160, 320], 16, 7)
    _drive(monkeypatch, 1, [64, 32], 16, 8)


def test_chain_segmented_l_gt_1(monkeypatch):
    """L > 1 segmentation: leading-zero lanes, mid-segment injection."""
    _drive(monkeypatch, 8, [96, 64, 16, 112], 16, 9)
    _drive(monkeypatch, 8, [0, 128, 0, 64, 16], 16, 10)


def test_chain_aes256(monkeypatch):
    _drive(monkeypatch, 8, [80, 80, 80], 32, 11)
