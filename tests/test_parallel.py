"""Sharded bulk GCM on the 8-virtual-device CPU mesh: must equal the
conformance-validated single-device path bit-for-bit."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from micro_aes_tpu.modes.gcm import gcm_encrypt
from micro_aes_tpu.modes.seal import gcm_key_setup, gcm_seal
from micro_aes_tpu.modes.common import enc_blocks_np
from micro_aes_tpu.parallel.mesh import make_mesh
from micro_aes_tpu.parallel.sharded import gcm_seal_sharded_fn, shard_adjust_matrices
from micro_aes_tpu.utils.bytesio import BLOCK


def _j0(nonce: bytes) -> np.ndarray:
    j = np.zeros(BLOCK, np.uint8)
    j[:12] = np.frombuffer(nonce, np.uint8)
    j[15] = 1
    return j


@pytest.mark.parametrize("dp,sp", [(2, 4), (1, 8), (4, 2)])
def test_gcm_sharded_matches_reference_path(dp, sp):
    assert len(jax.devices()) >= 8
    mesh = make_mesh(dp, sp)
    rng = np.random.default_rng(7)
    key = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    # tiny GHASH tiles so each shard's length is divisible: chunk=chunk2=2
    kp, tables = gcm_key_setup(key, chunk=32, chunk2=2)
    n_blocks = sp * 64  # 64 blocks per shard (32-aligned, tile=64)
    b = dp * 2
    nonces = [bytes(rng.integers(0, 256, 12, dtype=np.uint8)) for _ in range(b)]
    pts = rng.integers(0, 256, (b, n_blocks, BLOCK), dtype=np.uint8)

    j0 = np.stack([_j0(n) for n in nonces])
    ek_j0 = enc_blocks_np(key, j0)
    m_h = tables[3]
    adj = shard_adjust_matrices(m_h, n_blocks // sp, sp)
    fn = gcm_seal_sharded_fn(mesh, n_blocks)
    ct, tag = fn(kp, tables, adj, jnp.asarray(j0), jnp.asarray(ek_j0),
                 jnp.asarray(pts))
    ct, tag = np.asarray(ct), np.asarray(tag)

    for i in range(b):
        expect = gcm_encrypt(key, nonces[i], b"", bytes(pts[i].reshape(-1)))
        got = bytes(ct[i].reshape(-1)) + bytes(tag[i])
        assert got == expect, f"message {i} mismatch on mesh ({dp},{sp})"


def test_fused_seal_matches_gcm():
    rng = np.random.default_rng(3)
    key = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
    nonce = bytes(rng.integers(0, 256, 12, dtype=np.uint8))
    pt = bytes(rng.integers(0, 256, 16 * 1024, dtype=np.uint8))
    assert gcm_seal(key, nonce, pt) == gcm_encrypt(key, nonce, b"", pt)
