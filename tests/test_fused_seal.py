"""Fused seal/open engine coverage off-TPU (VERDICT r1 items 3/4/8):

* the jnp twin (seal_fused_jnp) drives the full fused orchestration —
  trailing-pad compensation, AAD shift, open direction — on CPU;
* the Pallas kernel itself runs once in interpret mode and must equal
  the twin bit-for-bit (same math, different lowering);
* the *sharded* fused engine (gcm_sharded_fused_fn) runs on the
  8-virtual-device mesh, both directions, with and without AAD.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micro_aes_tpu.modes.gcm import gcm_decrypt, gcm_encrypt
from micro_aes_tpu.modes.seal import gcm_key_setup, gcm_open, gcm_seal
from micro_aes_tpu.modes.common import enc_blocks_np
from micro_aes_tpu.errors import AuthenticationError
from micro_aes_tpu.parallel.mesh import make_mesh
from micro_aes_tpu.parallel.sharded import (
    gcm_sharded_fused_fn,
    shard_adjust_matrices_fused,
    sharded_aad_args,
)
from micro_aes_tpu.utils.bytesio import BLOCK


def _j0(nonce: bytes) -> np.ndarray:
    j = np.zeros(BLOCK, np.uint8)
    j[:12] = np.frombuffer(nonce, np.uint8)
    j[15] = 1
    return j


class TestFusedOrchestration:
    """gcm_seal/gcm_open now run the fused path on every backend."""

    KEY = bytes(range(32))
    NONCE = bytes(range(12))

    @pytest.mark.parametrize("nblocks", [1, 33, 257])
    def test_seal_matches_host_gcm(self, nblocks):
        rng = np.random.default_rng(nblocks)
        pt = rng.integers(0, 256, nblocks * BLOCK, dtype=np.uint8).tobytes()
        assert gcm_seal(self.KEY, self.NONCE, pt) == \
            gcm_encrypt(self.KEY, self.NONCE, b"", pt)

    @pytest.mark.parametrize("alen", [1, 16, 100])
    def test_seal_with_aad_matches_host_gcm(self, alen):
        rng = np.random.default_rng(alen)
        pt = rng.integers(0, 256, 48 * BLOCK, dtype=np.uint8).tobytes()
        aad = rng.integers(0, 256, alen, dtype=np.uint8).tobytes()
        assert gcm_seal(self.KEY, self.NONCE, pt, aad=aad) == \
            gcm_encrypt(self.KEY, self.NONCE, aad, pt)

    def test_open_roundtrip_and_reject(self):
        rng = np.random.default_rng(5)
        pt = rng.integers(0, 256, 64 * BLOCK, dtype=np.uint8).tobytes()
        blob = gcm_seal(self.KEY, self.NONCE, pt, aad=b"hdr")
        assert gcm_open(self.KEY, self.NONCE, blob, aad=b"hdr") == pt
        bad = blob[:-1] + bytes([blob[-1] ^ 1])
        with pytest.raises(AuthenticationError):
            gcm_open(self.KEY, self.NONCE, bad, aad=b"hdr")
        with pytest.raises(AuthenticationError):
            gcm_open(self.KEY, self.NONCE, blob, aad=b"other")

    def test_open_matches_host_decrypt(self):
        rng = np.random.default_rng(6)
        pt = rng.integers(0, 256, 33 * BLOCK, dtype=np.uint8).tobytes()
        blob = gcm_encrypt(self.KEY, self.NONCE, b"", pt)
        assert gcm_open(self.KEY, self.NONCE, blob) == pt
        assert gcm_decrypt(self.KEY, self.NONCE, b"", blob) == pt


@pytest.mark.parametrize("dp,sp", [(2, 4), (1, 8)])
@pytest.mark.parametrize("use_aad", [False, True])
def test_sharded_fused_seal_and_open(dp, sp, use_aad):
    """The fused sharded engine (the code path a real pod runs) on the
    virtual mesh: seal must equal the host reference, open must invert."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(dp, sp)
    rng = np.random.default_rng(11 + dp)
    key = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    kp, tables = gcm_key_setup(key, chunk=32, chunk2=2)
    n_blocks = sp * 32  # 32 blocks per shard (minimum 32-aligned)
    b = dp * 2
    aad = b"sharded-aad-bytes!" if use_aad else b""
    nonces = [bytes(rng.integers(0, 256, 12, dtype=np.uint8)) for _ in range(b)]
    pts = rng.integers(0, 256, (b, n_blocks, BLOCK), dtype=np.uint8)

    j0 = np.stack([_j0(n) for n in nonces])
    ek_j0 = enc_blocks_np(key, j0)
    adj = shard_adjust_matrices_fused(tables[3], n_blocks // sp, sp, chunk2=2)
    aad_acc, aad_shift_t, alen = sharded_aad_args(key, aad, n_blocks, b)

    seal = gcm_sharded_fused_fn(mesh, n_blocks, aad_bytes=alen)
    ct, tag = seal(kp, tables, adj, jnp.asarray(j0), jnp.asarray(ek_j0),
                   jnp.asarray(pts), aad_acc, aad_shift_t)
    ct, tag = np.asarray(ct), np.asarray(tag)

    for i in range(b):
        expect = gcm_encrypt(key, nonces[i], aad, bytes(pts[i].reshape(-1)))
        got = bytes(ct[i].reshape(-1)) + bytes(tag[i])
        assert got == expect, f"sharded seal msg {i} mismatch ({dp},{sp})"

    # open direction: decrypt the ciphertext, recompute the tag over it
    opener = gcm_sharded_fused_fn(mesh, n_blocks, aad_bytes=alen,
                                  open_direction=True)
    pt2, tag2 = opener(kp, tables, adj, jnp.asarray(j0), jnp.asarray(ek_j0),
                       jnp.asarray(ct), aad_acc, aad_shift_t)
    assert np.array_equal(np.asarray(pt2), pts)
    assert np.array_equal(np.asarray(tag2), tag)


def test_seal_kernel_interpret_matches_jnp_twin():
    """The actual Pallas kernel (interpret mode off-TPU) against the jnp
    twin: same math module, different lowering — must be bit-identical.
    One small W=SEAL_TILE_W tile keeps interpret-mode cost bounded."""
    from micro_aes_tpu.ops.pallas_seal import (
        SEAL_TILE_W,
        seal_fused,
        seal_fused_jnp,
    )

    key = bytes(range(32))
    kp, tables = gcm_key_setup(key)
    kp_flat = kp.reshape(-1, 1)
    w = SEAL_TILE_W
    rng = np.random.default_rng(0)
    lohi = jnp.stack([jnp.arange(w, dtype=jnp.uint32) * 32 + 1,
                      jnp.zeros(w, jnp.uint32)])
    ghm = jnp.asarray(rng.integers(0, 2**32, (1, w), dtype=np.uint32))
    j0c = jnp.asarray(
        (rng.integers(0, 2, (128, 1), dtype=np.uint32) * 0xFFFFFFFF)
        .astype(np.uint32))
    ptw = jnp.asarray(rng.integers(0, 2**32, (w, 128), dtype=np.uint32))
    w1t = jnp.transpose(tables[0]).astype(jnp.int8)

    ctw_k, s1_k = seal_fused(kp_flat, j0c, lohi, ghm, w1t, ptw)
    ctw_j, s1_j = seal_fused_jnp(kp_flat, j0c, lohi, ghm, w1t, ptw)
    assert np.array_equal(np.asarray(ctw_k), np.asarray(ctw_j))
    assert np.array_equal(np.asarray(s1_k), np.asarray(s1_j))
