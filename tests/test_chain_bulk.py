"""Multi-message batch engines (modes/chain_bulk) vs the per-message
modes as oracle, across ragged lengths, CTS, padding, and mixed keys."""
import numpy as np
import pytest

from micro_aes_tpu.errors import DataLengthError
from micro_aes_tpu.modes import cbc, cfb, ctr, ecb, ofb
from micro_aes_tpu.modes.chain_bulk import (
    cbc_decrypt_batch,
    cbc_encrypt_batch,
    cfb_decrypt_batch,
    cfb_encrypt_batch,
    ctr_xcrypt_batch,
    ecb_decrypt_batch,
    ecb_encrypt_batch,
    ofb_xcrypt_batch,
)
from micro_aes_tpu.modes.common import PAD_ISO7816, PAD_PKCS7, PAD_ZERO

LENS = [16, 17, 31, 32, 33, 48, 100, 256, 1000]

# In-kernel segment length of the retired fori_loop chain-kernel form;
# nb values straddling it are kept as a historical regression shape.
_CHAIN_SEG = 64


def _mk(rng, lens, keylen=16):
    keys = [rng.integers(0, 256, keylen, dtype=np.uint8).tobytes()
            for _ in lens]
    ivs = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in lens]
    pts = [rng.integers(0, 256, ln, dtype=np.uint8).tobytes() for ln in lens]
    return keys, ivs, pts


@pytest.mark.parametrize("keylen", [16, 32])
def test_cbc_cts_batch_roundtrip(keylen):
    rng = np.random.default_rng(31)
    keys, ivs, pts = _mk(rng, LENS, keylen)
    outs = cbc_encrypt_batch(keys, ivs, pts, cts=True)
    for i in range(len(pts)):
        assert outs[i] == cbc.cbc_encrypt(keys[i], ivs[i], pts[i], cts=True), \
            f"CBC-CTS len={LENS[i]}"
    backs = cbc_decrypt_batch(keys, ivs, outs, cts=True)
    assert backs == pts


@pytest.mark.parametrize("padding", [PAD_ZERO, PAD_PKCS7, PAD_ISO7816])
def test_cbc_padded_batch(padding):
    rng = np.random.default_rng(32)
    keys, ivs, pts = _mk(rng, [16, 32, 100, 240])
    outs = cbc_encrypt_batch(keys, ivs, pts, cts=False, padding=padding)
    for i in range(len(pts)):
        assert outs[i] == cbc.cbc_encrypt(keys[i], ivs[i], pts[i],
                                          cts=False, padding=padding)
    backs = cbc_decrypt_batch(keys, ivs, outs, cts=False)
    for i, p in enumerate(pts):
        assert backs[i][: len(p)] == p  # padding not stripped, like the ref


def test_cbc_cts_too_short():
    with pytest.raises(DataLengthError):
        cbc_encrypt_batch([b"k" * 16], [b"i" * 16], [b"short"], cts=True)


def test_cfb_batch_matches_single():
    rng = np.random.default_rng(33)
    keys, ivs, pts = _mk(rng, [0, 1, 15] + LENS)
    outs = cfb_encrypt_batch(keys, ivs, pts)
    for i in range(len(pts)):
        assert outs[i] == cfb.cfb_encrypt(keys[i], ivs[i], pts[i]), \
            f"CFB len={len(pts[i])}"
    backs = cfb_decrypt_batch(keys, ivs, outs)
    assert backs == pts


def test_ofb_batch_matches_single():
    rng = np.random.default_rng(34)
    keys, ivs, pts = _mk(rng, [0, 1, 15] + LENS, keylen=32)
    outs = ofb_xcrypt_batch(keys, ivs, pts)
    for i in range(len(pts)):
        assert outs[i] == ofb.ofb_encrypt(keys[i], ivs[i], pts[i])
    assert ofb_xcrypt_batch(keys, ivs, outs) == pts


def test_ecb_batch_matches_single():
    rng = np.random.default_rng(35)
    keys, _, pts = _mk(rng, [16, 17, 32, 100])
    outs = ecb_encrypt_batch(keys, pts, padding=PAD_PKCS7)
    for i in range(len(pts)):
        assert outs[i] == ecb.ecb_encrypt(keys[i], pts[i], padding=PAD_PKCS7)
    backs = ecb_decrypt_batch(keys, outs)
    for i, p in enumerate(pts):
        assert backs[i][: len(p)] == p


def test_ctr_batch_matches_single():
    rng = np.random.default_rng(36)
    keys, _, pts = _mk(rng, [0, 1] + LENS)
    nonces = [rng.integers(0, 256, 12, dtype=np.uint8).tobytes()
              for _ in pts]
    outs = ctr_xcrypt_batch(keys, nonces, pts)
    for i in range(len(pts)):
        assert outs[i] == ctr.ctr_encrypt(keys[i], nonces[i], pts[i]), \
            f"CTR len={len(pts[i])}"
    assert ctr_xcrypt_batch(keys, nonces, outs) == pts
    # preset-counter variant (full 16-byte IV)
    fulls = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
             for _ in pts]
    outs = ctr_xcrypt_batch(keys, fulls, pts, preset_counter=True)
    for i in range(len(pts)):
        assert outs[i] == ctr.ctr_encrypt(keys[i], fulls[i], pts[i],
                                          preset_counter=True)


def test_cipher_blocks_multikey_mixed_key_sizes():
    """Direct helper check: a batch mixing AES-128/192/256 keys must
    split into per-size groups (round counts differ) and still match the
    per-message oracle."""
    import numpy as np

    from micro_aes_tpu.core.cipher import encrypt_blocks
    from micro_aes_tpu.core.keyschedule import expand_key
    from micro_aes_tpu.modes.bulk import cipher_blocks_multikey
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    keys = [bytes(rng.integers(0, 256, klen, dtype=np.uint8))
            for klen in (16, 32, 24, 16)]
    blocks = rng.integers(0, 256, (4, 5, 16), dtype=np.uint8)
    got = cipher_blocks_multikey(keys, blocks)
    for i, k in enumerate(keys):
        exp = np.asarray(encrypt_blocks(jnp.asarray(expand_key(k)),
                                        jnp.asarray(blocks[i])))
        assert np.array_equal(got[i], exp), i


def test_packed_chain_scans_match_vmapped():
    """The lane-packed bitsliced chain engines (TPU path: 32 messages
    per word, per-lane keys) are bit-exact vs the vmapped per-message
    scans (CPU path) — mixed per-lane keys, ragged batch (B % 32 != 0
    exercises the pad), CBC/CFB/OFB."""
    import os

    from micro_aes_tpu.modes.chain_bulk import (
        cbc_encrypt_batch,
        cfb_encrypt_batch,
        ofb_xcrypt_batch,
    )

    rng = np.random.default_rng(21)
    nmsg = 5
    keys = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
            for _ in range(nmsg)]
    ivs = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
           for _ in range(nmsg)]
    pts = [rng.integers(0, 256, ln, dtype=np.uint8).tobytes()
           for ln in (16, 33, 64, 100, 160)]

    runs = {}
    for forced in ("0", "1"):
        os.environ["MICRO_AES_CHAIN_BITSLICE"] = forced
        try:
            runs[forced] = (cbc_encrypt_batch(keys, ivs, pts),
                            cfb_encrypt_batch(keys, ivs, pts),
                            ofb_xcrypt_batch(keys, ivs, pts))
        finally:
            del os.environ["MICRO_AES_CHAIN_BITSLICE"]
    assert runs["0"] == runs["1"]


@pytest.mark.quick
def test_chain_kernel_interpret_matches_scan():
    """The VMEM-resident Pallas chain kernel (interpret mode off-TPU)
    is bit-exact vs the lane-packed scan twins for CBC/CFB/OFB —
    per-lane keys, nb spanning multiple kernel segments."""
    import jax.numpy as jnp

    from micro_aes_tpu.core.bitslice import key_planes_packed
    from micro_aes_tpu.modes._scan import (
        cbc_encrypt_scan_packed,
        cfb_encrypt_scan_packed,
        ofb_keystream_scan_packed,
    )
    from micro_aes_tpu.modes.bulk import stack_round_keys
    from micro_aes_tpu.ops.pallas_chain import chain_packed_fused

    rng = np.random.default_rng(31)
    b, nb = 32, _CHAIN_SEG + 3  # spans the former in-kernel segment bound
    keys = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
            for _ in range(b)]
    kpw = jnp.asarray(key_planes_packed(stack_round_keys(keys)))
    ivs = jnp.asarray(rng.integers(0, 256, (b, 16), dtype=np.uint8))
    blocks = jnp.asarray(rng.integers(0, 256, (b, nb, 16), dtype=np.uint8))

    from micro_aes_tpu.ops.pallas_chain import ofb_packed_fused

    for kind, scan in (("cbc", cbc_encrypt_scan_packed),
                       ("cfb", cfb_encrypt_scan_packed),
                       ("ofb", None)):
        if kind == "ofb":
            got = np.asarray(ofb_packed_fused(kpw, ivs, nb))
            want = np.asarray(ofb_keystream_scan_packed(
                kpw, ivs, jnp.zeros(nb, jnp.uint8)))
        else:
            got = np.asarray(chain_packed_fused(kind, kpw, ivs, blocks))
            want = np.asarray(scan(kpw, ivs, blocks))
        assert np.array_equal(got, want), kind


@pytest.mark.quick
def test_cbcmac_kernel_interpret_matches_fold():
    """The lane-packed masked CBC-MAC kernel (the TPU path behind every
    batched CMAC/CCM/EAX/SIV tag fold) is bit-exact vs the vmapped scan
    fold — per-lane keys, ragged nvalid including zero, nb spanning
    kernel segments."""
    import jax.numpy as jnp

    from micro_aes_tpu.core.bitslice import key_planes_packed
    from micro_aes_tpu.modes.bulk import stack_round_keys
    from micro_aes_tpu.ops.mac import cbcmac_fold_batch
    from micro_aes_tpu.ops.pallas_chain import cbcmac_packed_fused

    rng = np.random.default_rng(41)
    b, nb = 32, _CHAIN_SEG + 2
    keys = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
            for _ in range(b)]
    rks = stack_round_keys(keys)
    kpw = jnp.asarray(key_planes_packed(rks))
    init = rng.integers(0, 256, (b, 16), dtype=np.uint8)
    blocks = rng.integers(0, 256, (b, nb, 16), dtype=np.uint8)
    nvalid = rng.integers(0, nb + 1, b, dtype=np.int32)
    nvalid[0], nvalid[1] = 0, nb  # edge lanes

    got = np.asarray(cbcmac_packed_fused(kpw, jnp.asarray(init),
                                         jnp.asarray(blocks),
                                         jnp.asarray(nvalid)))
    want = np.asarray(cbcmac_fold_batch(jnp.asarray(rks), jnp.asarray(init),
                                        jnp.asarray(blocks),
                                        jnp.asarray(nvalid)))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("kind,decrypt", [
    pytest.param("ccm", False, marks=pytest.mark.quick),
    pytest.param("ccm", True, marks=pytest.mark.full),
    pytest.param("eax", False, marks=pytest.mark.quick),
    pytest.param("eax", True, marks=pytest.mark.full),
])
def test_aead_chain_kernel_interpret_matches_composition(kind, decrypt):
    # default tier covers both MAC sides (CCM seal folds input, EAX seal
    # folds output) and whiten on/off; the two open directions run
    # nightly (-m full) — each param costs a ~90 s interpret compile on
    # the 2-core CI box
    """The fused CTR+CBC-MAC kernel (one VMEM pass: keystream xor AND
    the auth fold, VERDICT r4 item 1) is bit-exact vs the composition of
    the primitives it replaces: counter_blocks('be') + vmapped cipher +
    cbcmac_fold_batch with the final-block tail/lastadd transform."""
    import jax
    import jax.numpy as jnp

    from micro_aes_tpu.core.bitslice import key_planes_packed
    from micro_aes_tpu.core.cipher import encrypt_blocks
    from micro_aes_tpu.modes.bulk import stack_round_keys
    from micro_aes_tpu.ops.counter import counter_blocks
    from micro_aes_tpu.ops.mac import cbcmac_fold_batch
    from micro_aes_tpu.ops.pallas_chain import aead_chain_fused

    rng = np.random.default_rng(47)
    b, nb = 32, 5
    keys = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
            for _ in range(b)]
    rks = stack_round_keys(keys)
    kpw = jnp.asarray(key_planes_packed(rks))
    c0 = rng.integers(0, 256, (b, 16), dtype=np.uint8)
    c0[2, 9:] = 0xFF  # exercise the 56-bit carry window edge
    init = rng.integers(0, 256, (b, 16), dtype=np.uint8)
    blocks = rng.integers(0, 256, (b, nb, 16), dtype=np.uint8)
    nvalid = rng.integers(0, nb + 1, b).astype(np.int32)
    nvalid[0], nvalid[1] = 0, nb  # edge lanes
    tail = rng.integers(0, 256, (b, 16), dtype=np.uint8)
    lastadd = rng.integers(0, 256, (b, 16), dtype=np.uint8)

    got_out, got_tag = aead_chain_fused(
        kind, kpw, jnp.asarray(c0), jnp.asarray(init), jnp.asarray(blocks),
        jnp.asarray(nvalid), jnp.asarray(tail), jnp.asarray(lastadd),
        decrypt=decrypt)
    got_out, got_tag = np.asarray(got_out), np.asarray(got_tag)

    whiten = kind == "ccm"
    mac_from_input = (kind == "ccm") != decrypt
    nctr = nb + (1 if whiten else 0)
    ctrs = jax.vmap(lambda base: counter_blocks(base, nctr, 0, "be"))(
        jnp.asarray(c0))
    ks_all = np.asarray(jax.vmap(encrypt_blocks)(jnp.asarray(rks), ctrs))
    ks = ks_all[:, 1:] if whiten else ks_all
    want_out = blocks ^ ks
    macsrc = (blocks if mac_from_input else want_out).copy()
    for i in range(b):
        if nvalid[i]:
            j = nvalid[i] - 1
            macsrc[i, j] = (macsrc[i, j] & tail[i]) ^ lastadd[i]
    mac = np.asarray(cbcmac_fold_batch(
        jnp.asarray(rks), jnp.asarray(init), jnp.asarray(macsrc),
        jnp.asarray(nvalid)))
    want_tag = (ks_all[:, 0] ^ mac) if whiten else mac
    assert np.array_equal(got_out, want_out), "stream mismatch"
    assert np.array_equal(got_tag, want_tag), "tag mismatch"


@pytest.mark.full
def test_wide_chain_kernels_match_legacy():
    """Wide-layout chain kernels (one 2D transpose + in-kernel lane
    slicing, VERDICT r4 item 2) vs the legacy interleave wrappers:
    bit-equality for CBC/CFB/OFB with per-lane keys."""
    import jax.numpy as jnp

    from micro_aes_tpu.core.bitslice import key_planes_packed
    from micro_aes_tpu.modes.bulk import stack_round_keys
    from micro_aes_tpu.ops.pallas_chain import (
        chain_packed_fused,
        chain_packed_fused_wide,
        ofb_packed_fused,
        ofb_packed_fused_wide,
        wide_ok,
        wide_perm,
    )

    rng = np.random.default_rng(53)
    b, nb = 2048, 3  # w=64 -> tile 64: multi-j lane splits exercised
    assert wide_ok(b)
    keys = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
            for _ in range(b)]
    rks = stack_round_keys(keys)
    kpw = jnp.asarray(key_planes_packed(rks))
    kpw_w = jnp.asarray(key_planes_packed(rks[wide_perm(b)]))
    ivs = jnp.asarray(rng.integers(0, 256, (b, 16), dtype=np.uint8))
    blocks = jnp.asarray(rng.integers(0, 256, (b, nb, 16), dtype=np.uint8))

    for kind in ("cbc", "cfb"):
        want = np.asarray(chain_packed_fused(kind, kpw, ivs, blocks))
        got = np.asarray(chain_packed_fused_wide(kind, kpw_w, ivs, blocks))
        assert np.array_equal(got, want), kind
    want = np.asarray(ofb_packed_fused(kpw, ivs, nb))
    got = np.asarray(ofb_packed_fused_wide(kpw_w, ivs, nb))
    assert np.array_equal(got, want)
