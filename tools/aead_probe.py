"""On-TPU smoke + A/B for the fused CCM/EAX chain kernel (round 5)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from micro_aes_tpu.core.bitslice import key_planes_packed
from micro_aes_tpu.core.cipher import encrypt_blocks
from micro_aes_tpu.modes.bulk import stack_round_keys
from micro_aes_tpu.ops.counter import counter_blocks
from micro_aes_tpu.ops.mac import cbcmac_fold_batch
from micro_aes_tpu.ops.pallas_chain import aead_chain_fused


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(47)
    b, nb = 128, 8
    keys = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
            for _ in range(b)]
    rks = stack_round_keys(keys)
    kpw = jnp.asarray(key_planes_packed(rks))
    c0 = rng.integers(0, 256, (b, 16), dtype=np.uint8)
    init = rng.integers(0, 256, (b, 16), dtype=np.uint8)
    blocks = rng.integers(0, 256, (b, nb, 16), dtype=np.uint8)
    nvalid = rng.integers(0, nb + 1, b).astype(np.int32)
    nvalid[0], nvalid[1] = 0, nb
    tail = rng.integers(0, 256, (b, 16), dtype=np.uint8)
    lastadd = rng.integers(0, 256, (b, 16), dtype=np.uint8)

    for kind in ("ccm", "eax"):
        for decrypt in (False, True):
            t0 = time.time()
            got_out, got_tag = aead_chain_fused(
                kind, kpw, jnp.asarray(c0), jnp.asarray(init),
                jnp.asarray(blocks), jnp.asarray(nvalid),
                jnp.asarray(tail), jnp.asarray(lastadd), decrypt=decrypt)
            got_out, got_tag = np.asarray(got_out), np.asarray(got_tag)
            dt = time.time() - t0
            whiten = kind == "ccm"
            mac_from_input = (kind == "ccm") != decrypt
            nctr = nb + (1 if whiten else 0)
            ctrs = jax.vmap(lambda base: counter_blocks(base, nctr, 0, "be"))(
                jnp.asarray(c0))
            ks_all = np.asarray(jax.vmap(encrypt_blocks)(jnp.asarray(rks),
                                                         ctrs))
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
            ok = (np.array_equal(got_out, want_out)
                  and np.array_equal(got_tag, want_tag))
            print(f"{kind} decrypt={decrypt}: ok={ok} compile+run={dt:.1f}s",
                  flush=True)
            if not ok:
                sys.exit(1)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
