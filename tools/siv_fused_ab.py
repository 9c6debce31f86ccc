"""Same-process A/B: composed SIV batch seal (cbcmac_packed_fused +
ctr_packed_fused, the r5 committed engine) vs the fused single-pallas_call
S2V+CTR kernels, device-resident 4096 x 4 KiB.  Run on TPU:

    python tools/siv_fused_ab.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from micro_aes_tpu.core.bitslice import key_planes_packed
from micro_aes_tpu.modes.bulk import _eax_subkeys, stack_round_keys
from micro_aes_tpu.ops.gf128 import double_be
from micro_aes_tpu.ops.pallas_chain import (
    cbcmac_packed_fused,
    ctr_packed_fused,
    siv_open_chain_fused,
    siv_seal_chain_fused,
)

B, NB = 4096, 256  # 4 KiB messages, 16 MiB payload
NBYTES = B * NB * 16

rng = np.random.default_rng(29)
keys = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in range(B)]
rks = stack_round_keys(keys)
rksj = jnp.asarray(rks)
kpw = jnp.asarray(key_planes_packed(rks))
zeros16 = jnp.zeros((B, 16), jnp.uint8)
d_np, q_np = _eax_subkeys(rksj, B)
d = jnp.asarray(np.asarray(d_np))
q = jnp.asarray(np.asarray(q_np))
one = jnp.ones(B, jnp.int32)
nv = jnp.full(B, NB, jnp.int32)
onehot = (jnp.arange(NB)[None, :, None] == NB - 1).astype(jnp.uint8)
y0blk = d[:, None, :]  # CMAC(0^16): single whole block 0 ^ D
aadblk = jnp.zeros((B, 1, 16), jnp.uint8)
aadblk = aadblk.at[:, 0, :3].set(
    jnp.broadcast_to(jnp.asarray(np.frombuffer(b"hdr", np.uint8)), (B, 3)))
aadblk = aadblk.at[:, 0, 3].set(aadblk[:, 0, 3] ^ 0x80)
aadblk = aadblk ^ q[:, None, :]
ones16 = jnp.full((B, 16), 0xFF, jnp.uint8)
zerosb = jnp.zeros((B, 16), jnp.uint8)


def s2v_y():
    y0 = cbcmac_packed_fused(kpw, zeros16, y0blk, one)
    amac = cbcmac_packed_fused(kpw, zeros16, aadblk, one)
    return double_be(y0) ^ amac


def composed_seal(ptj):
    y = s2v_y()
    lastadd = (y ^ d)[:, None, :] * onehot
    iv = cbcmac_packed_fused(kpw, zeros16, ptj ^ lastadd, nv)
    bases = iv.at[:, 8].set(iv[:, 8] & 0x7F)
    bases = bases.at[:, 12].set(bases[:, 12] & 0x7F)
    ct = ctr_packed_fused(kpw, bases, ptj)
    return ct ^ iv[:, None, :]


def fused_seal(ptj):
    y = s2v_y()
    ct, iv = siv_seal_chain_fused(kpw, kpw, zeros16, ptj, nv, ones16,
                                  y ^ d, zerosb)
    return ct ^ iv[:, None, :]


def composed_open(ctj):
    # keystream from a fixed base + pt CMAC re-synthesis (verify glue
    # excluded on both sides)
    y = s2v_y()
    bases = ctj[:, 0, :]
    pt = ctr_packed_fused(kpw, bases, ctj)
    lastadd = (y ^ d)[:, None, :] * onehot
    s2v = cbcmac_packed_fused(kpw, zeros16, pt ^ lastadd, nv)
    return pt ^ s2v[:, None, :]


def fused_open(ctj):
    y = s2v_y()
    pt, s2v = siv_open_chain_fused(kpw, kpw, ctj[:, 0, :], zeros16, ctj,
                                   nv, ones16, y ^ d, zerosb)
    return pt ^ s2v[:, None, :]


def rate(step, x0):
    def make(reps):
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(
                0, reps, lambda _, c: jax.lax.optimization_barrier(step(c)),
                x)
        return loop

    res = {}
    for r in (4, 16):
        loop = make(r)
        loop(x0).block_until_ready()
        ts = []
        for k in range(3):
            xv = x0 + np.uint8((16 * r + k) % 251 + 1)
            xv.block_until_ready()
            t0 = time.time()
            loop(xv).block_until_ready()
            ts.append(time.time() - t0)
        res[r] = sorted(ts)[1]
    slope = (res[16] - res[4]) / 12
    return NBYTES / max(slope, 1e-9)


def main():
    print("backend:", jax.default_backend())
    pt0 = jnp.zeros((B, NB, 16), jnp.uint8)
    # parity first (small slice comparison on-device)
    c1 = composed_seal(pt0)
    c2 = fused_seal(pt0)
    assert bool(jnp.array_equal(c1, c2)), "seal parity FAILED"
    o1 = composed_open(pt0)
    o2 = fused_open(pt0)
    assert bool(jnp.array_equal(o1, o2)), "open parity FAILED"
    print("parity ok")
    for name, fn in [("composed seal", composed_seal),
                     ("fused seal", fused_seal),
                     ("composed open", composed_open),
                     ("fused open", fused_open)]:
        r = rate(fn, pt0)
        print(f"{name:15s} {r/1e9:6.2f} GB/s")


if __name__ == "__main__":
    main()
