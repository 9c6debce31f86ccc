"""Same-process A/B of SEAL_TILE_W for the fused seal/CTR kernels.

Run from the repo root: python tools/tile_ab.py (real TPU).  Clears jit
caches between variants so each tile width actually re-lowers.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from micro_aes_tpu.modes.seal import (
    _trail_adjust_t,
    fused_trailing_pad,
    gcm_key_setup,
    gcm_seal_stream_fused,
    seal_stream_words,
)
import micro_aes_tpu.ops.pallas_seal as ps

key = bytes(range(32))
n_blocks = 1 << 20
nbytes = n_blocks * 16
j0 = np.zeros(16, np.uint8)
j0[:12] = np.arange(12, dtype=np.uint8)
j0[15] = 1


def marginal(step, x0, r1=8, r2=40):
    res = {}
    for r in (r1, r2):
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, r, lambda _, c: step(c), x)
        loop(x0).block_until_ready()
        ts = []
        for k in range(3):
            xv = x0 + np.uint32(16 * r + k + 1)
            xv.block_until_ready()
            t0 = time.time()
            loop(xv).block_until_ready()
            ts.append(time.time() - t0)
        res[r] = sorted(ts)[1]
    return nbytes / max((res[r2] - res[r1]) / (r2 - r1), 1e-9)


for tile in (512, 256, 128, 1024):
    ps.SEAL_TILE_W = tile
    jax.clear_caches()
    kp, tables = gcm_key_setup(key)
    w = seal_stream_words(n_blocks)
    adj = _trail_adjust_t(key, fused_trailing_pad(n_blocks))
    ptw0 = jnp.zeros((w, 128), jnp.uint32)
    j0j = jnp.asarray(j0)

    def seal_step(c):
        ctw, tag = gcm_seal_stream_fused(kp, tables, adj, j0j, c, n_blocks)
        return ctw

    rate = marginal(seal_step, ptw0)
    print(f"TILE={tile:5d}  GCM seal {rate/1e9:6.2f} GB/s", flush=True)
