"""On-TPU A/B for VERDICT r4 item 4: the fused GCM seal with the stream
kept TRANSPOSED end-to-end ([128, W] resident) vs the committed form
(w-major [W, 128] + two in-kernel VMEM transposes per tile).  If the
transposed form wins, multi-pass engines (GCM-SIV seal) can hold their
intermediates in it for free."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import benchmarks as _bm
from micro_aes_tpu.modes.seal import (
    _trail_adjust_t,
    fused_trailing_pad,
    gcm_key_setup,
    gcm_seal_stream_fused,
    seal_stream_words,
)
from micro_aes_tpu.ops import pallas_seal as ps

key = bytes(range(32))
kp, tables = gcm_key_setup(key)
n_blocks = 1 << 20
nbytes = n_blocks * 16
j0 = np.zeros(16, np.uint8)
j0[:12] = np.arange(12, dtype=np.uint8)
j0[15] = 1
w = seal_stream_words(n_blocks)
adj = _trail_adjust_t(key, fused_trailing_pad(n_blocks))


def timeit(name, fn, x0, r1=8, r2=40):
    def make(reps):
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, reps, lambda _, c: fn(c), x)
        return loop
    rate = _bm._marginal_rate(make, x0, nbytes, r1=r1, r2=r2)
    print(f"{name:52s} {rate/1e9:8.2f} GB/s", flush=True)
    return rate


print("backend:", jax.default_backend(), flush=True)


# --- transposed-stream seal kernel: blocks are (128, TILE) of a
# [128, W] array; no in-kernel transposes at all
def _seal_kernel_t(rounds, bits_from_input, kp_ref, j0c_ref, lohi_ref,
                   ghm_ref, w1t_ref, ptw_ref, ctw_ref, s1_ref):
    out128, s1 = ps._seal_math(rounds, bits_from_input, kp_ref, j0c_ref,
                               lohi_ref[:], ghm_ref[0:1, :], w1t_ref[:],
                               ptw_ref[:])
    ctw_ref[:] = out128
    s1_ref[:] = s1


@functools.partial(jax.jit, static_argnames=("bits_from_input",))
def seal_fused_t(kp_flat, j0_const, lohi, ghmask, w1t, pt_t,
                 bits_from_input=False):
    rounds = kp_flat.shape[0] // 128 - 1
    wv = lohi.shape[-1]
    T = ps.SEAL_TILE_W
    return pl.pallas_call(
        functools.partial(_seal_kernel_t, rounds, bits_from_input),
        out_shape=(jax.ShapeDtypeStruct((128, wv), jnp.uint32),
                   jax.ShapeDtypeStruct((128, wv), jnp.int8)),
        grid=(wv // T,),
        in_specs=[
            pl.BlockSpec((kp_flat.shape[0], 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 4096), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((128, T), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((128, T), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
    )(ps._kp_rm(kp_flat), j0_const, lohi, ghmask, w1t, pt_t)


# setup mirrors modes/seal.fused_seal_stream
from micro_aes_tpu.ops.ghash_bulk import _gf2_matmul_i8

n = n_blocks
b32 = jnp.asarray(j0).astype(jnp.uint32)
j0_lo = (b32[12] << 24) | (b32[13] << 16) | (b32[14] << 8) | b32[15]
j0_hi = (b32[9] << 16) | (b32[10] << 8) | b32[11]
s32 = jnp.int32(-1)
sext = (s32 >> 31).astype(jnp.uint32)
lo0 = j0_lo + s32.astype(jnp.uint32)
carry0 = (lo0 < j0_lo).astype(jnp.uint32)
widx = jnp.arange(w, dtype=jnp.uint32) * 32
lo = lo0 + widx
hi = (j0_hi + sext + carry0 + (lo < lo0).astype(jnp.uint32)) & 0xFFFFFF
lohi = jnp.stack([lo, hi])
bits_j0 = (np.asarray(j0)[:, None] >> np.arange(8)) & 1
j0c = jnp.asarray(bits_j0.T.reshape(128, 1).astype(np.uint32)
                  * np.uint32(0xFFFFFFFF))
pv = np.zeros(32 * w, dtype=np.uint64)
pv[2: n + 2] = 1
ghm = np.zeros(w, np.uint32)
for j in range(32):
    ghm |= (pv[j::32].astype(np.uint32) << j)
ghmask = jnp.asarray(ghm[None, :])
w1t = jnp.transpose(tables[0]).astype(jnp.int8)
kp_flat = kp.reshape(-1, 1)

rng = np.random.default_rng(7)
pt = jnp.asarray(rng.integers(0, 2**32, (w, 128), dtype=np.uint32))
ct_a, s1_a = ps.seal_fused(kp_flat, j0c, lohi, ghmask, w1t, pt)
ct_b, s1_b = seal_fused_t(kp_flat, j0c, lohi, ghmask, w1t,
                          jnp.transpose(pt))
ok = (np.array_equal(np.asarray(jnp.transpose(ct_b)), np.asarray(ct_a))
      and np.array_equal(np.asarray(s1_b), np.asarray(s1_a)))
print("transposed seal == committed seal:", ok, flush=True)

pt0 = jnp.zeros((w, 128), jnp.uint32)
pt0t = jnp.zeros((128, w), jnp.uint32)
timeit("committed seal ([W,128] + in-kernel transposes)",
       lambda c: ps.seal_fused(kp_flat, j0c, lohi, ghmask, w1t, c)[0],
       pt0)
timeit("transposed seal ([128,W] resident, no transposes)",
       lambda c: seal_fused_t(kp_flat, j0c, lohi, ghmask, w1t, c)[0],
       pt0t)
