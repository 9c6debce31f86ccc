"""Dissect chain_packed_fused: kernel alone vs XLA-side stream transforms.

Run from the repo root: python tools/profile_chain.py (real TPU).
Evidence base for the chain-gap analysis in BASELINE.md.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from micro_aes_tpu.core.bitslice import key_planes_packed, pack_planes
from micro_aes_tpu.modes.bulk import stack_round_keys
from micro_aes_tpu.ops import pallas_chain as pc
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = bytes(range(32))
bm, nb = 4096, 256
kpw = jnp.asarray(key_planes_packed(stack_round_keys([key] * bm)))
ivs = jnp.zeros((bm, 16), jnp.uint8)
blocks0 = jnp.zeros((bm, nb, 16), jnp.uint8)
nbytes = bm * nb * 16
w = bm // 32
tile = pc._tile_for(w)
rounds = kpw.shape[0] - 1


def timeit(name, fn, x0, denom=nbytes, r1=2, r2=8):
    res = {}
    for r in (r1, r2):
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, r, lambda _, c: fn(c), x)
        jax.tree_util.tree_map(lambda v: v.block_until_ready(), loop(x0))
        ts = []
        for k in range(3):
            xv = x0 + x0.dtype.type((16 * r + k) % 251 + 1)
            xv.block_until_ready()
            t0 = time.time()
            jax.tree_util.tree_map(lambda v: v.block_until_ready(), loop(xv))
            ts.append(time.time() - t0)
        res[r] = sorted(ts)[1]
    slope = (res[r2] - res[r1]) / (r2 - r1)
    print(f"{name:44s} {slope*1e3:9.3f} ms/iter  {denom/max(slope,1e-12)/1e9:8.2f} GB/s")
    return slope


# 1. full wrapper
timeit("chain_packed_fused (full wrapper)",
       lambda c: pc.chain_packed_fused("cbc", kpw, ivs, c), blocks0)

# 2. kernel alone on pre-built stream
kpw2 = pc._to_rm(kpw.reshape(-1, w))
c2 = pc._to_rm(pack_planes(ivs).reshape(128, w))
x0 = jnp.zeros((nb, 128, w), jnp.uint32)


def kernel_only(x):
    return pl.pallas_call(
        functools.partial(pc._chain_kernel, "cbc", rounds),
        out_shape=jax.ShapeDtypeStruct((nb, 128, w), jnp.uint32),
        grid=(w // tile, nb),
        in_specs=[
            pl.BlockSpec((kpw2.shape[0], tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, tile), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, tile), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((128, tile), jnp.uint32)],
        compiler_params=pc._SEQ2,
    )(kpw2, c2, x)


timeit("pallas kernel alone (stream in/out)", kernel_only, x0)

# 3. transform round-trip (to + from, no kernel)
timeit("to+from round-trip (no kernel)",
       lambda c: pc._from_wordstream(pc._to_wordstream(c)), blocks0)
