"""On-TPU A/B: legacy interleave chain wrapper vs wide (2D-transpose)
wrapper vs kernel-alone ceiling.  Evidence for VERDICT r4 item 2."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from micro_aes_tpu.core.bitslice import key_planes_packed, pack_planes
from micro_aes_tpu.modes.bulk import stack_round_keys
from micro_aes_tpu.ops import pallas_chain as pc

key = bytes(range(32))
bm, nb = 4096, 256
nbytes = bm * nb * 16
rks = stack_round_keys([key] * bm)
kpw = jnp.asarray(key_planes_packed(rks))
kpw_w = jnp.asarray(key_planes_packed(rks[pc.wide_perm(bm)]))
ivs = jnp.zeros((bm, 16), jnp.uint8)
blocks0 = jnp.zeros((bm, nb, 16), jnp.uint8)
w = bm // 32
rounds = kpw.shape[0] - 1


sys.path.insert(0, "/root/repo")
import benchmarks as _bm


def timeit(name, fn, x0, r1=2, r2=8):
    def make(reps):
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, reps, lambda _, c: fn(c), x)
        return loop
    rate = _bm._marginal_rate(make, x0, nbytes, r1=r1, r2=r2)
    print(f"{name:44s} {rate/1e9:8.2f} GB/s", flush=True)
    return rate


print("backend:", jax.default_backend(), flush=True)

# correctness first (zero data still exercises layout: use random)
rng = np.random.default_rng(5)
xr = jnp.asarray(rng.integers(0, 256, (bm, 4, 16), dtype=np.uint8))
a = np.asarray(pc.chain_packed_fused("cbc", kpw, ivs, xr))
b = np.asarray(pc.chain_packed_fused_wide("cbc", kpw_w, ivs, xr))
print("wide == legacy on random data:", np.array_equal(a, b), flush=True)

timeit("legacy chain_packed_fused (cbc)",
       lambda c: pc.chain_packed_fused("cbc", kpw, ivs, c), blocks0)
timeit("wide chain_packed_fused_wide (cbc)",
       lambda c: pc.chain_packed_fused_wide("cbc", kpw_w, ivs, c), blocks0)



t = pc.wide_tile(w)
kpw2l = pc._to_rm(kpw.reshape(-1, w))
c2 = pc._to_rm(pack_planes(ivs).reshape(128, w))
x0l = jnp.zeros((nb, 128, w), jnp.uint32)


def kernel_only_legacy(x):
    tl = pc._tile_for(w)
    return pl.pallas_call(
        functools.partial(pc._chain_kernel, "cbc", rounds),
        out_shape=jax.ShapeDtypeStruct((nb, 128, w), jnp.uint32),
        grid=(w // tl, nb),
        in_specs=[
            pl.BlockSpec((kpw2l.shape[0], tl), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, tl), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, tl), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, tl), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((128, tl), jnp.uint32)],
        compiler_params=pc._SEQ2,
    )(kpw2l, c2, x)


timeit("legacy kernel alone (stream in/out)", kernel_only_legacy, x0l)
