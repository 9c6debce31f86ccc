"""A/B: current 4D wordstream transposes vs plain 2D transpose cost (TPU).
optimization_barrier forces each transpose to materialize (round trips
cancel algebraically otherwise)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from micro_aes_tpu.ops import pallas_chain as pc

bm, nb = 4096, 256
nbytes = bm * nb * 16
blocks0 = jnp.zeros((bm, nb, 16), jnp.uint8)
nat0 = jnp.zeros((bm, nb * 4), jnp.uint32)
bar = jax.lax.optimization_barrier

def timeit(name, fn, x0, r1=2, r2=8):
    res = {}
    for r in (r1, r2):
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, r, lambda _, c: fn(c), x)
        loop(x0).block_until_ready()
        ts = []
        for k in range(3):
            xv = x0 + x0.dtype.type((16 * r + k) % 251 + 1)
            xv.block_until_ready()
            t0 = time.time()
            loop(xv).block_until_ready()
            ts.append(time.time() - t0)
        res[r] = sorted(ts)[1]
    slope = (res[r2] - res[r1]) / (r2 - r1)
    print(f"{name:46s} {slope*1e3:8.3f} ms/iter {nbytes/max(slope,1e-12)/1e9:8.2f} GB/s-equiv", flush=True)

print("backend:", jax.default_backend(), flush=True)
timeit("4D to+from round-trip (barriered)",
       lambda c: pc._from_wordstream(bar(pc._to_wordstream(c))), blocks0)
timeit("2D there+back (barriered)",
       lambda c: jnp.transpose(bar(jnp.transpose(c))), nat0)
timeit("4D _to_wordstream only (barriered)",
       lambda c: bar(pc._to_wordstream(c)).reshape(nb, 128, bm // 32)
       .sum(axis=(0, 1), dtype=jnp.uint32) + c * 0 + 0, blocks0)
