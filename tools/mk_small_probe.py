"""Component timing for the small-tenant multi-key GCM gap (BASELINE r5
"known headroom" #2): 1024 keys x 16 KB.  Times, same-process:

  * the full cold seal core and the warm(-tables) core;
  * the cipher pass alone (ctrw_fused_multikey_auto on the same window);
  * the GHASH fold side alone given the cipher output + prebuilt tables
    (s1/s2 contractions + combine + finalize);
  * the per-key table build alone (_derive_tables).

Hypothesis under test: the w1/w2 int8 table HBM traffic (~1 MB/key/pass)
dominates at 16 KB/tenant — not the build, not the cipher.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from micro_aes_tpu.modes import seal_batch as sb
from micro_aes_tpu.ops.pallas_multikey import ctrw_fused_multikey_auto

B, MLEN = 1024, 16384
NB = MLEN // 16
NBYTES = B * MLEN

rng = np.random.default_rng(41)
keys = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in range(B)]
nonces = [rng.integers(0, 256, 12, dtype=np.uint8).tobytes()
          for _ in range(B)]
aads = [b""] * B
pts = [rng.integers(0, 256, MLEN, dtype=np.uint8).tobytes()
       for _ in range(B)]

(b, wm, span, ns, front_np, kp_stack, j0w, front, mask, sel,
 len_bits, ptw) = sb._prep(keys, nonces, aads, pts)
print(f"wm={wm} span={span} waste={(span - NB - 2) / span:.1%}")

tables = sb._derive_tables(
    sb._enc1_batch.__wrapped__ if False else None) if False else None
# build tables once via the cached path's internals
from micro_aes_tpu.modes.bulk import _enc_vmap, stack_round_keys

rks = jnp.asarray(stack_round_keys(keys))
h = _enc_vmap(rks, jnp.zeros((B, 1, 16), jnp.uint8))[:, 0]
tables = sb._derive_tables(h)
jax.tree_util.tree_map(lambda v: v.block_until_ready(), tables)


@jax.jit
def ghash_side(ptw_, outw_):
    """The fold side of _seal_body verbatim, tables closed over."""
    m, w1, w2, m_outer = tables
    rows = b * wm
    selr = jnp.repeat(sel.reshape(rows, 32), 4, axis=1)
    maskr = jnp.repeat(mask.reshape(rows, 32), 4, axis=1)
    wsel = jnp.where(selr != 0, ptw_, outw_)
    wsel = jnp.where(maskr != 0, wsel, jnp.uint32(0))
    bits = sb._stream_bits(wsel)
    s1 = jax.lax.dot_general(
        bits.reshape(b, wm, 32 * 128), w1,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32) & 1
    pad = (-wm) % 32
    s1 = jnp.pad(s1.astype(jnp.int8), ((0, 0), (pad, 0), (0, 0)))
    t2 = (wm + pad) // 32
    s2 = jax.lax.dot_general(
        s1.reshape(b, t2, 32 * 128), w2,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32) & 1
    acc = jax.vmap(sb._combine_logdepth)(s2.astype(jnp.int8), m_outer)
    x = (acc.astype(jnp.int8) ^ len_bits)
    g = jax.lax.dot_general(
        x, m, dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32) & 1
    return g


@jax.jit
def s1_only(ptw_):
    m, w1, w2, m_outer = tables
    bits = sb._stream_bits(ptw_)
    s1 = jax.lax.dot_general(
        bits.reshape(b, wm, 32 * 128), w1,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32) & 1
    return s1


def rate(step, x0, label):
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
        jax.tree_util.tree_map(lambda v: v.block_until_ready(), loop(x0))
        ts = []
        for k in range(3):
            xv = x0 + x0.dtype.type((16 * r + k) % 251 + 1)
            xv.block_until_ready()
            t0 = time.time()
            jax.tree_util.tree_map(lambda v: v.block_until_ready(), loop(xv))
            ts.append(time.time() - t0)
        res[r] = sorted(ts)[1]
    slope = (res[16] - res[4]) / 12
    print(f"{label:28s} {slope * 1e3:7.3f} ms/call "
          f"{NBYTES / max(slope, 1e-9) / 1e9:7.2f} GB/s-payload")
    return slope


def main():
    print("backend:", jax.default_backend())

    def full_cold(ptw_):
        outw, tags = sb._seal_batch_core(kp_stack, j0w, front, mask, sel,
                                         len_bits, ptw_, b, wm)
        return outw ^ tags.view(jnp.uint8).astype(jnp.uint32).sum()

    def full_warm(ptw_):
        outw, tags = sb._seal_batch_core_warm(kp_stack, j0w, front, mask,
                                              sel, len_bits, ptw_, tables,
                                              b, wm)
        return outw ^ tags.view(jnp.uint8).astype(jnp.uint32).sum()

    def cipher_only(ptw_):
        return ctrw_fused_multikey_auto(kp_stack, ptw_, ptw_, b)

    def ghash_only(ptw_):
        return ghash_side(ptw_, ptw_)

    def s1_rate(ptw_):
        return s1_only(ptw_)

    def build_only(x):
        t = sb._derive_tables(h ^ x.astype(jnp.uint8).reshape(1, 16))
        return t[0]

    rate(full_cold, ptw, "full seal, cold")
    rate(full_warm, ptw, "full seal, warm tables")
    rate(cipher_only, ptw, "cipher pass alone")
    rate(ghash_only, ptw, "ghash side alone (warm)")
    rate(s1_rate, ptw, "s1 contraction alone")
    rate(build_only, jnp.zeros(16, jnp.uint32), "table build alone")


if __name__ == "__main__":
    main()
