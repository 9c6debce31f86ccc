"""Tag-live truth probe for the multi-key GCM engines (the round-5
measurement correction, BASELINE.md): same-process marginal rates of

  * the MATRIX engine (_seal_batch_core) with the tag output DEAD
    (what the old committed rows measured — XLA dead-code-eliminates
    the whole XLA-side GHASH fold) vs LIVE (the truth);
  * the VALUE-CHAIN engine (_chain_core) tag-live at the same shapes.

Run on TPU:  python tools/mk_small_probe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import micro_aes_tpu.modes.seal_batch as sb
from micro_aes_tpu.modes.bulk import _enc1_batch
from micro_aes_tpu.ops.mac import ghash_fold_batch


def rate(step, x0, label, nbytes):
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
            xv = x0 + x0.dtype.type((16 * r + k) % 251 + 1)
            xv.block_until_ready()
            t0 = time.time()
            loop(xv).block_until_ready()
            ts.append(time.time() - t0)
        res[r] = sorted(ts)[1]
    sl = (res[16] - res[4]) / 12
    print(f"{label:42s} {sl * 1e3:7.3f} ms/call "
          f"{nbytes / max(sl, 1e-9) / 1e9:6.2f} GB/s")


def probe_matrix(B, MLEN):
    rng = np.random.default_rng(41)
    keys = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
            for _ in range(B)]
    nonces = [rng.integers(0, 256, 12, dtype=np.uint8).tobytes()
              for _ in range(B)]
    (b, wm, span, ns, front_np, kp_stack, j0w, front, mask, sel,
     len_bits, ptw) = sb._prep(keys, nonces, [b"hdr"] * B,
                               [bytes(MLEN)] * B)

    def dead(c):
        o, t = sb._seal_batch_core(kp_stack, j0w, front, mask, sel,
                                   len_bits, c, b, wm)
        return o

    def live(c):
        o, t = sb._seal_batch_core(kp_stack, j0w, front, mask, sel,
                                   len_bits, c, b, wm)
        tw = jax.lax.bitcast_convert_type(t.reshape(b, 4, 4), jnp.uint32)
        return o ^ tw.sum()

    lbl = f"{B}x{MLEN // 1024}KB"
    rate(dead, ptw, f"matrix engine {lbl}, tags DEAD", B * MLEN)
    rate(live, ptw, f"matrix engine {lbl}, tags LIVE", B * MLEN)


def probe_chain(B, MLEN):
    NB = MLEN // 16
    rng = np.random.default_rng(41)
    keys = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
            for _ in range(B)]
    nonces = [rng.integers(0, 256, 12, dtype=np.uint8).tobytes()
              for _ in range(B)]
    bp, s, l = sb._chain_shape(B, NB)
    span = s * l
    kpw, htab, h, rks, ptabs, htab_h = sb._chain_cached(
        b"".join(keys + [keys[-1]] * (bp - B)), 16, s, l)
    j0 = np.zeros((bp, 16), np.uint8)
    for i, n in enumerate(nonces):
        j0[i, :12] = np.frombuffer(n, np.uint8)
    j0[:, 15] = 1
    ej0 = jnp.asarray(_enc1_batch(rks, j0))
    lenb = np.zeros((bp, 16), np.uint8)
    lenb[:B, :8] = np.frombuffer((24).to_bytes(8, "big"), np.uint8)
    lenb[:B, 8:] = np.frombuffer((MLEN * 8).to_bytes(8, "big"), np.uint8)
    c0v = np.zeros((bp, s, 16), np.uint8)
    valid = np.zeros((bp * s, l), bool)
    inj = np.zeros((bp * s, l), bool)
    for i in range(B):
        base = j0[i].copy()
        base[15] = 2
        for sg in range(s):
            c0v[i, sg] = sb._ctr56_add(base, sg * l - (span - NB))
        valid[i * s:(i + 1) * s] = (
            np.arange(span).reshape(s, l) >= span - NB)
        p0 = span - NB
        inj[i * s + p0 // l, p0 % l] = True
    srcm = jnp.asarray(sb._pack_lane_bits(valid.T))
    initm = jnp.asarray(sb._pack_lane_bits(inj.T))
    aadb = np.zeros((bp, 1, 16), np.uint8)
    aadb[:, 0, :3] = list(b"hdr")
    init = ghash_fold_batch(jnp.asarray(h), jnp.zeros((bp, 16), jnp.uint8),
                            jnp.asarray(aadb), jnp.full(bp, 1, jnp.int32))
    nblk = jnp.asarray(np.full(bp, NB, np.int32))
    lane0 = np.arange(bp) * s + (span - NB) // l
    initv = (jnp.zeros((bp * s, 16), jnp.uint8)
             .at[jnp.asarray(lane0)].set(init))
    c0j = jnp.asarray(c0v.reshape(bp * s, 16))
    lenbj = jnp.asarray(lenb)

    def step(x):
        out, tags = sb._chain_core(kpw, htab, c0j, x, srcm, initm, initv,
                                   nblk, init, lenbj, ej0, ptabs, htab_h,
                                   s, l, False)
        return out ^ jnp.tile(tags, (1, s)).reshape(bp * s, 1, 16)

    lbl = f"{B}x{MLEN // 1024}KB (s={s} l={l})"
    rate(step, jnp.zeros((bp * s, l, 16), jnp.uint8),
         f"value-chain engine {lbl}, tags LIVE", B * MLEN)


def main():
    print("backend:", jax.default_backend())
    for B, MLEN in ((1024, 16384), (64, 262144), (4096, 4096)):
        probe_chain(B, MLEN)
    for B, MLEN in ((1024, 16384), (64, 262144)):
        probe_matrix(B, MLEN)


if __name__ == "__main__":
    main()
