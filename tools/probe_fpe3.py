"""FPE transport budget: where the milliseconds go at 100k tokens.

Run from the repo root: python tools/probe_fpe3.py (real TPU).
Evidence base for the FPE transport analysis in BASELINE.md.
"""
import time

import numpy as np
import jax.numpy as jnp

import micro_aes_tpu.fpe.device as dev

key16 = bytes(range(16))
rng = np.random.default_rng(3)
nd = 100_000
dmat = rng.integers(0, 10, (nd, 16), dtype=np.uint8)
tweak = b"\x01\x02"


def timeit(label, fn, reps=5, denom=nd):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{label:50s} {med*1e3:8.1f} ms", flush=True)
    return med


# e2e chunked (the shipping path)
timeit("e2e chunked 100k (FPE_CHUNK=32768)",
       lambda: dev.fpe_encrypt_digits(key16, tweak, dmat, 10, "ff1"))

# components at one chunk (32768 tokens)
CH = 32768
xu = dmat[:CH]
wire = dev._pack_nibbles_np(xu)
rks, kp = dev._rks(key16), dev._kp(key16)
tw1 = jnp.asarray(np.frombuffer(tweak, np.uint8))

timeit("host pack 100k", lambda: dev._pack_nibbles_np(dmat))
timeit("upload 1 chunk (262KB)",
       lambda: jnp.asarray(wire).block_until_ready(), denom=CH)
wdev = jnp.asarray(wire)
timeit("compute 1 chunk (resident)",
       lambda: dev._ff1_device(rks, kp, tw1, wdev, 10, 16, 2, True,
                               True).block_until_ready(), denom=CH)
timeit("compute+download 1 chunk",
       lambda: np.asarray(dev._ff1_device(rks, kp, tw1, wdev, 10, 16, 2,
                                          True, True)), denom=CH)


def updown():
    w = jnp.asarray(wire)
    return np.asarray(dev._ff1_device(rks, kp, tw1, w, 10, 16, 2, True,
                                      True))


timeit("up+compute+down 1 chunk", updown, denom=CH)


def four_sync():
    outs = []
    for k in range(4):
        w = jnp.asarray(wire)
        outs.append(np.asarray(dev._ff1_device(rks, kp, tw1, w, 10, 16, 2,
                                               True, True)))
    return outs


timeit("4 chunks fully serialized (sync each)", four_sync)


def four_async():
    ws = [jnp.asarray(wire) for _ in range(4)]
    outs = [dev._ff1_device(rks, kp, tw1, w, 10, 16, 2, True, True)
            for w in ws]
    return [np.asarray(o) for o in outs]


timeit("4 chunks dispatch-all-then-fetch", four_async)


def four_interleaved():
    outs = []
    for k in range(4):
        w = jnp.asarray(wire)
        outs.append(dev._ff1_device(rks, kp, tw1, w, 10, 16, 2, True, True))
    return [np.asarray(o) for o in outs]


timeit("4 chunks upload+dispatch loop, fetch after", four_interleaved)
