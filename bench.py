"""Benchmark: AES-256-GCM seal (encrypt + auth) bytes/sec on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bytes/s", "vs_baseline": N}

vs_baseline compares against the reference µAES C library compiled with
gcc -O2 (AES-256-GCM, measured on this container's host CPU: 4.76 MB/s —
the reference publishes no throughput numbers of its own; BASELINE.md).
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

REFERENCE_C_BYTES_PER_SEC = 4.76e6  # gcc -O2 micro_aes.c, AES-256-GCM, host CPU


def main():
    import jax
    import jax.numpy as jnp

    from micro_aes_tpu.modes.seal import (
        _trail_adjust_t,
        gcm_key_setup,
        gcm_seal_kernel,
        gcm_seal_kernel_fused,
    )
    from micro_aes_tpu.utils.bytesio import BLOCK

    key = bytes(range(32))
    kp, tables = gcm_key_setup(key)
    n_blocks = 1 << 20  # 16 MiB per iteration
    reps = 16

    j0 = np.zeros(BLOCK, np.uint8)
    j0[:12] = np.arange(12, dtype=np.uint8)
    j0[15] = 1

    if jax.default_backend() == "tpu":
        from micro_aes_tpu.ops.pallas_seal import SEAL_TILE_W

        w = -(-(n_blocks + 2) // 32)
        w += (-w) % SEAL_TILE_W
        adj = _trail_adjust_t(key, 32 * w - n_blocks - 2)

        def step(kp, tables, j0, pt):
            return gcm_seal_kernel_fused(kp, tables, adj, j0, pt)
    else:
        step = gcm_seal_kernel

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(kp, tables, j0, pt, reps):
        def body(_, carry):
            ct, tag = step(kp, tables, j0, carry)
            return ct  # feed ciphertext back: keeps every iteration live
        return step(kp, tables, j0, jax.lax.fori_loop(0, reps - 1, body, pt))

    # The remote-execution tunnel adds a large FIXED latency per dispatch
    # (~25 ms measured), so the steady-state per-chip rate is the SLOPE
    # between two on-device repetition counts, not total/(reps*bytes).
    # NOTE: the remote execution layer caches identical (executable, args)
    # runs, so every timed call must use distinct input data.
    pt0 = jnp.zeros((n_blocks, BLOCK), jnp.uint8)
    r_lo, r_hi = reps, reps * 4

    def timed(r):
        ct, tag = loop(kp, tables, jnp.asarray(j0), pt0, r)  # compile+warm
        tag.block_until_ready()
        ts = []
        for trial in range(3):
            pt = pt0 + np.uint8((16 * r + trial) % 251 + 1)
            pt.block_until_ready()
            t0 = time.time()
            ct, tag = loop(kp, tables, jnp.asarray(j0), pt, r)
            tag.block_until_ready()
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    t_lo, t_hi = timed(r_lo), timed(r_hi)
    value = n_blocks * BLOCK * (r_hi - r_lo) / max(t_hi - t_lo, 1e-9)

    # correctness guard: the benched step must match the jnp seal kernel
    # (which the CPU conformance suites validate) on a random message.
    rng = np.random.default_rng(0)
    small = jnp.asarray(rng.integers(0, 256, (1024, BLOCK), dtype=np.uint8))
    ct_a, tag_a = jax.jit(gcm_seal_kernel)(kp, tables, jnp.asarray(j0), small)
    if jax.default_backend() == "tpu":
        from micro_aes_tpu.ops.pallas_seal import SEAL_TILE_W

        w_s = -(-(1024 + 2) // 32)
        w_s += (-w_s) % SEAL_TILE_W
        adj_s = _trail_adjust_t(key, 32 * w_s - 1024 - 2)
        ct_b, tag_b = jax.jit(gcm_seal_kernel_fused)(
            kp, tables, adj_s, jnp.asarray(j0), small)
        assert bytes(np.asarray(tag_a)) == bytes(np.asarray(tag_b)) and \
            np.array_equal(np.asarray(ct_a), np.asarray(ct_b)), \
            "fused kernel diverged from the jnp seal kernel"

    print(json.dumps({
        "metric": "AES-256-GCM seal (enc+auth) bytes/sec/chip",
        "value": round(value),
        "unit": "bytes/s",
        "vs_baseline": round(value / REFERENCE_C_BYTES_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
