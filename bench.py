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

    from micro_aes_tpu.modes.gcm import gcm_encrypt
    from micro_aes_tpu.modes.seal import gcm_key_setup, gcm_seal_kernel
    from micro_aes_tpu.utils.bytesio import BLOCK

    key = bytes(range(32))
    kp, tables = gcm_key_setup(key)
    n_blocks = 1 << 21  # 32 MiB per iteration
    reps = 8

    j0 = np.zeros(BLOCK, np.uint8)
    j0[:12] = np.arange(12, dtype=np.uint8)
    j0[15] = 1

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(kp, tables, j0, pt, reps):
        def body(_, carry):
            ct, tag = gcm_seal_kernel(kp, tables, j0, carry)
            return ct  # feed ciphertext back: keeps every iteration live
        return gcm_seal_kernel(kp, tables, j0,
                               jax.lax.fori_loop(0, reps - 1, body, pt))

    pt0 = jnp.zeros((n_blocks, BLOCK), jnp.uint8)
    ct, tag = loop(kp, tables, jnp.asarray(j0), pt0, reps)  # compile + warm
    tag.block_until_ready()

    # NOTE: the remote execution layer caches identical (executable, args)
    # runs, so every timed call must use distinct input data.
    rates = []
    for trial in range(3):
        pt = pt0 + np.uint8(trial + 1)
        pt.block_until_ready()
        t0 = time.time()
        ct, tag = loop(kp, tables, jnp.asarray(j0), pt, reps)
        tag.block_until_ready()
        rates.append(n_blocks * BLOCK * reps / (time.time() - t0))
    value = sorted(rates)[len(rates) // 2]  # median

    # correctness guard: one small seal must match the conformance path
    small = bytes(range(256)) * 64  # 16 KiB
    from micro_aes_tpu.modes.seal import gcm_seal
    assert gcm_seal(key, bytes(j0[:12]), small) == gcm_encrypt(
        key, bytes(j0[:12]), b"", small
    ), "bench kernel diverged from conformance-validated path"

    print(json.dumps({
        "metric": "AES-256-GCM seal (enc+auth) bytes/sec/chip",
        "value": round(value),
        "unit": "bytes/s",
        "vs_baseline": round(value / REFERENCE_C_BYTES_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
