"""Benchmark: AES-256-GCM seal (encrypt + auth) bytes/sec on one chip.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "bytes/s", "vs_baseline": N}

vs_baseline compares against the reference µAES C library compiled with
gcc -O2 (AES-256-GCM, measured on this container's host CPU: 4.76 MB/s —
the reference publishes no throughput numbers of its own; BASELINE.md).

Resilience (VERDICT r2 weak #2): the remote TPU tunnel can hang or fail
backend init ("Unable to initialize backend 'axon': UNAVAILABLE"), and a
bare jax.devices() probe has been observed to hang for >20 minutes.  So
this script runs as a SUPERVISOR by default: each measurement attempt is
a fresh subprocess (`python bench.py --run <profile>`) under a hard
timeout; failures emit a diagnostic JSON line on stderr and retry with
backoff (fresh process == fresh backend state).  Later attempts use a
lighter profile, and as a last resort the measurement runs on the CPU
backend so the driver always records a parseable line.
"""
from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time
import traceback

REFERENCE_C_BYTES_PER_SEC = 4.76e6  # gcc -O2 micro_aes.c, AES-256-GCM, host CPU

PROFILES = {
    # name: (n_blocks per iteration, r_lo, r_hi)
    "full":  (1 << 20, 16, 64),   # 16 MiB x 16/64 reps — steady-state slope
    "light": (1 << 18, 4, 16),    # 4 MiB x 4/16 — shorter device occupancy
    "cpu":   (1 << 14, 1, 4),     # last-resort host-CPU fallback
}

# (profile, per-attempt timeout seconds, backoff before the attempt)
ATTEMPTS = [
    ("full", 900, 0),
    ("full", 900, 30),
    ("light", 600, 60),
    ("light", 600, 60),
    ("cpu", 900, 10),
]


def _diag(**kv):
    print(json.dumps({"bench_diag": True, "ts": round(time.time()), **kv}),
          file=sys.stderr, flush=True)


def _supervise() -> int:
    for i, (profile, timeout_s, backoff) in enumerate(ATTEMPTS):
        if backoff:
            time.sleep(backoff)
        _diag(event="attempt_start", attempt=i, profile=profile,
              timeout_s=timeout_s)
        env = dict(os.environ)
        if profile == "cpu":
            env["JAX_PLATFORMS"] = "cpu"
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", profile],
                capture_output=True, text=True, timeout=timeout_s, env=env,
            )
        except subprocess.TimeoutExpired:
            _diag(event="attempt_timeout", attempt=i, profile=profile,
                  elapsed_s=round(time.time() - t0, 1))
            continue
        line = _extract_result(proc.stdout)
        if proc.returncode == 0 and line is not None:
            if proc.stderr.strip():
                sys.stderr.write(proc.stderr)
            print(json.dumps(line), flush=True)
            return 0
        _diag(event="attempt_failed", attempt=i, profile=profile,
              rc=proc.returncode, elapsed_s=round(time.time() - t0, 1),
              stderr_tail=proc.stderr.strip().splitlines()[-8:])
    _diag(event="all_attempts_failed")
    return 1


def _extract_result(stdout: str):
    for raw in reversed(stdout.strip().splitlines()):
        try:
            obj = json.loads(raw)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(obj, dict) and "metric" in obj and "value" in obj:
            return obj
    return None


def _run(profile: str) -> None:
    import numpy as np

    import jax

    if profile == "cpu":
        # The ambient environment pins JAX_PLATFORMS=axon and
        # sitecustomize imports jax at interpreter startup, so the env
        # var set by the supervisor is already captured — override the
        # live config (same trick as tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from micro_aes_tpu.modes.seal import (
        _trail_adjust_t,
        fused_trailing_pad,
        gcm_key_setup,
        gcm_seal_stream_fused,
        seal_stream_words,
    )
    from micro_aes_tpu.utils.bytesio import BLOCK

    n_blocks, r_lo, r_hi = PROFILES[profile]

    # Backend acquisition is the flakiest step: retry it in-process too
    # (a fresh attempt after UNAVAILABLE sometimes wins once the tunnel
    # settles), with the supervisor's subprocess timeout as the backstop.
    platform = None
    for probe in range(3):
        try:
            devs = jax.devices()
            platform = devs[0].platform
            _diag(event="backend_up", platform=platform, n_devices=len(devs))
            break
        except Exception as e:  # noqa: BLE001 — backend init raises RuntimeError subtypes
            _diag(event="backend_probe_failed", probe=probe,
                  error=repr(e)[:500])
            if probe == 2:
                raise
            time.sleep(20)

    key = bytes(range(32))
    kp, tables = gcm_key_setup(key)

    j0 = np.zeros(BLOCK, np.uint8)
    j0[:12] = np.arange(12, dtype=np.uint8)
    j0[15] = 1

    w = seal_stream_words(n_blocks)
    adj = _trail_adjust_t(key, fused_trailing_pad(n_blocks))

    def step(kp, tables, j0, ptw):
        return gcm_seal_stream_fused(kp, tables, adj, j0, ptw, n_blocks)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(kp, tables, j0, ptw, reps):
        def body(_, carry):
            ctw, tag = step(kp, tables, j0, carry)
            # the barrier stops consecutive iterations from cancelling
            # algebraically (the r5 seal wrapper's boundary transposes
            # compose to identity across iterations otherwise, which
            # would measure the kernel-only rate, not the per-call one)
            return jax.lax.optimization_barrier(ctw)
        return step(kp, tables, j0, jax.lax.fori_loop(0, reps - 1, body, ptw))

    # The remote-execution tunnel adds a large FIXED latency per dispatch
    # (~25 ms measured), so the steady-state per-chip rate is the SLOPE
    # between two on-device repetition counts, not total/(reps*bytes).
    # The engine is measured stream-resident (the w-major u32[W,128]
    # stream is a free numpy view of the byte stream host-side).
    # NOTE: the remote execution layer caches identical (executable, args)
    # runs, so every timed call must use distinct input data.
    ptw0 = jnp.zeros((w, 128), jnp.uint32)

    def timed(r):
        ctw, tag = loop(kp, tables, jnp.asarray(j0), ptw0, r)  # compile+warm
        tag.block_until_ready()
        ts = []
        for trial in range(3):
            ptw = ptw0 + np.uint32(16 * r + trial + 1)
            ptw.block_until_ready()
            t0 = time.time()
            ctw, tag = loop(kp, tables, jnp.asarray(j0), ptw, r)
            tag.block_until_ready()
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    t_lo = timed(r_lo)
    try:
        t_hi = timed(r_hi)
        value = n_blocks * BLOCK * (r_hi - r_lo) / max(t_hi - t_lo, 1e-9)
        method = "slope"
    except Exception:  # noqa: BLE001 — partial result beats none (VERDICT r2 #2)
        _diag(event="high_rep_failed", error=traceback.format_exc()[-500:])
        value = n_blocks * BLOCK * r_lo / max(t_lo, 1e-9)
        method = "whole_call_lo"

    # correctness guard: the benched stream engine must match the jnp
    # seal kernel (which the CPU conformance suites validate).
    from micro_aes_tpu.modes.seal import (
        gcm_seal_kernel,
        host_stream,
        host_unstream,
    )

    rng = np.random.default_rng(0)
    small = rng.integers(0, 256, (1024, BLOCK), dtype=np.uint8)
    ct_a, tag_a = jax.jit(gcm_seal_kernel)(
        kp, tables, jnp.asarray(j0), jnp.asarray(small))
    w_s = seal_stream_words(1024)
    adj_s = _trail_adjust_t(key, fused_trailing_pad(1024))
    ctw_b, tag_b = jax.jit(
        lambda kp, tables, j0, ptw: gcm_seal_stream_fused(
            kp, tables, adj_s, j0, ptw, 1024))(
        kp, tables, jnp.asarray(j0),
        jnp.asarray(host_stream(small.tobytes(), 2, w_s)))
    ct_b = host_unstream(np.asarray(ctw_b), 2, 1024 * BLOCK)
    assert bytes(np.asarray(tag_a)) == bytes(np.asarray(tag_b)) and \
        bytes(np.asarray(ct_a).reshape(-1)) == ct_b, \
        "stream engine diverged from the jnp seal kernel"

    metric = "AES-256-GCM seal (enc+auth) bytes/sec/chip"
    if platform == "cpu":
        metric += " [cpu-fallback: TPU backend unavailable]"
    _diag(event="measured", profile=profile, method=method,
          platform=platform, value=round(value))
    print(json.dumps({
        "metric": metric,
        "value": round(value),
        "unit": "bytes/s",
        "vs_baseline": round(value / REFERENCE_C_BYTES_PER_SEC, 1),
    }), flush=True)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        _run(sys.argv[2])
    else:
        sys.exit(_supervise())


if __name__ == "__main__":
    main()
