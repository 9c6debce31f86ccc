"""FPE e2e probe on TPU: correctness vs host oracle + tokens/s.

Run from the repo root: python tools/probe_fpe.py (real TPU).
"""
import time

import numpy as np

from micro_aes_tpu.fpe.device import (
    FPE_CHUNK,
    fpe_decrypt_digits,
    fpe_encrypt_digits,
)
from micro_aes_tpu.fpe import fpe_encrypt

key16 = bytes(range(16))
rng = np.random.default_rng(3)

# correctness: device digit path vs host-string oracle (small batch)
for method, tweak in (("ff1", b"\x01\x02"), ("ff3-1", bytes(7))):
    d = rng.integers(0, 10, (40, 16), dtype=np.uint8)
    enc = fpe_encrypt_digits(key16, tweak, d, 10, method)
    dec = fpe_decrypt_digits(key16, tweak, enc, 10, method)
    assert np.array_equal(dec, d), f"round-trip failed {method}"
    tok = "".join(str(x) for x in d[7])
    want = fpe_encrypt(key16, tweak, tok, "digits", method)
    got = "".join(str(x) for x in enc[7])
    assert got == want, f"{method}: {got} != {want}"
    print(f"{method}: device digits == host oracle, round-trip OK")

for method, tweak in (("ff1", b"\x01\x02"), ("ff3-1", bytes(7))):
    for nd in (10_000, 100_000):
        dmat = rng.integers(0, 10, (nd, 16), dtype=np.uint8)
        fpe_encrypt_digits(key16, tweak, dmat, 10, method)  # warm
        ts = []
        for k in range(5):
            dv = (dmat + k + 1) % 10
            t0 = time.time()
            fpe_encrypt_digits(key16, tweak, dv, 10, method)
            ts.append(time.time() - t0)
        med = sorted(ts)[2]
        print(f"{method} digits {nd}: {nd/med/1e3:8.0f}k tok/s "
              f"(med {med*1e3:.1f} ms; runs {[f'{t*1e3:.0f}' for t in ts]})")
