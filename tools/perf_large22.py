"""Perf experiment: large-pipeline split sweep at 2^21/2^22.

choose_pqq prefers pt=128, which forces P=512 at 2^22 — but kernel A's MXU
work is 24*P bf16-flops/pt, so P=512 is compute-bound.  Measure smaller-P
splits with thinner kernel-B lane tiles.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_large22.py
"""
from __future__ import annotations

import math
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools")
from perf_lanepack import time_fn  # noqa: E402


def main():
    import jax

    from rustfft_tpu import FftDirection
    from rustfft_tpu.ops.pallas import large

    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD
    print(f"device={jax.devices()[0]}", flush=True)

    cases = {
        1 << 21: [None, (128, 128, 128), (256, 128, 64), (256, 128, 128)],
        1 << 22: [None, (256, 128, 128), (256, 64, 256), (128, 128, 256)],
    }
    if len(sys.argv) > 1:  # e.g. "22" or "22:1" (size : variant index)
        sel = {}
        for a in sys.argv[1:]:
            bits, _, idx = a.partition(":")
            n = 1 << int(bits)
            sel.setdefault(n, [])
            sel[n] = [cases[n][int(i)] for i in idx.split(",")] if idx else cases[n]
        cases = sel
    for n, splits in cases.items():
        batch = (1 << 27) // n
        re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        gf = 5.0 * batch * n * math.log2(n) / 1e9
        for split in splits:
            name = f"split={split or large.choose_pqq(n)}{' (auto)' if split is None else ''}"
            try:
                fn = large.make_large_fft_fn(n, d, np.complex64, split=split)
                t = time_fn(fn, re, im)
            except Exception as e:  # noqa: BLE001
                print(f"n=2^{n.bit_length()-1} {name:<28} FAILED {type(e).__name__}: {e}"[:140], flush=True)
                continue
            print(f"n=2^{n.bit_length()-1} {name:<28} {t*1e3:8.3f} ms  {gf/t:8.1f} GF/s", flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
