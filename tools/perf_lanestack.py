"""Perf experiment: lanepack group/stack variants on the live TPU.

stack=True fuses g 128-lane groups into one g*128-wide lane axis (one
transpose pair + one dot per stage per block) vs the per-group loop.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lanestack.py [n ...]
Within-run comparison only (time-shared chip, CLAUDE.md).
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
    from rustfft_tpu.ops.pallas import lanepack

    sizes = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048, 3888]
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD
    print(f"device={jax.devices()[0]}", flush=True)

    for n in sizes:
        batch = max(512, 1 << (((1 << 26) // n).bit_length() - 1))
        re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        gf = 5.0 * batch * n * math.log2(n) / 1e9

        def row(name, thunk):
            try:
                t = thunk()
            except Exception as e:  # noqa: BLE001
                print(f"n={n:>6} {name:<24} FAILED {type(e).__name__}: {e}"[:140], flush=True)
                return
            print(f"n={n:>6} {name:<24} {t*1e3:8.3f} ms  {gf/t:8.1f} GF/s", flush=True)

        row("default", lambda: time_fn(
            lanepack.make_lanepack_fn(n, d, np.complex64), re, im))
        for g in (2, 4, 8):
            if 26 * 2 * 4 * n * 128 * g > 2 * 112 * 2**20:
                continue
            row(f"loop g={g}", lambda g=g: time_fn(
                lanepack.make_lanepack_fn(n, d, np.complex64, group=g), re, im))
            row(f"stack g={g}", lambda g=g: time_fn(
                lanepack.make_lanepack_fn(n, d, np.complex64, group=g, stack=True), re, im))
        print(flush=True)


if __name__ == "__main__":
    main()
