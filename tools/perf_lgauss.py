"""A/B the large two-kernel pipeline's Gauss 3-mult variant on hardware.

The round-4 snapshot landed _kernel_a_gauss/_kernel_b_gauss (Gauss/Karatsuba
complex GEMMs: 3 real dots of K = P instead of one block dot of K = 2P, a
25% MXU-flop cut — same trade the fused ctwg kernel and the dense tier's
gauss variant measured as wins) but `config.large_gauss` was never compiled
on a TPU.  This sweep decides the default.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lgauss.py
"""
from __future__ import annotations

import math

import numpy as np

from perf_lanepack import time_fn


def main():
    import jax

    from rustfft_tpu import FftDirection
    from rustfft_tpu.ops.pallas import large
    from rustfft_tpu.utils.testing import mean_element_error, oracle_dft

    rng = np.random.default_rng(0)
    for n in (1 << 19, 1 << 20, 1 << 21):
        batch = max(1, (1 << 26) // n)
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        for gauss in (False, True):
            try:
                fn = large.make_large_fft_fn(
                    n, FftDirection.FORWARD, np.complex64, gauss=gauss
                )
                t = time_fn(fn, re, im)
                gf = 5.0 * batch * n * math.log2(n) / t / 1e9
                sig = (
                    rng.standard_normal((1, n))
                    + 1j * rng.standard_normal((1, n))
                ).astype(np.complex64)
                o_r, o_i = fn((sig.real, sig.imag))
                err = mean_element_error(
                    np.asarray(o_r) + 1j * np.asarray(o_i),
                    oracle_dft(sig, FftDirection.FORWARD),
                ) / np.mean(np.abs(np.fft.fft(sig[0])))
                tag = "gauss" if gauss else "block"
                print(
                    f"n=2^{int(math.log2(n))} b={batch:>4} large/{tag}: "
                    f"{t*1e3:8.3f} ms {gf:8.1f} GF/s | rel err {err:.2e}",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 — sweep must finish
                msg = " ".join(str(e).split("\n"))[:200]
                tag = "gauss" if gauss else "block"
                print(f"n=2^{int(math.log2(n))} large/{tag}: FAIL {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
