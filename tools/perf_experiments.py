"""On-device experiments for planner cost-model tuning.

Measures recipe variants and matmul precisions on the real TPU — the
methodology behind the TPU planner's constants, playing the role of the
reference's benchmark-derived AVX heuristics (avx_planner.rs:317-403) and
compare_3n2m_strategies harness.  Run: python tools/perf_experiments.py
"""
from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from rustfft_tpu import FftDirection, recipes
from rustfft_tpu import executor
from rustfft_tpu.config import config
from rustfft_tpu.utils.testing import random_signal, oracle_dft, mean_element_error


def timed_gflops(raw, n, batch, iters=6):
    rng = np.random.default_rng(0)
    re = jax.device_put(rng.standard_normal((batch, n)).astype(np.float32))
    im = jax.device_put(rng.standard_normal((batch, n)).astype(np.float32))
    scale = np.float32(1.0 / n)

    @jax.jit
    def many(x):
        def body(i, x):
            r, m = raw(x)
            return (r * scale, m * scale)

        x = jax.lax.fori_loop(0, iters, body, x)
        return x[0].sum() + x[1].sum()

    @jax.jit
    def nothing(x):
        return x[0][0, 0] + x[1][0, 0]

    float(many((re, im)))
    float(nothing((re, im)))
    t0 = time.perf_counter(); float(nothing((re, im))); t_over = time.perf_counter() - t0
    t0 = time.perf_counter(); float(many((re, im))); t_tot = time.perf_counter() - t0
    t_per = max((t_tot - t_over) / iters, 1e-9)
    return t_per, 5.0 * batch * n * math.log2(n) / t_per / 1e9


def accuracy(recipe, n, direction=FftDirection.FORWARD):
    fn = executor._build(recipe, direction, np.dtype(np.complex64))
    x = random_signal(n, seed=3)
    out = np.asarray(
        jax.jit(fn)((x.real.astype(np.float32), x.imag.astype(np.float32)))[0]
    ) + 1j * np.asarray(jax.jit(fn)((x.real.astype(np.float32), x.imag.astype(np.float32)))[1])
    return mean_element_error(out, oracle_dft(x, direction))


def mk(recipe, direction=FftDirection.FORWARD):
    # bypass executor memo so precision changes take effect
    return executor._build(recipe, direction, np.dtype(np.complex64))


def D(n):
    return recipes.Dft(n)


def MR(a, b):
    return recipes.MixedRadix(a, b)


def variants_4096():
    return {
        "MR(256,16)": MR(D(256), D(16)),
        "MR(16,MR(16,16))": MR(D(16), MR(D(16), D(16))),
        "MR(64,64)": MR(D(64), D(64)),
        "MR(32,128)": MR(D(32), D(128)),
        "MR(128,32)": MR(D(128), D(32)),
        "Radix4(4,B16)": recipes.Radix4(4, recipes.Butterfly(16)),
        "Radix4(5,B4)": recipes.Radix4(5, recipes.Butterfly(4)),
        "RadixN(8x4,B2)": recipes.RadixN((8,) * 3, D(8)),
    }


def variants_1m():
    n16 = MR(D(16), MR(D(16), D(16)))  # 4096 as 16-chain
    return {
        "MR(256,MR(256,16))": MR(D(256), MR(D(256), D(16))),
        "MR(1024=MR(32,32) sq)": MR(MR(D(32), D(32)), MR(D(32), D(32))),
        "MR(16-chain x5)": MR(D(16), MR(D(16), MR(D(16), MR(D(16), D(16))))),
        "MR(64,MR(64,256))": MR(D(64), MR(D(64), D(256))),
        "MR(128,MR(128,64))": MR(D(128), MR(D(128), D(64))),
    }


def main():
    print("device:", jax.devices()[0])
    for prec_name in ["DEFAULT", "HIGH", "HIGHEST"]:
        config.matmul_precision = getattr(jax.lax.Precision, prec_name)
        r = MR(D(256), D(16))
        fn = mk(r)
        t, g = timed_gflops(fn, 4096, 16384)
        err = accuracy(r, 4096)
        print(f"prec {prec_name:8}: MR(256,16) n=4096  {t*1e3:7.3f} ms {g:8.1f} GF/s  err={err:.2e}")

    for prec_name in ["HIGH", "HIGHEST"]:
        config.matmul_precision = getattr(jax.lax.Precision, prec_name)
        print(f"--- n=4096 batch=16384, precision={prec_name} ---")
        for name, r in variants_4096().items():
            t, g = timed_gflops(mk(r), 4096, 16384)
            err = accuracy(r, 4096)
            print(f"  {name:22}: {t*1e3:7.3f} ms {g:8.1f} GF/s  err={err:.2e}")

    config.matmul_precision = jax.lax.Precision.HIGHEST
    print("--- n=2^20 batch=64, precision=HIGHEST ---")
    for name, r in variants_1m().items():
        t, g = timed_gflops(mk(r), 1 << 20, 64)
        err = accuracy(r, 1 << 20)
        print(f"  {name:22}: {t*1e3:7.3f} ms {g:8.1f} GF/s  err={err:.2e}")


if __name__ == "__main__":
    main()
