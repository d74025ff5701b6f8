"""Pallas streaming ceiling, round 4: tile ladder + aliasing, one run.

Round-3 anatomy (tools/perf_anatomy.py, hardware): the pure load/store
probe in the kernels' own block layout runs ~222 GB/s (16 B/pt convention)
while the XLA elementwise stream hits 600-777 GB/s in the same session —
the one-HBM-pass FFT kernels sit at ~0.83x of that Pallas copy floor, so
the entire 16k..2^21 band is bound by Pallas DMA, not compute (full radix
kernel at 65536 = 1.2x the ls probe).  This tool answers, within ONE run:

  1. does the Pallas copy rate rise with the block size (grid-step
     overhead) or stay flat (pipeline structural)?
  2. does input_output_aliases lift the ceiling (round-2 note: aliased
     streaming measured 0.8x of XLA stream at tb=8)?
  3. does the ALIASED real radix kernel win inside a chained loop under
     the current cat tier (round-2 negative was bf16x3: 838 vs 1087 at
     16384 — retest once at 65536/bf16x3s before committing the ceiling)?

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_dma2.py
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

N = 65536
BATCH = 1024  # 64M points, 512MB f32 pair


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rustfft_tpu import FftDirection
    from rustfft_tpu.config import enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import fused
    from rustfft_tpu.ops.pallas.util import i32map

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    re = jax.device_put(
        (rng.standard_normal((BATCH, N)) * 1e-30).astype(np.float32)
    )
    im = jax.device_put(
        (rng.standard_normal((BATCH, N)) * 1e-30).astype(np.float32)
    )
    nbytes = 16.0 * BATCH * N  # f32 pair, read + write

    def gbs(t):
        return nbytes / t / 1e9

    def row(label, fn):
        try:
            t = time_fn(fn, re, im)
            print(f"  {label:<34}: {t*1e3:8.3f} ms  {gbs(t):7.1f} GB/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {label:<34}: FAILED {str(e)[:240]}", flush=True)

    # 0. XLA stream on the same pair (the roofline denominator)
    c = np.float32(1.0000001)
    row("xla scale pair", lambda x: (x[0] * c, x[1] * c))

    # 1. flat 2D copy, tile ladder (blocks are contiguous HBM runs)
    def copy2(xr_ref, xi_ref, or_ref, oi_ref):
        or_ref[:] = xr_ref[:]
        oi_ref[:] = xi_ref[:]

    def flat_copy(tb, alias):
        spec = pl.BlockSpec((tb, N), i32map(lambda i: (i, 0)),
                            memory_space=pltpu.VMEM)

        def call(x):
            return tuple(pl.pallas_call(
                copy2,
                grid=(BATCH // tb,),
                in_specs=[spec, spec],
                out_specs=[spec, spec],
                out_shape=[jax.ShapeDtypeStruct((BATCH, N), jnp.float32)] * 2,
                input_output_aliases={0: 0, 1: 1} if alias else {},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=112 * 1024 * 1024
                ),
            )(x[0], x[1]))

        return call

    for tb in (4, 8, 16, 32, 64):  # block pair = tb * 512KB
        row(f"pallas copy flat tb={tb}", flat_copy(tb, False))
    for tb in (8, 32, 64):
        row(f"pallas copy flat ALIASED tb={tb}", flat_copy(tb, True))

    # 2. the kernels' own (tb*p, q) blocked layout ladder
    p = q = 256

    def blocked_copy(tb):
        spec = pl.BlockSpec((tb * p, q), i32map(lambda i: (i, 0)),
                            memory_space=pltpu.VMEM)

        def call(x):
            o = pl.pallas_call(
                copy2,
                grid=(BATCH // tb,),
                in_specs=[spec, spec],
                out_specs=[spec, spec],
                out_shape=[jax.ShapeDtypeStruct((BATCH * p, q), jnp.float32)] * 2,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=112 * 1024 * 1024
                ),
            )(x[0].reshape(BATCH * p, q), x[1].reshape(BATCH * p, q))
            return (o[0].reshape(BATCH, N), o[1].reshape(BATCH, N))

        return call

    for tb in (8, 16, 32, 64):
        row(f"pallas copy (tb*256,256) tb={tb}", blocked_copy(tb))

    # 3. the real kernels, normal vs aliased, same run (GF/s context)
    d = FftDirection.FORWARD
    gf = lambda t: 5.0 * BATCH * N * math.log2(N) / t / 1e9  # noqa: E731
    for label, maker in (
        ("radix bf16x3s", lambda: fused.make_fused_radix_fn(
            N, d, np.complex64, precision="bf16x3s")),
        ("two-stage bf16x3s", lambda: fused.make_fused_two_stage_fn(
            N, d, np.complex64, precision="bf16x3s")),
        ("two-stage bf16x3s IN-PLACE", lambda: fused.make_fused_two_stage_fn(
            N, d, np.complex64, precision="bf16x3s", in_place=True)),
    ):
        try:
            fn = maker()
            t = time_fn(fn, re, im)
            print(f"  {label:<34}: {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s "
                  f"({gbs(t):5.1f} GB/s eff)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {label:<34}: FAILED {str(e)[:240]}", flush=True)


if __name__ == "__main__":
    main()
