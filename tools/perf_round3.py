"""Consolidated round-3 perf experiment — ONE process so nothing races the
time-shared chip.  Within a single run:

  denominators: HBM stream GB/s + MXU bf16 matmul TFLOP/s
  band A: bf16x2/bf16 throughput tiers vs bf16x3 (lanepack 512..3888,
          two-stage 4096/16384, radix 65536, large 2^20)
  band B: three-kernel pipeline (large3) at 2^23/2^24 vs the XLA fallback
  band C: 65537 — radix conv core vs dense conv core; lane vs row gathers;
          isolated gather cost
  band D: conv batch-tile sweep at 1009/7919 (clean-run retest of the
          r2 post-trim note)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_round3.py [bands]
(bands = subset of 'dABCD', default all)
"""
from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402


def main():
    import jax

    import jax.numpy as jnp  # noqa: F401  (band C closures)

    from rustfft_tpu import FftDirection, FftPlanner
    from rustfft_tpu.config import config
    from rustfft_tpu.config import enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import conv, conv_radix, fused, lanepack, large3

    enable_persistent_compilation_cache()

    bands = sys.argv[1] if len(sys.argv) > 1 else "dABCD"
    d = FftDirection.FORWARD
    rng = np.random.default_rng(0)

    def data(n, batch):
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        return re, im

    def row(n, batch, name, thunk):
        gf = 5.0 * batch * n * math.log2(n) / 1e9
        try:
            t = thunk()
        except Exception as e:  # noqa: BLE001
            print(
                f"n={n:>8} {name:<40} FAILED {type(e).__name__}: {e}"[:160],
                flush=True,
            )
            return None
        print(
            f"n={n:>8} {name:<40} {t*1e3:8.3f} ms  {gf/t:8.1f} GF/s",
            flush=True,
        )
        return gf / t

    if "d" in bands:
        sys.path.insert(0, "/root/repo")
        import bench as benchmod

        print(f"stream: {benchmod.bench_stream():.0f} GB/s", flush=True)
        print(f"matmul: {benchmod.bench_matmul():.1f} TF/s bf16", flush=True)
        print(flush=True)

    if "A" in bands:
        print("== band A: precision tiers ==", flush=True)
        for n in (512, 1024, 2048, 3888):
            batch = max(128, 1 << (((1 << 26) // n).bit_length() - 1))
            re, im = data(n, batch)
            for prec in ("bf16x3", "bf16x2", "bf16"):
                row(n, batch, f"lanepack {prec}", lambda p=prec: time_fn(
                    lanepack.make_lanepack_fn(n, d, np.complex64, precision=p),
                    re, im))
            print(flush=True)
        for n in (4096, 16384):
            batch = max(16, (1 << 26) // n)
            re, im = data(n, batch)
            for prec in ("bf16x3", "bf16x2", "bf16"):
                row(n, batch, f"two_stage {prec}", lambda p=prec: time_fn(
                    fused.make_fused_two_stage_fn(
                        n, d, np.complex64, precision=p), re, im))
            print(flush=True)
        for n in (65536,):
            batch = max(8, (1 << 26) // n)
            re, im = data(n, batch)
            for prec in ("bf16x3", "bf16x2"):
                row(n, batch, f"radix {prec}", lambda p=prec: time_fn(
                    fused.make_fused_radix_fn(
                        n, d, np.complex64, precision=p), re, im))
            print(flush=True)
        from rustfft_tpu.ops.pallas import large as large_mod

        for n in (1 << 20,):
            batch = max(4, (1 << 26) // n)
            re, im = data(n, batch)
            for prec in ("bf16x3", "bf16x2"):
                row(n, batch, f"large {prec}", lambda p=prec: time_fn(
                    large_mod.make_large_fft_fn(
                        n, d, np.complex64, precision=p), re, im))
            print(flush=True)

    if "B" in bands:
        print("== band B: 3-kernel pipeline ==", flush=True)
        for n in (1 << 23, 1 << 24):
            batch = max(2, (1 << 26) // n)
            re, im = data(n, batch)
            sp = large3.choose_split3(n)
            row(n, batch, f"large3 {sp}", lambda: time_fn(
                large3.make_large3_fft_fn(n, d, np.complex64), re, im))
            # alternative splits
            if n == 1 << 23:
                for sp2 in ((256, 8, 64, 64, 4096), (128, 8, 64, 128, 8192)):
                    row(n, batch, f"large3 {sp2}", lambda s=sp2: time_fn(
                        large3.make_large3_fft_fn(
                            n, d, np.complex64, split=s), re, im))
            # XLA fallback reference
            config.use_pallas = "off"
            try:
                plan = FftPlanner().plan_fft_forward(n)
                row(n, batch, "xla six-step", lambda: time_fn(
                    plan.raw_fn, re, im))
            finally:
                config.use_pallas = "auto"
            print(flush=True)

    if "C" in bands:
        print("== band C: 65537 prime ==", flush=True)
        n, batch = 65537, 512
        re, im = data(n, batch)
        m = n - 1
        # isolated gather probes: lane vs row layout
        from rustfft_tpu.ops.raders import raders_tables

        perm_in, inv_gather, _ = raders_tables(n, d)
        idx = jax.device_put(perm_in.astype(np.int32))
        rem, imm = data(m, batch)

        def g_lane(x):
            return (jnp.take(x[0], idx, axis=-1), jnp.take(x[1], idx, axis=-1))

        def g_row(x):
            return (
                jnp.take(x[0].T, idx, axis=0).T,
                jnp.take(x[1].T, idx, axis=0).T,
            )

        row(m, batch, "gather lane (isolated)", lambda: time_fn(g_lane, rem, imm))
        row(m, batch, "gather row-T (isolated)", lambda: time_fn(g_row, rem, imm))

        # conv cores end-to-end through make_raders_fn
        for gather in ("lane", "row"):
            for min_m in (32768, 1 << 30):  # radix core on / dense core
                config.rader_gather = gather
                config.conv_radix_min_m = min_m
                name = "radix" if min_m == 32768 else "dense"
                row(n, batch, f"raders {name} core, {gather} gather",
                    lambda: time_fn(
                        conv.make_raders_fn(n, d, np.complex64), re, im))
        config.rader_gather = "lane"
        config.conv_radix_min_m = 65536
        # radix conv core batch-tile sweep (raders core, no gather changes)
        from rustfft_tpu.ops.raders import raders_tables as _rt

        _, _, b_fft = _rt(n, d)
        for tb in (2, 4, 8, 16):
            row(n, batch, f"conv_radix core m=65536 tb={tb}", lambda tb=tb: time_fn(
                conv_radix.make_radix_conv_fn(
                    m, d, np.complex64, h=b_fft, batch_tile=tb), rem, imm))
        # gather with explicit optimization barriers around the transposed
        # layout (stop XLA re-canonicalizing row gathers into lane gathers)
        def g_row_barrier(x):
            vr = jax.lax.optimization_barrier(x[0].T)
            vi = jax.lax.optimization_barrier(x[1].T)
            gr = jax.lax.optimization_barrier(jnp.take(vr, idx, axis=0))
            gi = jax.lax.optimization_barrier(jnp.take(vi, idx, axis=0))
            return gr.T, gi.T

        row(m, batch, "gather row-T barrier (isolated)",
            lambda: time_fn(g_row_barrier, rem, imm))
        # no-gather alternative: whole-n Bluestein at m = 262144 (= 4n)
        from rustfft_tpu.ops import bluestein as op_bluestein

        chirp, h_fft = op_bluestein.bluestein_tables(65537, 262144, d)
        row(65537, 256, "bluestein conv_radix m=262144", lambda: time_fn(
            conv_radix.make_radix_conv_fn(
                262144, d, np.complex64, h=h_fft, pre=chirp, post=chirp,
                conj_out=True, n_in=65537, n_out=65537),
            *data(65537, 256)))
        print(flush=True)

    if "D" in bands:
        print("== band D: conv batch-tile sweep ==", flush=True)
        for n, m in ((1009, 2048), (7919, 16384), (1234, 3072)):
            batch = 8192 if n < 4096 else 2048
            re, im = data(n, batch)
            from rustfft_tpu.ops import bluestein as op_bluestein

            chirp, h_fft = op_bluestein.bluestein_tables(n, m, d)
            for tb in (None, 64, 128, 256, 512):
                name = f"bluestein m={m} tb={tb or 'auto'}"
                row(n, batch, name, lambda tb=tb: time_fn(
                    conv.make_conv_fn(
                        m, d, np.complex64, h=h_fft, pre=chirp, post=chirp,
                        conj_out=True, n_in=n, n_out=n, batch_tile=tb),
                    re, im))
            print(flush=True)
        # repeat 1009 at the end of the run: route variance probe
        n, m = 1009, 2048
        re, im = data(n, 8192)
        from rustfft_tpu.ops import bluestein as op_bluestein

        chirp, h_fft = op_bluestein.bluestein_tables(n, m, d)
        for rep in range(3):
            row(n, 8192, f"bluestein m=2048 auto rep{rep}", lambda: time_fn(
                conv.make_conv_fn(
                    m, d, np.complex64, h=h_fft, pre=chirp, post=chirp,
                    conj_out=True, n_in=n, n_out=n),
                re, im))


if __name__ == "__main__":
    main()
