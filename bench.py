"""Benchmark harness: batched c64 FFT throughput on the default JAX device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: GFLOP/s at the standard 5*N*log2(N) FFT flop count (BASELINE.json),
geometric mean over the headline size sweep (pow2 sizes spanning the
four-step/MXU path, the 1234 planner scenario, and a Rader prime).

vs_baseline: ratio against numpy's pocketfft (np.fft.fft) on the host CPU for
the same shapes — the stand-in for the reference's class (an optimized CPU
FFT library; RustFFT publishes no absolute numbers, BASELINE.md).

Timing methodology: the tunneled TPU runtime here does not synchronize on
block_until_ready, so each measurement folds `iters` chained transforms into
ONE jitted lax.fori_loop and forces execution with a scalar readback; a
zero-work dispatch+readback probe is subtracted as overhead.
"""
from __future__ import annotations

import json
import math
import sys
import time

import numpy as np


def bench_config(n: int, batch: int, iters: int = 8):
    import jax

    from rustfft_tpu import FftPlanner

    plan = FftPlanner().plan_fft_forward(n)
    rng = np.random.default_rng(0)
    # tiny magnitudes so `iters` chained unnormalized FFTs (growth ~n^(iters/2))
    # stay finite in f32 without a per-iteration scale (which would add an
    # elementwise HBM pass that XLA cannot fuse into the Pallas kernels)
    re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
    im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
    raw = plan.raw_fn

    @jax.jit
    def many(x):
        x = jax.lax.fori_loop(0, iters, lambda i, x: raw(x), x)
        return x[0].sum() + x[1].sum()

    @jax.jit
    def nothing(x):
        return x[0][0, 0] + x[1][0, 0]

    float(many((re, im)))  # compile + warm
    float(nothing((re, im)))
    t0 = time.perf_counter()
    float(nothing((re, im)))
    t_over = time.perf_counter() - t0
    # the device may be time-shared; best-of-3 approximates unloaded speed
    t_total = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(many((re, im)))
        t = time.perf_counter() - t0
        t_total = t if t_total is None else min(t_total, t)
    t_per = max((t_total - t_over) / iters, 1e-9)
    gflops = 5.0 * batch * n * math.log2(n) / t_per / 1e9
    return t_per, gflops


def bench_stream(nbytes: int = 1 << 28, iters: int = 8):
    """Same-run HBM stream rate (GB/s): chained elementwise scale, one read +
    one write per iteration, timed exactly like bench_config.

    The chip here is time-shared (CLAUDE.md: identical runs vary ~2x), so the
    roofline denominator must come from the same run as the FFT numbers.
    """
    import jax

    size = nbytes // 4
    x = jax.device_put(np.full((size,), 1.0, np.float32))

    @jax.jit
    def many(x):
        # loop iterations cannot fuse with each other: each is 1 read + 1 write
        return jax.lax.fori_loop(0, iters, lambda i, v: v * 1.0000001, x)[0]

    @jax.jit
    def nothing(x):
        return x[0]

    float(many(x))
    float(nothing(x))
    t0 = time.perf_counter()
    float(nothing(x))
    t_over = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(x))
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    t_per = max((best - t_over) / iters, 1e-9)
    return 2 * 4 * size / t_per / 1e9


def roofline_gflops(n: int, stream_gbps: float) -> float:
    """Memory-bound speed of light: one HBM read + one write of the c64
    signal (16 bytes/point as an f32 pair) at the measured stream rate,
    expressed in the 5N log2 N flop convention."""
    t_per_point = 16.0 / (stream_gbps * 1e9)
    return 5.0 * math.log2(n) / t_per_point / 1e9


def bench_numpy(n: int, batch_cap: int = 1 << 22, iters: int = 3):
    base_batch = max(1, batch_cap // n)
    rng = np.random.default_rng(0)
    x = (
        rng.standard_normal((base_batch, n)) + 1j * rng.standard_normal((base_batch, n))
    ).astype(np.complex64)
    np.fft.fft(x, axis=-1)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        np.fft.fft(x, axis=-1)
    t = (time.perf_counter() - t0) / iters
    return 5.0 * base_batch * n * math.log2(n) / t / 1e9


def main():
    # remote AOT compiles on the tunneled chip run ~30-60s per shape; persist
    # executables so reruns (and repeated driver invocations) skip them
    from rustfft_tpu.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    configs = [
        (1024, 65536),
        (4096, 16384),
        (65536, 1024),
        (1 << 20, 64),
        (1 << 22, 16),  # above-2^20 tier (reference benches pow2 to 2^24)
        (1234, 8192),  # BASELINE config 1 (planner path, non-pow2)
        (1009, 8192),  # BASELINE config 3 (Rader prime)
        (65537, 512),  # BASELINE config 3 (largest prime; Rader inner 2^16)
        (3888, 16384),  # BASELINE config 4 (2^4 * 3^5 mixed radix)
    ]

    stream_gbps = bench_stream()
    print(f"# stream: {stream_gbps:.0f} GB/s (same-run roofline denominator)",
          file=sys.stderr)

    results = []
    roofline_pcts = []
    for n, batch in configs:
        t_per, gflops = bench_config(n, batch)
        base_gflops = bench_numpy(n)
        roof = roofline_gflops(n, stream_gbps)
        pct = 100.0 * gflops / roof
        results.append((gflops, base_gflops))
        roofline_pcts.append(pct)
        print(
            f"# n={n:>8} batch={batch:>6}: {t_per*1e3:8.3f} ms/fft "
            f"{gflops:9.1f} GFLOP/s | roofline {roof:7.1f} -> {pct:5.1f}% "
            f"| numpy cpu {base_gflops:6.1f} | ratio {gflops/base_gflops:8.1f}x",
            file=sys.stderr,
        )

    geo = math.exp(sum(math.log(g) for g, _ in results) / len(results))
    geo_base = math.exp(sum(math.log(b) for _, b in results) / len(results))
    geo_roof = math.exp(sum(math.log(p) for p in roofline_pcts) / len(roofline_pcts))
    print(
        json.dumps(
            {
                "metric": "batched c64 FFT GFLOP/s, geomean over sizes "
                "{1024,4096,65536,2^20,2^22,1234,1009,65537,3888}",
                "value": round(geo, 2),
                "unit": "GFLOP/s (5N log2 N)",
                "vs_baseline": round(geo / geo_base, 2),
                "roofline_pct_geomean": round(geo_roof, 1),
                "stream_gbps": round(stream_gbps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
