"""Benchmark harness: batched c64 FFT throughput on the default JAX device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: GFLOP/s at the standard 5*N*log2(N) FFT flop count (BASELINE.json),
geometric mean over the headline size sweep (pow2 sizes spanning the
four-step/MXU path, the 1234 planner scenario, and a Rader prime).

vs_baseline: ratio against numpy's pocketfft (np.fft.fft) on the host CPU for
the same shapes — the stand-in for the reference's class (an optimized CPU
FFT library; RustFFT publishes no absolute numbers, BASELINE.md).

Timing methodology: the tunneled TPU runtime does not synchronize on
block_until_ready and carries a ~25 ms dispatch+readback RTT per call, so
each measurement folds a RUNTIME-VARIABLE number of chained transforms into
one jitted lax.fori_loop (dynamic trip count: one compile for every k) and
times two chain lengths k1 < k2 — the per-iteration time is the
DIFFERENCE quotient (t(k2)-t(k1))/(k2-k1), which cancels the RTT exactly.
(The previous zero-work-probe subtraction left small chains RTT-noise
dominated: round-4's 1009 row measured 780%% of roofline on one run and NaN
on the next; differential timing on the same route reproduces ~0.95 ms/call
at every k.)
"""
from __future__ import annotations

import json
import math
import sys
import time

import numpy as np


def diff_time(many, x, floor_s: float = 0.0, rounds: int = 3,
              target_s: float = 0.25, max_k: int = 4096):
    """Per-iteration seconds for `many(x, k)` (k chained iterations, dynamic
    trip count) via two-point differential timing; returns (t_per, floored).

    Chooses dk so the k2 chain carries >= target_s of real work (RTT and
    contention amortize), then uses (min t2 - min t1)/dk.  A result under
    floor_s (the physical HBM floor) after retries is reported AS the floor,
    flagged, so impossible rates never enter the artifact.
    """
    k1 = 4
    float(many(x, k1))  # compile + warm
    t0 = time.perf_counter()
    float(many(x, k1))
    per_hint = (time.perf_counter() - t0) / k1  # overestimate (includes RTT)
    dk = 16
    for _ in range(4):
        while dk < max_k and per_hint * dk < target_s:
            dk *= 2
        k2 = k1 + dk
        t1s, t2s = [], []
        for _ in range(rounds):
            t0 = time.perf_counter()
            float(many(x, k1))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(many(x, k2))
            t2s.append(time.perf_counter() - t0)
        t_per = (min(t2s) - min(t1s)) / dk
        per_hint = max(t_per, 1e-7)
        if t_per >= floor_s and t_per * dk >= 0.25 * target_s:
            return max(t_per, 1e-9), False
        if dk >= max_k:
            break
        dk = min(max_k, dk * 4)
    if t_per < floor_s:
        return floor_s, True
    return max(t_per, 1e-9), False


def bench_config(n: int, batch: int, floor_s: float = 0.0,
                 inverse: bool = False):
    """floor_s: physical lower bound on the per-FFT time (one HBM read +
    one write at the same-run stream rate, with margin)."""
    import jax
    import jax.numpy as jnp

    from rustfft_tpu import FftPlanner

    planner = FftPlanner()
    plan = (
        planner.plan_fft_inverse(n) if inverse
        else planner.plan_fft_forward(n)
    )
    rng = np.random.default_rng(0)
    # tiny magnitudes so the chained unnormalized FFTs stay finite longer in
    # f32 without a per-iteration scale (which would add an elementwise HBM
    # pass XLA cannot fuse into the Pallas kernels); once a long chain does
    # overflow, inf/nan arithmetic runs at full rate on the TPU VPU/MXU
    re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
    im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
    raw = plan.raw_fn

    @jax.jit
    def many(x, k):
        x = jax.lax.fori_loop(0, k, lambda i, x: raw(x), x)
        return x[0].sum() + x[1].sum()

    def run(x, k):
        return many(x, jnp.asarray(k, jnp.int32))

    t_per, was_floored = diff_time(run, (re, im), floor_s=floor_s)
    if was_floored:
        print(f"# n={n}: differential time under the physical floor "
              f"({floor_s*1e3:.3f} ms) — reporting the floor, flagged",
              file=sys.stderr)
    gflops = 5.0 * batch * n * math.log2(n) / t_per / 1e9
    return t_per, gflops, was_floored


def bench_stream(nbytes: int = 1 << 28):
    """Same-run HBM stream rate (GB/s): chained elementwise scale, one read +
    one write per iteration, timed exactly like bench_config.

    The chip here is time-shared (CLAUDE.md: identical runs vary ~2x), so the
    roofline denominator must come from the same run as the FFT numbers.
    """
    import jax

    import jax.numpy as jnp

    size = nbytes // 4
    x = jax.device_put(np.full((size,), 1.0, np.float32))

    @jax.jit
    def many(x, k):
        # loop iterations cannot fuse with each other: each is 1 read + 1 write
        return jax.lax.fori_loop(0, k, lambda i, v: v * 1.0000001, x)[0]

    t_per, _ = diff_time(lambda x, k: many(x, jnp.asarray(k, jnp.int32)), x)
    return 2 * 4 * size / t_per / 1e9


def bench_matmul(dim: int = 4096):
    """Same-run MXU bf16 matmul rate (TFLOP/s): chained (dim, dim) single-pass
    bf16 dots, timed exactly like bench_config.  This is the compute-roofline
    denominator for the op-count-bound bands (the memory stream rate is the
    denominator for the bandwidth-bound ones)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    w = jax.device_put(
        (rng.standard_normal((dim, dim)) * 0.01).astype(jnp.bfloat16)
    )
    v = jax.device_put(
        (rng.standard_normal((dim, dim)) * 0.01).astype(jnp.bfloat16)
    )

    @jax.jit
    def many(v, k):
        def body(i, v):
            return jax.lax.dot(
                v, w, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)

        # full-matrix readback: a [0,0] scalar readback lets XLA propagate
        # the slice back through the chain (each iteration collapses to one
        # row — measured 14 PFLOP/s, i.e. nonsense); the sum forces every
        # element of every iteration
        return jnp.sum(
            jax.lax.fori_loop(0, k, body, v).astype(jnp.float32)
        )

    t_per, _ = diff_time(lambda v, k: many(v, jnp.asarray(k, jnp.int32)), v)
    return 2.0 * dim**3 / t_per / 1e12


def mxu_flops_per_point(n: int):
    """Model of bf16 MXU flops per signal point for the tier serving n, or
    None when the size rides the XLA path (no closed-form model).

    Per GEMM pass over a factor r the block-complex contraction costs 8r
    flops/point; the bf16x3 precision tier triples passes (bf16x2: doubles).
    Conv (Rader/Bluestein) routes run 2 FFTs of the inner length m, scaled
    by m/n points, with the boundary-stage trim on stages A/B'.
    """
    from rustfft_tpu import executor
    from rustfft_tpu.config import config
    from rustfft_tpu.ops.pallas import conv, fused, lanepack, large

    passes = {
        "bf16x3": 3, "bf16x3s": 3, "bf16x2": 2, "bf16x2s": 2, "bf16": 1
    }.get(config.pallas_precision, 6)
    route = executor.pallas_route(n, np.complex64, mode="tpu")
    # complex-GEMM flop factor per unit K: 8 for the block form
    # ([xr xi] @ 2Kx2K block), 6 for the Gauss 3-multiplication form
    # (3 real dots of K each) — the default at the routes below
    if route == "dense":
        from rustfft_tpu.ops.pallas import dense

        g = dense._pack_group(n)
        npad = dense._n_pad(g * n)
        # flop factor tracks the kernel's own variant chooser (block GEMM
        # = 8 flops/unit-K, Gauss 3-mult = 6); per-point K is npad^2/(g*n)
        fac = 8 if dense.choose_variant(n) == "block" else 6
        return fac * npad * npad / (g * n) * passes
    if route == "lanepack":
        return 8 * sum(lanepack.choose_radices(n)) * passes
    if route == "two_stage":
        p, q = fused._choose_pq(n)
        fac = 6 if config.two_stage_variant == "gauss" else 8
        return fac * (p + q) * passes
    if route == "radix":
        r, p, q = fused.choose_rpq(n)
        # every ctwg* variant (incl. the flat-view ctwgx default) uses the
        # Gauss 3-multiplication contractions
        fac = 6 if config.radix_variant.startswith("ctwg") else 8
        return fac * (p + q) * passes
    if route == "large":
        p, q1, q2 = large.choose_pqq(n)
        return 8 * (p + q1 + q2) * passes
    if route in ("large3", "large2f"):
        # large2f fuses large3's pass 2 into the column stage; the MXU pass
        # count is unchanged (the P2 digit rides the VPU in both)
        from rustfft_tpu.ops.pallas import large2f, large3

        split = (
            large2f.choose_split2f(n)
            if route == "large2f"
            else large3.choose_split3(n)
        )
        p1, p2, q1, q2, q = split
        return 8 * (p1 + q1 + q2) * passes
    if route == "large_pad":
        from rustfft_tpu.ops.pallas import largepad

        p, q1, q2 = largepad.choose_pq_padded(n)
        pad = largepad._r128(p) * largepad._r128(q1 * q2) / n
        return 8 * (p + q1 + q2) * passes * pad
    # prime classes: the conv kernel if the planner's inner length admits it
    from rustfft_tpu import FftPlanner
    from rustfft_tpu import recipes

    recipe = FftPlanner().plan_fft_forward(n).recipe
    if isinstance(recipe, (recipes.Raders, recipes.Bluesteins)):
        m = recipe.inner.length
        if m >= config.conv_radix_min_m and fused.choose_rpq(m) is not None:
            r, p, q = fused.choose_rpq(m)  # radix conv core: 2 vpur FFTs
            return 2 * 8 * (p + q) * passes * m / n
        if conv.conv_supported(m, np.complex64):
            p, q = fused._choose_pq(m)
            p_in = -(-n // q)
            # stages: A (K=2*p_in), B (q), A' (q), B' (M=2*p_out~p_in)
            per_m = 8 * (p_in + q + q + p_in) * passes
            return per_m * m / n
        from rustfft_tpu.ops.pallas import convlarge

        if config.use_bconv_fused and isinstance(
            recipe, recipes.Bluesteins
        ) and convlarge.bconv_supported(
            m, np.complex64
        ) and executor.pallas_route(m, np.complex64, mode="tpu") == "large":
            p, q1, q2 = large.choose_pqq(m)
            q = q1 * q2
            pkeep = min(p, -(-((n - 1) // q + 1) // 128) * 128)
            # A: P; B_conv: two FFT_Q passes; A2: the kept DFT_P rows
            return (8 * p + 16 * (q1 + q2) + 8 * pkeep) * passes * m / n
    return None


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
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.fft.fft(x, axis=-1)
        ts.append(time.perf_counter() - t0)
    # min-of-iters: the host runs the CPU test suite and compile helpers
    # concurrently, and a mean lets that contention inflate vs_baseline
    # run-to-run (measured 827 vs 354 between two same-day runs)
    t = min(ts)
    return 5.0 * base_batch * n * math.log2(n) / t / 1e9


def main():
    # Bounded device acquisition: when the tunneled chip is unreachable,
    # jax.devices() blocks forever inside the plugin — emit the JSON line
    # with an error instead of hanging the caller.
    import os
    import threading

    probe = threading.Thread(
        target=lambda: __import__("jax").devices(), daemon=True
    )
    probe.start()
    probe.join(600)
    if probe.is_alive():
        print(
            json.dumps(
                {
                    "metric": "batched c64 FFT GFLOP/s",
                    "value": 0.0,
                    "unit": "GFLOP/s (5N log2 N)",
                    "vs_baseline": 0.0,
                    "error": "device unavailable: jax.devices() did not "
                    "return within 600s (TPU tunnel down)",
                }
            ),
            flush=True,
        )
        os._exit(1)

    # remote AOT compiles on the tunneled chip run ~30-60s per shape; persist
    # executables so reruns (and repeated driver invocations) skip them
    from rustfft_tpu.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    # (n, batch, inverse).  The original 12 sizes are kept verbatim for
    # cross-round continuity; round 5 adds the dense-tier small band
    # (256/512 — BASELINE scenario 2's 2..1024 sweep band, previously
    # unrepresented) and one inverse row (scenario 2 is fwd+inv; inverse
    # throughput had never entered a driver artifact).  README documents
    # the set change.
    configs = [
        (1024, 65536, False),
        (4096, 16384, False),
        (65536, 1024, False),
        (1 << 20, 64, False),
        (1 << 22, 16, False),
        (1 << 23, 8, False),  # fused 2-kernel tier (reference benches to 2^24)
        (1 << 24, 4, False),
        (1 << 25, 2, False),  # beyond the reference's bench envelope (large2f)
        (1234, 8192, False),  # BASELINE config 1 (planner path, non-pow2)
        (1009, 8192, False),  # BASELINE config 3 (Rader prime)
        (65537, 512, False),  # BASELINE config 3 (largest prime; Rader inner 2^16)
        (3888, 16384, False),  # BASELINE config 4 (2^4 * 3^5 mixed radix)
        (256, 262144, False),  # dense whole-DFT MXU tier (BASELINE scenario 2)
        (512, 131072, False),  # dense tier, upper small band
        (65536, 1024, True),  # inverse direction (BASELINE scenario 2 is fwd+inv)
    ]

    stream_gbps = bench_stream()
    mxu_tflops = bench_matmul()
    print(
        f"# stream: {stream_gbps:.0f} GB/s, MXU bf16 {mxu_tflops:.0f} TFLOP/s"
        f" (same-run roofline denominators)",
        file=sys.stderr,
    )

    results = []
    roofline_pcts = []
    skipped = []
    floored = []
    for n, batch, inverse in configs:
        # physical floor: one HBM read + write of the f32 pair per FFT at
        # 1.5x the measured stream rate (margin for stream-probe noise)
        floor_s = 16.0 * batch * n / (stream_gbps * 1.5e9)
        try:
            try:
                t_per, gflops, was_floored = bench_config(
                    n, batch, floor_s=floor_s, inverse=inverse
                )
            except Exception as e:  # noqa: BLE001 — the remote compile
                # helper occasionally dies transiently (SIGABRT/HTTP 500
                # observed 2026-08-18); one retry before dropping the row.
                # Deterministic failures (unsupported-size asserts, VMEM
                # rejections) skip the retry — no point paying a second
                # 20-40s AOT compile for a permanently-broken row.
                msg = str(e)
                transient = any(
                    s in msg
                    for s in ("SIGABRT", "500", "503", "Connection",
                              "timeout", "Timeout", "INTERNAL",
                              "UNAVAILABLE", "ABORTED", "Socket")
                )
                if not transient:
                    raise
                print(f"# n={n:>8}: retrying after ({msg[:120]})",
                      file=sys.stderr)
                t_per, gflops, was_floored = bench_config(
                    n, batch, floor_s=floor_s, inverse=inverse
                )
            if was_floored:
                floored.append(n)
        except Exception as e:  # noqa: BLE001 — one broken tier must not
            # zero the whole driver artifact; record and keep going
            skipped.append(n)
            print(f"# n={n:>8} batch={batch:>6}: SKIPPED ({str(e)[:200]})",
                  file=sys.stderr)
            continue
        base_gflops = bench_numpy(n)
        mem_roof = roofline_gflops(n, stream_gbps)
        fpp = mxu_flops_per_point(n)
        if fpp is not None:
            comp_roof = 5.0 * math.log2(n) * mxu_tflops * 1e3 / fpp
            roof = min(mem_roof, comp_roof)
            wall = "mem" if mem_roof <= comp_roof else "mxu"
            comp_txt = f"{comp_roof:7.0f}"
        else:
            roof, wall, comp_txt = mem_roof, "mem", "      -"
        pct = 100.0 * gflops / roof
        results.append((gflops, base_gflops))
        roofline_pcts.append(pct)
        tag = " inv" if inverse else ""
        print(
            f"# n={n:>8}{tag} batch={batch:>6}: {t_per*1e3:8.3f} ms/fft "
            f"{gflops:9.1f} GFLOP/s | roof mem {mem_roof:7.0f} mxu {comp_txt}"
            f" -> {pct:5.1f}% of {wall} "
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
                "{256,512,1024,4096,65536(fwd+inv),2^20,2^22..2^25,"
                "1234,1009,65537,3888}",
                "value": round(geo, 2),
                "unit": "GFLOP/s (5N log2 N)",
                "vs_baseline": round(geo / geo_base, 2),
                "roofline_pct_geomean": round(geo_roof, 1),
                "stream_gbps": round(stream_gbps, 1),
                "mxu_bf16_tflops": round(mxu_tflops, 1),
                **({"skipped_sizes": skipped} if skipped else {}),
                **({"floored_sizes": floored} if floored else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
