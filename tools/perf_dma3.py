"""Round-4 DMA follow-ups: lane-width ladder + in-place one-pass kernels.

perf_dma2 (hardware) found: flat (8, 65536) Pallas copy = 619 GB/s ~= XLA
stream (653), the kernels' (tb*256, 256) layout = 222-293 GB/s, aliased
flat copy = 791 GB/s, and the ALIASED two-stage kernel at 65536 ran +24%
in a chained loop (844 vs 679 GF/s) — overturning the round-2 negative.

This tool decides the knobs:
  1. lane-width ladder: pure pallas pair copy at q lanes for q in
     128..16384 at fixed bytes — is the blocked-layout penalty a narrow-
     lane effect (kernels could prefer wider-q splits) or specific to
     the (tb*p, q) sublane-heavy views?
  2. in-place rows: radix kernel (new in_place=) and two-stage at
     every one-pass size with a square split, aliased vs normal, chained
     loop — sets config.pallas_in_place.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_dma3.py
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

TOTAL = 1 << 26  # f32 points per component (256MB pair)


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
    d = FftDirection.FORWARD
    nbytes = 16.0 * TOTAL

    def copy2(xr_ref, xi_ref, or_ref, oi_ref):
        or_ref[:] = xr_ref[:]
        oi_ref[:] = xi_ref[:]

    # 1. lane-width ladder at ~2MB blocks (same bytes, same grid length)
    print("-- lane-width ladder (pure copy, ~2MB blocks) --", flush=True)
    for q in (128, 256, 512, 1024, 4096, 16384):
        rows = TOTAL // q
        rows_b = max(8, (1 << 19) // q)  # ~2MB f32 block
        re = jax.device_put(
            (rng.standard_normal((rows, q)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((rows, q)) * 1e-30).astype(np.float32)
        )
        spec = pl.BlockSpec((rows_b, q), i32map(lambda i: (i, 0)),
                            memory_space=pltpu.VMEM)

        def call(x, rows=rows, rows_b=rows_b, q=q, spec=spec):
            return tuple(pl.pallas_call(
                copy2,
                grid=(rows // rows_b,),
                in_specs=[spec, spec],
                out_specs=[spec, spec],
                out_shape=[jax.ShapeDtypeStruct((rows, q), jnp.float32)] * 2,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=112 * 1024 * 1024
                ),
            )(x[0], x[1]))

        try:
            t = time_fn(call, re, im)
            print(f"  q={q:>6} block=({rows_b},{q}): {t*1e3:8.3f} ms "
                  f"{nbytes/t/1e9:7.1f} GB/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  q={q:>6}: FAILED {str(e)[:200]}", flush=True)

    # 2. in-place vs normal, every square one-pass size, chained loop
    print("-- in-place one-pass kernels --", flush=True)
    for n in (16384, 32768, 65536, 131072, 262144):
        batch = TOTAL // n
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
        makers = []
        if fused.radix_supported(n, np.complex64):
            makers += [
                ("radix      ", lambda n=n: fused.make_fused_radix_fn(
                    n, d, np.complex64)),
                ("radix IP   ", lambda n=n: fused.make_fused_radix_fn(
                    n, d, np.complex64, in_place=True)),
            ]
        pq = fused._choose_pq(n)
        if pq and pq[0] == pq[1] and pq[0] >= 128:
            makers += [
                ("two-stage  ", lambda n=n: fused.make_fused_two_stage_fn(
                    n, d, np.complex64)),
                ("two-stage IP", lambda n=n: fused.make_fused_two_stage_fn(
                    n, d, np.complex64, in_place=True)),
            ]
        for label, make in makers:
            try:
                fn = make()
                t = time_fn(fn, re, im)
                print(f"  n={n:>6} {label}: {t*1e3:8.3f} ms {gf(t):7.1f} GF/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  n={n:>6} {label}: FAILED {str(e)[:200]}", flush=True)

    # accuracy pin for the aliased radix kernel (new Mosaic path)
    n = 65536
    xs = (rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n))
          ).astype(np.complex64)
    try:
        fn = fused.make_fused_radix_fn(n, d, np.complex64, in_place=True)
        o_r, o_i = fn((xs.real.astype(np.float32), xs.imag.astype(np.float32)))
        out = np.asarray(o_r) + 1j * np.asarray(o_i)
        ref = np.fft.fft(xs.astype(np.complex128), axis=-1)
        rel = np.mean(np.abs(out - ref)) / np.mean(np.abs(ref))
        print(f"radix in_place rel err @65536 = {rel:.3e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"radix in_place accuracy FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
