"""Single-dot cat tiers (bf16x3s/bf16x2s) vs the multi-dot incumbents.

The cat tiers compute the SAME terms as bf16x3/bf16x2 as ONE MXU dot over a
concatenated contraction axis (ops/pallas/fused.py CAT_TIERS).  The small-n
band is op-count-bound (CLAUDE.md lanepack anatomy: ~30 per-group ops, 12
half-dots, no dominant single cost), so collapsing 6 dots + 5 adds per stage
into 1 dot is the designed attack on its ~370 GF/s ceiling.  For K=128
stages (two-stage/radix/large tiers) the FLOP-passes are equal and only the
instruction count and f32 output adds drop — sweep decides.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_cat.py [n ...]
Flip: config.pallas_precision = "bf16x3s" if the sweep shows >= parity
(identical accuracy to bf16x3 by construction; spot-checked here anyway).
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

# (n, family): lanepack band, two-stage band, radix band, large band
DEFAULT = [512, 1024, 2048, 3888, 4096, 16384, 65536, 1 << 20]


def main():
    import jax

    from rustfft_tpu import FftDirection
    from rustfft_tpu.config import config, enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import fused, lanepack, large

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    sizes = [int(a) for a in sys.argv[1:]] or DEFAULT
    for n in sizes:
        batch = max(8, min(1 << 17, (1 << 26) // n))
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
        print(f"n={n} batch={batch}", flush=True)

        def factories():
            if lanepack.lanepack_supported(n, np.complex64) and n <= 7776:
                yield "lanepack", lambda prec: lanepack.make_lanepack_fn(
                    n, d, np.complex64, precision=prec
                )
            if fused.fused_supported(n, np.complex64) and 4096 <= n <= 262144:
                yield "two-stage", lambda prec: fused.make_fused_two_stage_fn(
                    n, d, np.complex64, precision=prec
                )
            if fused.radix_supported(n, np.complex64):
                yield "radix-r", lambda prec: fused.make_fused_radix_fn(
                    n, d, np.complex64, precision=prec
                )
            if n >= (1 << 19) and large.large_supported(n, np.complex64):
                yield "large", lambda prec: large.make_large_fft_fn(
                    n, d, np.complex64, precision=prec
                )

        for fam, make in factories():
            # accuracy spot check of the cat tier on hardware (the cat dot
            # is a different Mosaic lowering — pin numerics, not just speed)
            try:
                xs = (
                    rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n))
                ).astype(np.complex64)
                fn = make("bf16x3s")
                o_r, o_i = fn((xs.real.astype(np.float32), xs.imag.astype(np.float32)))
                out = np.asarray(o_r) + 1j * np.asarray(o_i)
                ref = np.fft.fft(xs.astype(np.complex128), axis=-1)
                rel = np.mean(np.abs(out - ref)) / np.mean(np.abs(ref))
                print(f"  {fam} bf16x3s rel err = {rel:.3e}", flush=True)
            except Exception as e:  # noqa: BLE001 — keep the sweep alive
                print(f"  {fam} bf16x3s accuracy FAILED {str(e)[:300]}", flush=True)

            precs = ["bf16x3", "bf16x3s"]
            if n <= 4096:
                precs += ["bf16x2", "bf16x2s"]
            for prec in precs:
                try:
                    fn = make(prec)
                    t = time_fn(fn, re, im)
                    print(
                        f"  {fam:<10} {prec:<8}: {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s",
                        flush=True,
                    )
                except Exception as e:  # noqa: BLE001
                    print(f"  {fam:<10} {prec:<8}: FAILED {str(e)[:300]}", flush=True)

        # under cat, the radix-choice calculus changes: a 3-stage split's
        # three single-pass cat dots (6r <= 128 each) can beat the default
        # "fewer, fatter" 2-stage split (one 3-pass + one 1-pass dot)
        alt_radices = {
            1024: [(32, 32), (16, 16, 4), (16, 8, 8)],
            2048: [(16, 16, 8), (32, 8, 8)],
            512: [(8, 8, 8), (32, 16)],
        }.get(n, [])
        for rads in alt_radices:
            try:
                fn = lanepack.make_lanepack_fn(
                    n, d, np.complex64, radices=rads, precision="bf16x3s"
                )
                t = time_fn(fn, re, im)
                print(
                    f"  lanepack r={str(rads):<14} bf16x3s: {t*1e3:8.3f} ms  "
                    f"{gf(t):7.1f} GF/s", flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"  lanepack r={rads} FAILED {str(e)[:200]}", flush=True)

        # with the op tax gone, DMA block size may become binding: group
        # sweep (g 128-row groups per grid step; default 1 below n=3000)
        if n <= 2048 and lanepack.lanepack_supported(n, np.complex64):
            for g in (2, 4):
                try:
                    fn = lanepack.make_lanepack_fn(
                        n, d, np.complex64, precision="bf16x3s", group=g
                    )
                    t = time_fn(fn, re, im)
                    print(
                        f"  lanepack g={g} bf16x3s: {t*1e3:8.3f} ms  "
                        f"{gf(t):7.1f} GF/s", flush=True,
                    )
                except Exception as e:  # noqa: BLE001
                    print(f"  lanepack g={g} FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
