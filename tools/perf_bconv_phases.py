"""Phase budget of the fused 3-kernel Bluestein conv (convlarge) at 746497.

VERDICT r4 item 3 prep: before fusing anything, find where the time goes.
Rows (same run, differential timer):

  plan        full planner route end-to-end (Bluesteins recipe)
  fused       convlarge apply (prologue + 3-kernel core + epilogue)
  prologue    chirp-multiply + pad to m (one fused XLA write)
  core        the 3 pallas kernels (A, B_conv, A2) alone
  epilogue    transpose + truncate + conj + chirp (XLA)
  large fft   large.make_large_fft_fn(m) = kernels A+B alone — B_conv is
              B with a second chained FFT_Q + H mult, so core - largefft
              approximates A2 + B_conv's extra work
  stream floor per-point HBM volumes at 600 GB/s for the fused route

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_bconv_phases.py [n ...]
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from rustfft_tpu import FftDirection, FftPlanner
    from rustfft_tpu.config import enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import convlarge, large

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    sizes = [int(a) for a in sys.argv[1:]] or [746497]
    for n in sizes:
        m = 3 * 2 ** 19 if n == 746497 else None
        if m is None:
            from rustfft_tpu.planner import _bluestein_inner_candidates
            m = min(_bluestein_inner_candidates(n))
        batch = max(4, min(4096, (1 << 25) // n))
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        re_m = jax.device_put(
            (rng.standard_normal((batch, m)) * 1e-30).astype(np.float32)
        )
        im_m = jax.device_put(
            (rng.standard_normal((batch, m)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
        ms = lambda t: t * 1e3  # noqa: E731
        print(f"n={n} m={m} batch={batch}", flush=True)

        fused = convlarge.make_bluestein_large_fn(n, m, d, np.complex64)
        p, q1, q2, pkeep = fused.split
        q = q1 * q2
        print(f"  split P={p} q1={q1} q2={q2} pkeep={pkeep}", flush=True)
        z_r = jax.device_put(np.zeros((batch, q, pkeep), np.float32))
        z_i = jax.device_put(np.zeros((batch, q, pkeep), np.float32))

        def pro_epi(x):
            """Chainable prologue + epilogue (slice to the A2 out shape in
            between): isolates the two XLA passes around the 3-kernel core.
            Round-5 shapes: epilogue input is the fused-A2 (B, pkeep, Q)
            layout (transpose/conj/chirp now live inside the kernel)."""
            yr, yi = fused.prologue(*x)
            b = yr.shape[0]
            zr = yr[:, : pkeep * q].reshape(b, pkeep, q)
            zi = yi[:, : pkeep * q].reshape(b, pkeep, q)
            return fused.epilogue(zr, zi, b)

        rows = [
            ("plan    ", lambda: FftPlanner().plan_fft_forward(n).raw_fn,
             (re, im)),
            ("fused   ", lambda: fused, (re, im)),
            ("pro+epi ", lambda: pro_epi, (re, im)),
            ("largefft", lambda: large.make_large_fft_fn(m, d, np.complex64),
             (re_m, im_m)),
        ]
        for label, mk, args in rows:
            try:
                fn = mk()
                t = time_fn(fn, *args)
                print(f"  {label}: {ms(t):8.3f} ms  {gf(t):7.1f} GF/s-eq",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {label}: FAILED {str(e)[:200]}", flush=True)

        vol = (n + m) + 2 * m + 2 * m + (m + pkeep * q) + (pkeep * q + n)
        floor = vol * batch * 8 / 600e9
        print(f"  fused stream floor @600GB/s ~ {ms(floor):8.3f} ms "
              f"({vol / n:.1f} n-volumes c64)", flush=True)


if __name__ == "__main__":
    main()
