"""In-kernel Pallas permutation vs XLA gathers on TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_permute.py
         [--batch 512] [--m 65536]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def timed(fn, args, iters=8):
    import jax

    @jax.jit
    def many(x):
        x = jax.lax.fori_loop(0, iters, lambda i, x: fn(x), x)
        return x[0].sum() + x[1].sum()

    float(many(args))
    t0 = time.perf_counter()
    float(many(args))
    return max((time.perf_counter() - t0) / iters, 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from rustfft_tpu.ops.pallas import permute

    batch, m = 512, 65536
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--batch":
            batch = int(args[i + 1])
        if a == "--m":
            m = int(args[i + 1])

    rng = np.random.default_rng(0)
    perm = rng.permutation(m)
    re = jax.device_put(rng.standard_normal((batch, m)).astype(np.float32))
    im = jax.device_put(rng.standard_normal((batch, m)).astype(np.float32))
    idx = jax.device_put(perm.astype(np.int32))
    gbs = lambda t: 2 * 2 * 4 * batch * m / t / 1e9  # in+out, f32 pair

    def xla_take(x):
        return jnp.take(x[0], idx, axis=1), jnp.take(x[1], idx, axis=1)

    cands = [("xla two-f32 take", lambda: xla_take)]
    for tb in (None, 4, 8, 16):
        cands.append((
            f"pallas tb={tb or 'auto'}",
            lambda tb=tb: permute.make_permute_fn(perm, tb=tb),
        ))

    ref = None
    for name, mk in cands:
        try:
            fn = mk()
            t = timed(fn, (re, im))
            o_r, _ = fn((re[:1], im[:1]))
            got = np.asarray(o_r[0])
            want = np.asarray(re[0])[perm]
            exact = np.array_equal(got, want)
            print(
                f"{name:18}: {t*1e3:7.3f} ms  {gbs(t):6.1f} GB/s eff"
                f"  exact={exact}",
                flush=True,
            )
        except Exception as e:
            msg = " ".join(str(e).split("\n"))[:200]
            print(f"{name:18}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
