"""Fused in-kernel Rader permutations vs XLA gathers at 65537.

Compares, in ONE process (time-shared chip — within-run only):
  1. raders radix core + FUSED Benes perms (conv_radix in_perm/out_perm)
  2. raders radix core + XLA lane gathers (r2 state: ~231 GF/s)
  3. raders dense core + standalone Benes permute kernels
  4. isolated standalone permute kernel vs lane gather pair

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_fusedperm.py
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

    from rustfft_tpu import FftDirection
    from rustfft_tpu.config import config
    from rustfft_tpu.config import enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import conv, permute

    enable_persistent_compilation_cache()
    print(f"device={jax.devices()[0]}", flush=True)
    sys.path.insert(0, "/root/repo")
    import bench as benchmod

    print(f"stream: {benchmod.bench_stream():.0f} GB/s", flush=True)

    d = FftDirection.FORWARD
    rng = np.random.default_rng(0)
    n, batch = 65537, 512
    m = n - 1
    re = jax.device_put(
        (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
    im = jax.device_put(
        (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))

    def row(name, thunk, pts=n):
        gf = 5.0 * batch * pts * math.log2(pts) / 1e9
        try:
            t = thunk()
        except Exception as e:  # noqa: BLE001
            print(f"{name:<44} FAILED {type(e).__name__}: {e}"[:180],
                  flush=True)
            return
        print(f"{name:<44} {t*1e3:8.3f} ms  {gf/t:8.1f} GF/s", flush=True)

    # 1. fused perms, radix core (the new path), tb sweep
    config.rader_gather = "kernel"
    config.conv_radix_min_m = 65536
    for tb in (None, 4, 8, 16):
        row(f"raders radix FUSED perms tb={tb or 'auto'}",
            lambda tb=tb: time_fn(
                conv.make_raders_fn(n, d, np.complex64, batch_tile=tb),
                re, im))

    # 2. radix core + XLA lane gathers (r2 best)
    config.rader_gather = "lane"
    row("raders radix core, lane gathers",
        lambda: time_fn(conv.make_raders_fn(n, d, np.complex64), re, im))

    # 3. dense core + standalone permute kernels
    config.rader_gather = "kernel"
    config.conv_radix_min_m = 1 << 30
    row("raders dense core, standalone permute",
        lambda: time_fn(conv.make_raders_fn(n, d, np.complex64), re, im))
    config.conv_radix_min_m = 65536

    # 4. isolated: standalone permute kernel vs lane gather pair
    perm = rng.permutation(m)
    rem = jax.device_put(
        (rng.standard_normal((batch, m)) * 1e-30).astype(np.float32))
    imm = jax.device_put(
        (rng.standard_normal((batch, m)) * 1e-30).astype(np.float32))
    idx = jnp.asarray(perm.astype(np.int32))
    row("isolated lane gather pair (m)", lambda: time_fn(
        lambda x: (jnp.take(x[0], idx, axis=-1),
                   jnp.take(x[1], idx, axis=-1)), rem, imm), pts=m)
    row("isolated permute kernel (m)", lambda: time_fn(
        permute.make_permute_fn(perm), rem, imm), pts=m)

    config.rader_gather = "kernel"


if __name__ == "__main__":
    main()
