"""Round-5 DMA layout rule: pin WHY narrow-lane views copy 1.5x faster.

perf_onepass5/perf_dmafloor (2026-08-19, same-run) measured the SAME bytes:
  (65536, 512)  radix-kernel view   -> 220 GB/s
  (524288, 128) narrow view         -> 326 GB/s
  (512, 65536)  flat view           -> 330 GB/s
  aliased flat copy                 -> 655 GB/s (= xla-scale)

This probe pins the rule (array lane width? block bytes? aliasing class?)
with one same-run sweep, then measures the exact candidate layouts for the
round-5 narrow ctwg kernel:

  in  array (B*n/128, 128), block (tb*n/128, 128)   [tb = 8]
  3D  array (B*p, r, q),    block (tb*p, r, q)
  each +- input_output_aliases

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_narrow.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

N = 65536
B = 512
R, P, Q = 4, 128, 128
TB = 8
TOTAL = B * N  # f32 elements per array of the pair


def make_copy(shape, block, alias=False):
    """Pure pair copy over an f32 view `shape` with `block` blocks."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rustfft_tpu.config import config
    from rustfft_tpu.ops.pallas.util import i32map

    nd = len(shape)
    grid = tuple(s // b for s, b in zip(shape, block))
    # collapse unit grid dims away from the left for a lean grid
    if nd == 2:
        imap = i32map(lambda r, c: (r, c))
    else:
        imap = i32map(lambda r, c, z: (r, c, z))

    def kernel(xr_ref, xi_ref, or_ref, oi_ref):
        or_ref[:] = xr_ref[:]
        oi_ref[:] = xi_ref[:]

    spec = pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=max(config.pallas_vmem_limit, 112 * 2**20))
    aliases = {0: 0, 1: 1} if alias else {}

    def apply(x):
        xr, xi = x
        o_r, o_i = pl.pallas_call(
            kernel, grid=grid, in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * 2,
            input_output_aliases=aliases,
            compiler_params=cparams,
        )(xr.reshape(shape), xi.reshape(shape))
        return o_r.reshape(xr.shape), o_i.reshape(xi.shape)

    return apply


def main():
    import jax

    from rustfft_tpu.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)

    nbytes = 2 * 2 * 4 * TOTAL  # pair x (read + write)
    scale = 1e-30
    re = jax.device_put(
        (rng.standard_normal((B, N)) * scale).astype(np.float32))
    im = jax.device_put(
        (rng.standard_normal((B, N)) * scale).astype(np.float32))

    def row(label, fn):
        try:
            t = time_fn(fn, re, im)
            print(f"  {label:<42} {t*1e3:8.3f} ms  {nbytes/t/1e9:7.1f} GB/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {label:<42} FAILED {str(e)[:140]}", flush=True)

    import jax.numpy as jnp

    def xla_scale(x):
        return x[0] * 1.0000001, x[1] * 1.0000001

    row("xla-scale", xla_scale)

    # --- lane-width rule sweep: ~2MB-class blocks spanning full rows ---
    for lanes in (128, 256, 512, 1024, 2048, 4096, 8192):
        rows_total = TOTAL // lanes
        brows = max(8, (2 * 2**20 // 4) // lanes)  # ~2MB f32 block
        brows = min(brows, rows_total)
        while rows_total % brows:
            brows //= 2
        row(f"copy ({rows_total},{lanes}) blk ({brows},{lanes})",
            make_copy((rows_total, lanes), (brows, lanes)))

    # --- the kernel-candidate layouts ---
    narrow = (TOTAL // 128, 128)
    nblk = (TB * N // 128, 128)  # 4096 rows = tb transforms
    row("narrow 2D (262144,128) blk (4096,128)", make_copy(narrow, nblk))
    row("narrow 2D aliased", make_copy(narrow, nblk, alias=True))

    three = (B * P, R, Q)
    tblk = (TB * P, R, Q)
    row("3D (65536,4,128) blk (1024,4,128)", make_copy(three, tblk))
    row("3D aliased", make_copy(three, tblk, alias=True))

    radix = (B * P, R * Q)
    rblk = (TB * P, R * Q)
    row("radix 2D (65536,512) blk (1024,512)", make_copy(radix, rblk))
    row("radix 2D aliased", make_copy(radix, rblk, alias=True))

    flat = (B, N)
    fblk = (TB, N)
    row("flat 2D (512,65536) blk (8,65536)", make_copy(flat, fblk))
    row("flat 2D aliased", make_copy(flat, fblk, alias=True))


if __name__ == "__main__":
    main()
