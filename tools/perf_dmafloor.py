"""Pallas DMA floor probes: where does the pure load/store 224 GB/s go?

Round-4 anatomy sweep (tools/perf_anatomy.py on v5e): a pure-copy probe
kernel sharing the two-stage kernel's block layout ((tb*p, 128-lane) blocks
of a contiguous (batch*p, q) f32 pair) runs ~224 GB/s while the same-run XLA
stream chain runs ~600 GB/s — the ENTIRE one-pass band (two-stage/radix,
16k..262k) sits on this floor, so full kernels are within 20% of their own
copy probe.  Raising the Pallas copy floor is worth up to ~2.7x across the
band.  This tool maps the floor against the free geometry knobs, same-run:

  * XLA references: elementwise scale chain on the same pair arrays
  * block LANE width: 128 / 1024 / 8192 lanes at matched block bytes
  * block BYTES: 0.5 / 2 / 8 MB at matched lane width
  * grid ORDER: rows-fastest vs cols-fastest (2D grids only)
  * transposed-write blocks (the pass-1 pattern) vs straight copy
  * single array vs (re, im) pair

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_dmafloor.py
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402


def _copy_kernel(xr_ref, xi_ref, or_ref, oi_ref):
    or_ref[:] = xr_ref[:]
    oi_ref[:] = xi_ref[:]


def _copy_t_kernel(xr_ref, xi_ref, or_ref, oi_ref):
    import jax.numpy as jnp

    or_ref[:] = jnp.swapaxes(xr_ref[:], 0, 1)
    oi_ref[:] = jnp.swapaxes(xi_ref[:], 0, 1)


def make_copy(rows, cols, br, bc, order="rf", transpose=False, interpret=False):
    """Pallas pair-copy over a (rows, cols) f32 view with (br, bc) blocks."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rustfft_tpu.config import config
    from rustfft_tpu.ops.pallas.util import i32map

    gr, gc = rows // br, cols // bc
    if order == "rf":  # rows-fastest: grid (gc, gr), last axis fastest
        grid = (gc, gr)
        imap = i32map(lambda c, r: (r, c))
        omap = i32map(lambda c, r: (c, r)) if transpose else imap
    else:
        grid = (gr, gc)
        imap = i32map(lambda r, c: (r, c))
        omap = i32map(lambda r, c: (c, r)) if transpose else imap
    in_spec = pl.BlockSpec((br, bc), imap, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (bc, br) if transpose else (br, bc), omap, memory_space=pltpu.VMEM
    )
    out_shape = (cols, rows) if transpose else (rows, cols)
    kernel = _copy_t_kernel if transpose else _copy_kernel
    cparams = pltpu.CompilerParams(vmem_limit_bytes=config.pallas_vmem_limit)

    def apply(x):
        xr, xi = x
        o_r, o_i = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[in_spec, in_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct(out_shape, jnp.float32)] * 2,
            compiler_params=cparams,
            interpret=interpret,
        )(xr.reshape(rows, cols), xi.reshape(rows, cols))
        return o_r.reshape(xr.shape), o_i.reshape(xi.shape)

    return apply


def main():
    import jax

    from rustfft_tpu.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)

    numel = 1 << 26  # 256 MB per f32 array; 512 MB pair working set
    re = jax.device_put(rng.standard_normal(numel).astype(np.float32))
    im = jax.device_put(rng.standard_normal(numel).astype(np.float32))
    nbytes = 2 * 2 * 4 * numel  # pair x (read + write) per iteration

    def row(label, fn, scale=1.0):
        try:
            t = time_fn(fn, re, im)
            print(f"  {label:<42} {t*1e3:8.3f} ms  {scale*nbytes/t/1e9:7.1f} GB/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {label:<42} FAILED {str(e)[:200]}", flush=True)

    # XLA references
    row("xla scale pair (1r+1w each)",
        lambda x: (x[0] * 1.0000001, x[1] * 1.0000001))
    import jax.numpy as jnp
    row("xla transpose (524288,128)", lambda x: (
        jnp.swapaxes(x[0].reshape(4096, 128, 128), 1, 2).reshape(x[0].shape),
        jnp.swapaxes(x[1].reshape(4096, 128, 128), 1, 2).reshape(x[1].shape),
    ))

    # the anatomy layout: q=128 lanes, narrow blocks — the measured 224 floor
    for br, bc in [(1024, 128), (4096, 128), (16384, 128)]:
        row(f"pallas copy block ({br},{bc}) rf",
            make_copy(numel // 128, 128, br, bc))
    # lane width at matched bytes (~2 MB blocks)
    for rows, cols, br, bc in [
        (numel // 1024, 1024, 512, 1024),
        (numel // 8192, 8192, 64, 8192),
        (numel // 8192, 8192, 256, 8192),
        (numel // 32768, 32768, 64, 32768),
    ]:
        row(f"pallas copy ({rows}x{cols}) block ({br},{bc})",
            make_copy(rows, cols, br, bc))
    # grid order (2D): does cols-fastest prefetch better?
    row("pallas copy (65536x1024) blk (512,1024) cf",
        make_copy(numel // 1024, 1024, 512, 1024, order="cf"))
    # 8 MB blocks at 128 lanes vs wide
    row("pallas copy (524288x128) blk (32768,128)",
        make_copy(numel // 128, 128, 32768, 128))
    # transposed write (pass-1 pattern): in (1024,128) -> out (128,1024)
    row("pallas copyT blk (1024,128)->(128,1024)",
        make_copy(numel // 128, 128, 1024, 128, transpose=True))
    row("pallas copyT blk (512,1024)->(1024,512)",
        make_copy(numel // 1024, 1024, 512, 1024, transpose=True))


if __name__ == "__main__":
    main()
