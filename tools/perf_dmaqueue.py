"""Round-5 DMA queue probes: why does the best Pallas copy run at half XLA?

perf_onepass5 (same-run, v5e): XLA elementwise pair chain 667 GB/s; the best
Pallas pair copy 330 GB/s (flat blocks); the radix kernel's layout 220 GB/s.
330 ~ 667/2 smells like the per-block input and output DMAs SERIALIZING
(half duplex) where XLA streams read+write concurrently.  Same-run rows:

  xla-scale      reference chain (read+write each array once)
  copy-flat      Pallas auto-pipelined pair copy, (8, 65536) blocks
  read-only      streamed input blocks, const (revisited) tiny output
                 -> pure READ bandwidth through the auto-pipeline
  write-only     const (revisited) input block, streamed output blocks
                 -> pure WRITE bandwidth
  hbm2hbm dN     manual HBM->HBM async_copy per grid step, N outstanding
                 (no VMEM staging: the DMA engine does read+write itself)
  manual dN      manual HBM->VMEM->HBM staging with separate in/out
                 semaphore queues, N outstanding each way
  alias-flat     input_output_aliases in-place pair copy (donation caveat)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_dmaqueue.py
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

B = 512
N = 65536
BR = 8  # block rows for the flat layout


def _cparams():
    from jax.experimental.pallas import tpu as pltpu

    from rustfft_tpu.config import config

    return pltpu.CompilerParams(
        vmem_limit_bytes=max(config.pallas_vmem_limit, 112 * 2**20)
    )


def make_copy_flat(alias=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rustfft_tpu.ops.pallas.util import i32map

    def kernel(xr_ref, xi_ref, or_ref, oi_ref):
        or_ref[:] = xr_ref[:]
        oi_ref[:] = xi_ref[:]

    spec = pl.BlockSpec((BR, N), i32map(lambda i: (i, 0)),
                        memory_space=pltpu.VMEM)

    def apply(x):
        xr, xi = x
        o_r, o_i = pl.pallas_call(
            kernel, grid=(B // BR,), in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((B, N), jnp.float32)] * 2,
            input_output_aliases={0: 0, 1: 1} if alias else {},
            compiler_params=_cparams(),
        )(xr, xi)
        return o_r, o_i

    return apply


def make_read_only(re_big, im_big):
    """Streamed input blocks; tiny revisited output (written once).

    The big arrays ride as closure constants; the fori-loop carry is a
    small (8, 128) seed pair mixed into the output so the call can't be
    hoisted out of the timing loop.  Time this row against copy-flat:
    pure-read cost, no output streaming."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rustfft_tpu.ops.pallas.util import i32map

    def kernel(sr_ref, si_ref, xr_ref, xi_ref, or_ref, oi_ref):
        or_ref[:] = sr_ref[:] + xr_ref[:, :128]
        oi_ref[:] = si_ref[:] + xi_ref[:, :128]

    seed_spec = pl.BlockSpec((BR, 128), i32map(lambda i: (0, 0)),
                             memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((BR, N), i32map(lambda i: (i, 0)),
                           memory_space=pltpu.VMEM)

    def apply(x):
        sr, si = x
        o_r, o_i = pl.pallas_call(
            kernel, grid=(B // BR,),
            in_specs=[seed_spec, seed_spec, in_spec, in_spec],
            out_specs=[seed_spec, seed_spec],
            out_shape=[jax.ShapeDtypeStruct((BR, 128), jnp.float32)] * 2,
            compiler_params=_cparams(),
        )(sr, si, re_big, im_big)
        return o_r, o_i

    return apply


def make_write_only():
    """Const (revisited) input block; streamed output blocks."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rustfft_tpu.ops.pallas.util import i32map

    def kernel(xr_ref, xi_ref, or_ref, oi_ref):
        or_ref[:] = xr_ref[:]
        oi_ref[:] = xi_ref[:]

    in_spec = pl.BlockSpec((BR, N), i32map(lambda i: (0, 0)),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BR, N), i32map(lambda i: (i, 0)),
                            memory_space=pltpu.VMEM)

    def apply(x):
        xr, xi = x
        o_r, o_i = pl.pallas_call(
            kernel, grid=(B // BR,), in_specs=[in_spec, in_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((B, N), jnp.float32)] * 2,
            compiler_params=_cparams(),
        )(xr[:BR], xi[:BR])
        return o_r, o_i

    return apply


def make_hbm2hbm(depth=2):
    """Manual HBM->HBM DMA per grid step, `depth` outstanding copies."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps = B // BR

    def kernel(xr_ref, xi_ref, or_ref, oi_ref, semr, semi):
        def dma(ref_in, ref_out, sem, j):
            return pltpu.make_async_copy(
                ref_in.at[pl.ds(j * BR, BR), :],
                ref_out.at[pl.ds(j * BR, BR), :],
                sem.at[j % depth],
            )

        for j in range(min(depth, steps)):
            dma(xr_ref, or_ref, semr, j).start()
            dma(xi_ref, oi_ref, semi, j).start()

        def body(j, _):
            dma(xr_ref, or_ref, semr, j).wait()
            dma(xi_ref, oi_ref, semi, j).wait()

            @pl.when(j + depth < steps)
            def _():
                dma(xr_ref, or_ref, semr, j + depth).start()
                dma(xi_ref, oi_ref, semi, j + depth).start()

            return ()

        jax.lax.fori_loop(0, steps, body, ())

    spec = pl.BlockSpec(memory_space=pltpu.ANY)

    def apply(x):
        xr, xi = x
        o_r, o_i = pl.pallas_call(
            kernel, in_specs=[spec, spec], out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((B, N), jnp.float32)] * 2,
            scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))] * 2,
            compiler_params=_cparams(),
        )(xr, xi)
        return o_r, o_i

    return apply


def make_manual_staged(depth=2):
    """Manual HBM->VMEM->HBM with separate in/out semaphore queues."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps = B // BR

    def kernel(xr_ref, xi_ref, or_ref, oi_ref, bufr, bufi, sin, sout):
        def dma_in(j):
            s = j % depth
            return (
                pltpu.make_async_copy(
                    xr_ref.at[pl.ds(j * BR, BR), :], bufr.at[s], sin.at[2 * s]
                ),
                pltpu.make_async_copy(
                    xi_ref.at[pl.ds(j * BR, BR), :], bufi.at[s],
                    sin.at[2 * s + 1]
                ),
            )

        def dma_out(j):
            s = j % depth
            return (
                pltpu.make_async_copy(
                    bufr.at[s], or_ref.at[pl.ds(j * BR, BR), :], sout.at[2 * s]
                ),
                pltpu.make_async_copy(
                    bufi.at[s], oi_ref.at[pl.ds(j * BR, BR), :],
                    sout.at[2 * s + 1]
                ),
            )

        for j in range(min(depth, steps)):
            a, b = dma_in(j)
            a.start()
            b.start()

        def body(j, _):
            a, b = dma_in(j)
            a.wait()
            b.wait()
            c, d = dma_out(j)
            c.start()
            d.start()
            # before reusing slot (j+depth)%depth for input, wait its
            # out-DMA from step j-depth... slot reuse hazard: wait the out
            # copy of the step that used this slot
            @pl.when(j + depth < steps)
            def _():
                c2, d2 = dma_out(j)  # recreate to wait on same sems
                c2.wait()
                d2.wait()
                a2, b2 = dma_in(j + depth)
                a2.start()
                b2.start()

            return ()

        jax.lax.fori_loop(0, steps, body, ())
        # drain the tail out-DMAs
        for j in range(max(0, steps - depth), steps):
            c, d = dma_out(j)
            c.wait()
            d.wait()

    spec = pl.BlockSpec(memory_space=pltpu.ANY)

    def apply(x):
        xr, xi = x
        o_r, o_i = pl.pallas_call(
            kernel, in_specs=[spec, spec], out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((B, N), jnp.float32)] * 2,
            scratch_shapes=[
                pltpu.VMEM((depth, BR, N), jnp.float32),
                pltpu.VMEM((depth, BR, N), jnp.float32),
                pltpu.SemaphoreType.DMA((2 * depth,)),
                pltpu.SemaphoreType.DMA((2 * depth,)),
            ],
            compiler_params=_cparams(),
        )(xr, xi)
        return o_r, o_i

    return apply


def main():
    import jax

    from rustfft_tpu.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)

    nbytes = 2 * 2 * 4 * N * B  # pair x (read + write)
    re = jax.device_put((rng.standard_normal((B, N)) * 1e-30).astype(np.float32))
    im = jax.device_put((rng.standard_normal((B, N)) * 1e-30).astype(np.float32))

    def row(label, fn, scale=1.0):
        try:
            t = time_fn(fn, re, im)
            print(f"  {label:<28} {t*1e3:8.3f} ms  {scale*nbytes/t/1e9:7.1f}"
                  " GB/s-eq", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {label:<28} FAILED {str(e)[:200]}", flush=True)

    row("xla-scale", lambda x: (x[0] * 1.0000001, x[1] * 1.0000001))
    row("copy-flat", make_copy_flat())
    # read-only: half the copy traffic (no streamed write) — GB/s-eq column
    # still uses full-copy bytes; a value ~= copy-flat's means reads alone
    # took the whole copy time (serialization), ~2x means full duplex
    seed_r = jax.device_put(np.zeros((BR, 128), np.float32))
    seed_i = jax.device_put(np.zeros((BR, 128), np.float32))
    ro = make_read_only(re, im)
    try:
        t = time_fn(ro, seed_r, seed_i)
        print(f"  {'read-only':<28} {t*1e3:8.3f} ms  {nbytes/t/1e9:7.1f}"
              " GB/s-eq(copy-scale)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  {'read-only':<28} FAILED {str(e)[:200]}", flush=True)
    row("write-only", make_write_only())
    for d in (2, 4, 8):
        row(f"hbm2hbm d{d}", make_hbm2hbm(d))
    for d in (2, 4):
        row(f"manual-staged d{d}", make_manual_staged(d))
    row("alias-flat", make_copy_flat(alias=True))


if __name__ == "__main__":
    main()
