"""Manual-DMA pipelines vs the pallas auto-pipeliner (copy workload).

If a hand-rolled double-buffered DMA (or HBM->HBM DMA) materially beats the
auto-pipelined ~160 GB/s, the FFT kernels should be rewritten in that style.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 16384
    batch = 4096
    rng = np.random.default_rng(0)
    x = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))

    def timed(fn, args, iters=8):
        @jax.jit
        def many(v):
            # scalar readback forces execution (the tunnel does not sync on
            # block_until_ready)
            return jax.lax.fori_loop(0, iters, lambda i, v: fn(v), v).sum()

        float(many(args))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(args))
            t = (time.perf_counter() - t0) / iters
            best = t if best is None else min(best, t)
        return best

    nbytes = 2 * batch * n * 4  # read + write

    # 0. XLA reference
    t = timed(lambda v: v * np.float32(1.001), x)
    print(f"xla stream 1 array      : {t*1e3:8.3f} ms  {nbytes/t/1e9:6.1f} GB/s")

    # 1. auto-pipelined pallas copy
    tb = 64
    spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def copy_k(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    def auto_copy(v):
        return pl.pallas_call(
            copy_k,
            grid=(batch // tb,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((batch, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(v)

    t = timed(auto_copy, x)
    print(f"pallas auto copy tb={tb:3} : {t*1e3:8.3f} ms  {nbytes/t/1e9:6.1f} GB/s")

    # 2. HBM -> HBM direct DMA (no VMEM round trip)
    def h2h_kernel(x_hbm, o_hbm):
        def body(sem):
            dma = pltpu.make_async_copy(x_hbm, o_hbm, sem)
            dma.start()
            dma.wait()

        pl.run_scoped(body, pltpu.SemaphoreType.DMA(()))

    def h2h_copy(v):
        return pl.pallas_call(
            h2h_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((batch, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(v)

    try:
        t = timed(h2h_copy, x)
        print(f"pallas hbm->hbm dma     : {t*1e3:8.3f} ms  {nbytes/t/1e9:6.1f} GB/s")
    except Exception as e:
        print(f"pallas hbm->hbm dma     : FAIL {' '.join(str(e).split())[:140]}")

    # 3. manual double-buffered VMEM pipeline (depth 2) with compute
    NBUF = 4
    tb2 = 32
    nchunks = batch // tb2

    def manual_kernel(x_hbm, o_hbm):
        def body(scratch, in_sems, out_sems):
            def in_dma(slot, i):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(i * tb2, tb2), :],
                    scratch.at[slot],
                    in_sems.at[slot],
                )

            def out_dma(slot, i):
                return pltpu.make_async_copy(
                    scratch.at[slot],
                    o_hbm.at[pl.ds(i * tb2, tb2), :],
                    out_sems.at[slot],
                )

            for k in range(NBUF):
                in_dma(k, k).start()

            def loop(i, _):
                slot = jax.lax.rem(i, NBUF)
                in_dma(slot, i).wait()

                @pl.when(i >= NBUF)
                def _():
                    pass  # prior out from this slot already waited below

                scratch[slot] = scratch[slot] * np.float32(1.001)
                out_dma(slot, i).start()
                out_dma(slot, i).wait()  # conservative: serialize out

                @pl.when(i + NBUF < nchunks)
                def _():
                    in_dma(slot, i + NBUF).start()

                return 0

            jax.lax.fori_loop(0, nchunks, loop, 0)

        pl.run_scoped(
            body,
            pltpu.VMEM((NBUF, tb2, n), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        )

    def manual_copy(v):
        return pl.pallas_call(
            manual_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((batch, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(v)

    try:
        t = timed(manual_copy, x)
        print(f"pallas manual pipeline  : {t*1e3:8.3f} ms  {nbytes/t/1e9:6.1f} GB/s")
    except Exception as e:
        print(f"pallas manual pipeline  : FAIL {' '.join(str(e).split())[:140]}")


if __name__ == "__main__":
    main()
