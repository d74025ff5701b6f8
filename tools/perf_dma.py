"""Find pallas_call's streaming ceiling: block shape / stream count probes.

A pure-copy Pallas kernel measured ~125 GB/s while an XLA elementwise pass
hits 435-620 GB/s on the same arrays — this isolates why.
"""
from __future__ import annotations

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
    p = q = 128
    rng = np.random.default_rng(0)
    re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
    im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))

    def timed(fn, args, iters=8):
        @jax.jit
        def many(x):
            return jax.lax.fori_loop(0, iters, lambda i, x: fn(x), x)[0].sum()

        float(many(args))
        t0 = time.perf_counter()
        float(many(args))
        return (time.perf_counter() - t0) / iters

    def report(name, t, nbytes):
        print(f"{name:36}: {t*1e3:8.3f} ms  {nbytes/t/1e9:6.1f} GB/s")

    pair_bytes = 2 * 2 * batch * n * 4  # r+i, read+write

    # 0. XLA stream reference
    t = timed(lambda x: (x[0] * np.float32(1.001), x[1] * np.float32(1.001)), (re, im))
    report("xla stream x*c (2 arrays)", t, pair_bytes)

    # 1. pallas copy, 3D blocks, two in/two out
    def copy3(xr_ref, xi_ref, or_ref, oi_ref):
        or_ref[:] = xr_ref[:]
        oi_ref[:] = xi_ref[:]

    for tb in (8, 64) if os.environ.get("SKIP_EARLY") != "1" else ():
        spec = pl.BlockSpec((tb, p, q), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

        def copy3_call(x, tb=tb, spec=spec):
            xr, xi = x
            o = pl.pallas_call(
                copy3,
                grid=(batch // tb,),
                in_specs=[spec, spec],
                out_specs=[spec, spec],
                out_shape=[jax.ShapeDtypeStruct((batch, p, q), jnp.float32)] * 2,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )(xr.reshape(batch, p, q), xi.reshape(batch, p, q))
            return o[0].reshape(batch, n), o[1].reshape(batch, n)

        t = timed(copy3_call, (re, im))
        report(f"pallas copy 3D blocks tb={tb}", t, pair_bytes)

    # 2. pallas copy, 2D row blocks on the flat (batch, n) arrays
    def copy2(xr_ref, xi_ref, or_ref, oi_ref):
        or_ref[:] = xr_ref[:]
        oi_ref[:] = xi_ref[:]

    for tb in (8, 64) if os.environ.get("SKIP_EARLY") != "1" else ():
        spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)

        def copy2_call(x, tb=tb, spec=spec):
            return pl.pallas_call(
                copy2,
                grid=(batch // tb,),
                in_specs=[spec, spec],
                out_specs=[spec, spec],
                out_shape=[jax.ShapeDtypeStruct((batch, n), jnp.float32)] * 2,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )(x[0], x[1])

        t = timed(copy2_call, (re, im))
        report(f"pallas copy 2D blocks tb={tb}", t, pair_bytes)

    # 3. single-array copy (halve stream count, same bytes)
    both = jnp.concatenate([re, im], axis=0)  # (2*batch, n)

    def copy1(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    for tb in (8, 64):
        spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)

        def copy1_call(x, tb=tb, spec=spec):
            return pl.pallas_call(
                copy1,
                grid=(2 * batch // tb,),
                in_specs=[spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((2 * batch, n), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )(x)

        t = timed(copy1_call, both)
        report(f"pallas copy 1 array 2D tb={tb}", t, pair_bytes)

    # 4. multiple grid dims marked parallel
    for tb in (8,):
        spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)

        def copy2p(x, tb=tb, spec=spec):
            return pl.pallas_call(
                copy2,
                grid=(batch // tb,),
                in_specs=[spec, spec],
                out_specs=[spec, spec],
                out_shape=[jax.ShapeDtypeStruct((batch, n), jnp.float32)] * 2,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(x[0], x[1])

        t = timed(copy2p, (re, im))
        report(f"pallas copy 2D parallel tb={tb}", t, pair_bytes)

    # 5. input_output_aliases (donate input -> true in-place)
    for tb in (8,):
        spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)

        def scale2(xr_ref, xi_ref, or_ref, oi_ref):
            or_ref[:] = xr_ref[:] * np.float32(1.001)
            oi_ref[:] = xi_ref[:] * np.float32(1.001)

        def copy2a(x, tb=tb, spec=spec):
            return pl.pallas_call(
                scale2,
                grid=(batch // tb,),
                in_specs=[spec, spec],
                out_specs=[spec, spec],
                out_shape=[jax.ShapeDtypeStruct((batch, n), jnp.float32)] * 2,
                input_output_aliases={0: 0, 1: 1},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )(x[0], x[1])

        t = timed(copy2a, (re, im))
        report(f"pallas scale aliased tb={tb}", t, pair_bytes)


if __name__ == "__main__":
    main()
