"""Bisect the Mosaic HTTP 500 on the flat-view radix kernel (ctwgx).

Stages, all on (tb=8, n=65536) flat blocks, batch 512:
  copy        known-good pure copy (sanity)
  stack16     16-way lane-slice stack + inverse concat (identity)
  stack64     64-way                 "
  stack128    the kernel's p-way in-relayout + inverse concat (identity)
  body-wideout  full ctwgx body but wide (tb*q, r*p) OUTPUT spec
  full        the committed ctwgx

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_ctwgx_debug.py
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

N = 65536
B = 512
R, P, Q = 4, 128, 128
TB = 8


def make_stack_identity(ways):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rustfft_tpu.config import config
    from rustfft_tpu.ops.pallas.util import i32map

    w = N // ways

    def kernel(xr_ref, xi_ref, or_ref, oi_ref):
        for ref, oref in ((xr_ref, or_ref), (xi_ref, oi_ref)):
            z = jnp.stack(
                [ref[:, c * w : (c + 1) * w] for c in range(ways)], axis=1
            )  # (tb, ways, w)
            oref[:] = jnp.concatenate(
                [z[:, c, :] for c in range(ways)], axis=-1
            )

    spec = pl.BlockSpec((TB, N), i32map(lambda i: (i, 0)),
                        memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=max(config.pallas_vmem_limit, 112 * 2**20))

    def apply(x):
        xr, xi = x
        o_r, o_i = pl.pallas_call(
            kernel, grid=(B // TB,), in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((B, N), jnp.float32)] * 2,
            compiler_params=cparams,
        )(xr, xi)
        return o_r, o_i

    return apply


def make_body_wideout():
    """Full ctwgx body, but the OUT spec stays wide (tb*q, r*p)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rustfft_tpu.common import FftDirection
    from rustfft_tpu.config import config
    from rustfft_tpu.ops.pallas import fused
    from rustfft_tpu.ops.pallas.util import i32map

    precision = fused.resolve_precision(None, False)
    consts = fused._ctwg_consts(R, P, Q, FftDirection.FORWARD, precision)

    def kernel(*refs):
        (xr_ref, xi_ref), cs, (or_ref, oi_ref) = refs[:2], refs[2:-2], refs[-2:]
        wA = cs[0:6]
        wc_refs = cs[6 : 6 + 6 * R]
        tr_ref, ti_ref = cs[6 + 6 * R :]
        dims = (((1,), (1,)), ((), ()))

        xr = fused._flat_in_relayout(xr_ref[:], TB, P, R, Q)
        xi = fused._flat_in_relayout(xi_ref[:], TB, P, R, Q)
        ar, ai = fused.gauss_contract(xr, xi, [w[:] for w in wA], dims,
                                      precision)
        tr, ti = tr_ref[:], ti_ref[:]
        br = ar * tr - ai * ti
        bi = ar * ti + ai * tr
        cr_l, ci_l = fused._vpu_fft_list(
            [br[:, j * Q : (j + 1) * Q, :] for j in range(R)],
            [bi[:, j * Q : (j + 1) * Q, :] for j in range(R)],
            FftDirection.FORWARD,
        )
        outs_r, outs_i = [], []
        for c in range(R):
            er, ei = fused.gauss_contract(
                cr_l[c], ci_l[c], [w[:] for w in wc_refs[6 * c : 6 * c + 6]],
                dims, precision)
            outs_r.append(jnp.swapaxes(er, -1, -2))
            outs_i.append(jnp.swapaxes(ei, -1, -2))
        or_ref[:] = jnp.concatenate(outs_r, axis=-1).reshape(TB * Q, R * P)
        oi_ref[:] = jnp.concatenate(outs_i, axis=-1).reshape(TB * Q, R * P)

    in_spec = pl.BlockSpec((TB, N), i32map(lambda i: (i, 0)),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TB * Q, R * P), i32map(lambda i: (i, 0)),
                            memory_space=pltpu.VMEM)

    def cspec(w):
        return pl.BlockSpec(w.shape, i32map(lambda i: (0, 0)),
                            memory_space=pltpu.VMEM)

    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=max(config.pallas_vmem_limit, 112 * 2**20))
    import jax.numpy as jnp2

    def apply(x):
        xr, xi = x
        o_r, o_i = pl.pallas_call(
            kernel, grid=(B // TB,),
            in_specs=[in_spec, in_spec] + [cspec(w) for w in consts],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((B * Q, R * P), jnp2.float32)] * 2,
            compiler_params=cparams,
        )(xr, xi, *[jnp2.asarray(w) for w in consts])
        return o_r.reshape(B, N), o_i.reshape(B, N)

    return apply


def main():
    import jax

    from rustfft_tpu.common import FftDirection
    from rustfft_tpu.config import enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import fused

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)

    flops = 5.0 * N * np.log2(N) * B
    scale = 1e-30
    re = jax.device_put((rng.standard_normal((B, N)) * scale).astype(np.float32))
    im = jax.device_put((rng.standard_normal((B, N)) * scale).astype(np.float32))

    def row(label, fn):
        try:
            t = time_fn(fn, re, im)
            print(f"  {label:<22} {t*1e3:8.3f} ms  {flops/t/1e9:7.1f} GF/s-eq",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {label:<22} FAILED {str(e)[:160]}", flush=True)

    row("copy", make_stack_identity(1))
    for ways in (16, 64, 128):
        row(f"stack{ways}", make_stack_identity(ways))
    row("body-wideout", make_body_wideout())
    fn = fused.make_fused_radix_fn(N, FftDirection.FORWARD, np.complex64,
                                   variant="ctwgx")
    row("full ctwgx", fn)


if __name__ == "__main__":
    main()
