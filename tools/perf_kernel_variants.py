"""Isolate the fused-kernel bottleneck: tb sweep x kernel formulation.

All variants compute the same two-stage FFT at n=16384 (p=q=128), c64.
"""
from __future__ import annotations

import functools
import math
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

    from rustfft_tpu import FftDirection
    from rustfft_tpu.ops import calg
    from rustfft_tpu import twiddles
    from rustfft_tpu.utils.testing import mean_element_error, oracle_dft

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    p = q = int(math.isqrt(n))
    assert p * q == n
    batch = max(1, (1 << 26) // n)
    direction = FftDirection.FORWARD
    rdt = np.float32

    wp = calg.block_mid(twiddles.dft_matrix(p, direction), rdt)
    wq = calg.block_mid(twiddles.dft_matrix(q, direction), rdt)
    tw = twiddles.twiddle_table(p, q, direction).T  # (q, p)
    twr = np.ascontiguousarray(tw.real).astype(rdt)
    twi = np.ascontiguousarray(tw.imag).astype(rdt)

    P = jax.lax.Precision.DEFAULT

    def k_batched(xr_ref, xi_ref, wp_ref, wq_ref, twr_ref, twi_ref, or_ref, oi_ref):
        xb = jnp.concatenate([xr_ref[:], xi_ref[:]], axis=1)  # (tb, 2p, q)
        a = jax.lax.dot_general(xb, wp_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=P)
        ar, ai = a[:, :, :p], a[:, :, p:]
        br = ar * twr_ref[:] - ai * twi_ref[:]
        bi = ar * twi_ref[:] + ai * twr_ref[:]
        bb = jnp.concatenate([br, bi], axis=1)  # (tb, 2q, p)
        d = jax.lax.dot_general(bb, wq_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=P)
        or_ref[:] = jnp.swapaxes(d[:, :, :q], -1, -2)
        oi_ref[:] = jnp.swapaxes(d[:, :, q:], -1, -2)

    def k_loop(tb, xr_ref, xi_ref, wp_ref, wq_ref, twr_ref, twi_ref, or_ref, oi_ref):
        wpv, wqv = wp_ref[:], wq_ref[:]
        twrv, twiv = twr_ref[:], twi_ref[:]
        for b in range(tb):  # unrolled: pure 2D GEMM chains
            xb = jnp.concatenate([xr_ref[b], xi_ref[b]], axis=0)  # (2p, q)
            a = jax.lax.dot_general(wpv, xb, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32, precision=P)
            ar, ai = a[:p], a[p:]           # (p, q) [k1, j2]
            br = ar * twrv.T - ai * twiv.T  # tables (q,p) -> transpose const fold
            bi = ar * twiv.T + ai * twrv.T
            bb = jnp.concatenate([br, bi], axis=1)  # (p, 2q)
            d = jax.lax.dot_general(bb, wqv, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32, precision=P)
            or_ref[b] = d[:, :q].T
            oi_ref[b] = d[:, q:].T

    def k_copy(xr_ref, xi_ref, wp_ref, wq_ref, twr_ref, twi_ref, or_ref, oi_ref):
        # pure stream: pallas's own HBM ceiling (out shape (tb, q, p), p==q)
        or_ref[:] = xr_ref[:]
        oi_ref[:] = xi_ref[:]

    def k_copy_t(xr_ref, xi_ref, wp_ref, wq_ref, twr_ref, twi_ref, or_ref, oi_ref):
        # stream + one VMEM lane<->sublane transpose
        or_ref[:] = jnp.swapaxes(xr_ref[:], -1, -2)
        oi_ref[:] = jnp.swapaxes(xi_ref[:], -1, -2)

    def k_no_t(xr_ref, xi_ref, wp_ref, wq_ref, twr_ref, twi_ref, or_ref, oi_ref):
        # both GEMMs + twiddle, no output transpose (out [k1, k2] order)
        xb = jnp.concatenate([xr_ref[:], xi_ref[:]], axis=1)
        a = jax.lax.dot_general(xb, wp_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=P)
        ar, ai = a[:, :, :p], a[:, :, p:]
        br = ar * twr_ref[:] - ai * twi_ref[:]
        bi = ar * twi_ref[:] + ai * twr_ref[:]
        bb = jnp.concatenate([br, bi], axis=1)
        d = jax.lax.dot_general(bb, wq_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=P)
        or_ref[:] = d[:, :, :q]
        oi_ref[:] = d[:, :, q:]

    def k_stage1(xr_ref, xi_ref, wp_ref, wq_ref, twr_ref, twi_ref, or_ref, oi_ref):
        # one GEMM + twiddle only
        xb = jnp.concatenate([xr_ref[:], xi_ref[:]], axis=1)
        a = jax.lax.dot_general(xb, wp_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=P)
        ar, ai = a[:, :, :p], a[:, :, p:]
        or_ref[:] = ar * twr_ref[:] - ai * twi_ref[:]
        oi_ref[:] = ar * twi_ref[:] + ai * twr_ref[:]

    def build(kernel_fn, tb, extra=()):
        grid = batch // tb
        in_bspec = pl.BlockSpec((tb, p, q), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        out_bspec = pl.BlockSpec((tb, q, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        cs = lambda w: pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

        def apply(x):
            xr, xi = x
            b = xr.shape[0]
            out_r, out_i = pl.pallas_call(
                kernel_fn,
                grid=(b // tb,),
                in_specs=[in_bspec, in_bspec, cs(wp), cs(wq), cs(twr), cs(twi)],
                out_specs=[out_bspec, out_bspec],
                out_shape=[jax.ShapeDtypeStruct((b, q, p), jnp.float32)] * 2,
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            )(xr.reshape(b, p, q), xi.reshape(b, p, q),
              jnp.asarray(wp), jnp.asarray(wq), jnp.asarray(twr), jnp.asarray(twi))
            return out_r.reshape(b, n), out_i.reshape(b, n)

        return apply

    def timed(fn, args, iters=8):
        @jax.jit
        def many(x):
            return jax.lax.fori_loop(0, iters, lambda i, x: fn(x), x)[0].sum()

        float(many(args))
        t0 = time.perf_counter()
        float(many(args))
        return (time.perf_counter() - t0) / iters

    rng = np.random.default_rng(0)
    re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
    im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
    sig = (rng.standard_normal((128, n)) + 1j * rng.standard_normal((128, n))).astype(np.complex64)
    exp = oracle_dft(sig, direction)

    print(f"n={n} p=q={p} batch={batch}")
    for tb in (8, 32):
        for name, kf in (("copy", k_copy), ("copyT", k_copy_t), ("stage1", k_stage1),
                         ("no_t", k_no_t), ("batched", k_batched)):
            if False:
                continue
            try:
                fn = build(kf, tb)
                t = timed(fn, (re, im))
                o_r, o_i = fn((sig.real, sig.imag))
                err = mean_element_error(np.asarray(o_r) + 1j * np.asarray(o_i), exp)
                steps = batch // tb
                print(f"tb={tb:>4} {name:8}: {t*1e3:8.3f} ms  "
                      f"{2*8*batch*n/t/1e9:6.1f} GB/s  {t/steps*1e6:7.1f} us/step | err {err:.1e}")
            except Exception as e:
                print(f"tb={tb:>4} {name:8}: FAIL {' '.join(str(e).split())[:120]}")


if __name__ == "__main__":
    main()
