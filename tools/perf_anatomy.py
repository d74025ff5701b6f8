"""Cost anatomy of the one-HBM-pass tiers at 16k..262k (VERDICT r3 item 3).

The radix-r kernel at 65536 runs ~909-1053 GF/s = ~30-34% of the memory
roofline despite being structurally one HBM pass.  Where do the other ~2x
go?  This tool mirrors the lanepack anatomy (CLAUDE.md): probe kernels that
share the two-stage kernel's exact block layout but enable stages one at a
time, so within one run the deltas attribute the time:

  ls        pure load/store of the (tb*p, q) pair blocks — the DMA floor
  split     + the bf16 hi/lo splits of the input (VPU convert/sub)
  dot1      + stage-1 contraction only (bf16x3: 3 MXU dots + 2 adds)
  tw        + the inter-stage twiddle multiply (VPU, 6 ops)
  dot2      + stage-2 contraction (full math, emit [k1, k2] order)
  full      the real two-stage kernel (with in-kernel transpose)
  full-s    the real kernel at the single-dot cat tier (bf16x3s)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_anatomy.py [n ...]
"""
from __future__ import annotations

import functools
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402


def _probe_kernel(p, q, tb, precision, stages, xr_ref, xi_ref, wp_hi_ref,
                  wp_lo_ref, wq_hi_ref, wq_lo_ref, twr_ref, twi_ref,
                  or_ref, oi_ref):
    """Two-stage kernel body with stages gated by the `stages` set."""
    import jax.numpy as jnp

    from rustfft_tpu.ops.pallas.fused import contract_rhs

    sub = (((1,), (1,)), ((), ()))
    xr = xr_ref[:].reshape(tb, p, q)
    xi = xi_ref[:].reshape(tb, p, q)

    if "split" in stages and "dot1" not in stages:
        # the bf16 splits alone (their cost inside _dot3)
        xb = jnp.concatenate([xr, xi], axis=1)
        x_hi = xb.astype(jnp.bfloat16)
        x_lo = (xb - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        or_ref[:] = (x_hi.astype(jnp.float32) + x_lo.astype(jnp.float32))[
            :, :p, :
        ].reshape(tb * p, q)
        oi_ref[:] = xi_ref[:]
        return
    if "dot1" not in stages:  # pure load/store
        or_ref[:] = xr_ref[:]
        oi_ref[:] = xi_ref[:]
        return

    xb = jnp.concatenate([xr, xi], axis=1)  # (tb, 2p, q)
    a = contract_rhs(xb, wp_hi_ref[:], wp_lo_ref[:], sub, precision)
    ar, ai = a[:, :, :p], a[:, :, p:]  # (tb, q, p)

    if "tw" in stages:
        twr = twr_ref[:]
        twi = twi_ref[:]
        br = ar * twr - ai * twi
        bi = ar * twi + ai * twr
    else:
        br, bi = ar, ai

    if "dot2" in stages:
        bb = jnp.concatenate([br, bi], axis=1)  # (tb, 2q, p)
        d = contract_rhs(bb, wq_hi_ref[:], wq_lo_ref[:], sub, precision)
        dr, di = d[:, :, :q], d[:, :, q:]  # (tb, p, q) [k1, k2]
        or_ref[:] = dr.reshape(tb * p, q)
        oi_ref[:] = di.reshape(tb * p, q)
    else:
        # emit stage-1 output (shape-compatible (tb*p, q) after swap)
        or_ref[:] = jnp.swapaxes(br, 1, 2).reshape(tb * p, q)
        oi_ref[:] = jnp.swapaxes(bi, 1, 2).reshape(tb * p, q)


def make_probe(n, split, stages, precision="bf16x3", tb=None, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rustfft_tpu import twiddles
    from rustfft_tpu.common import FftDirection
    from rustfft_tpu.config import config
    from rustfft_tpu.ops import calg
    from rustfft_tpu.ops.pallas import fused
    from rustfft_tpu.ops.pallas.util import i32map

    p, q = split
    d = FftDirection.FORWARD
    rdt = np.float32
    wp = calg.block_mid(twiddles.dft_matrix(p, d), rdt)
    wq = calg.block_mid(twiddles.dft_matrix(q, d), rdt)
    wp_hi, wp_lo = fused.w_split(wp, precision)
    wq_hi, wq_lo = fused.w_split(wq, precision)
    tw = twiddles.twiddle_table(p, q, d).T
    twr = np.ascontiguousarray(tw.real).astype(rdt)
    twi = np.ascontiguousarray(tw.imag).astype(rdt)
    consts = [wp_hi, wp_lo, wq_hi, wq_lo, twr, twi]

    def apply(x):
        xr, xi = x
        batch = xr.shape[0]
        tb_ = tb or fused._pick_batch_tile(batch, p, q)
        grid = batch // tb_
        kernel = functools.partial(_probe_kernel, p, q, tb_, precision, stages)
        bspec = pl.BlockSpec((tb_ * p, q), i32map(lambda i: (i, 0)),
                             memory_space=pltpu.VMEM)

        def cspec(w):
            return pl.BlockSpec(w.shape, i32map(lambda i: (0, 0)),
                                memory_space=pltpu.VMEM)

        out_r, out_i = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[bspec, bspec] + [cspec(w) for w in consts],
            out_specs=[bspec, bspec],
            out_shape=[jax.ShapeDtypeStruct((batch * p, q), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=config.pallas_vmem_limit
            ),
            interpret=interpret,
        )(xr.reshape(batch * p, q), xi.reshape(batch * p, q),
          *[jnp.asarray(w) for w in consts])
        return out_r.reshape(batch, n), out_i.reshape(batch, n)

    return apply


def main():
    import jax

    from rustfft_tpu import FftDirection
    from rustfft_tpu.config import config, enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import fused

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    sizes = [int(a) for a in sys.argv[1:]] or [16384, 65536]
    for n in sizes:
        split = fused._choose_pq(n)
        if split is None:
            print(f"n={n}: no two-stage split", flush=True)
            continue
        batch = max(8, min(1 << 17, (1 << 26) // n))
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        bytes_pp = 2 * 4 * 2  # f32 pair, read + write
        print(f"n={n} split={split} batch={batch}", flush=True)

        probes = [
            ("ls", set()),
            ("split", {"split"}),
            ("dot1", {"dot1"}),
            ("dot1+tw", {"dot1", "tw"}),
            ("dot1+tw+dot2", {"dot1", "tw", "dot2"}),
        ]
        for label, stages in probes:
            try:
                fn = make_probe(n, split, stages)
                t = time_fn(fn, re, im)
                gbs = batch * n * bytes_pp / t / 1e9
                print(f"  probe {label:<14}: {t*1e3:8.3f} ms  {gbs:7.1f} GB/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  probe {label:<14}: FAILED {str(e)[:300]}", flush=True)

        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
        for label, prec, var in (
            ("full bf16x3", "bf16x3", None),
            ("full bf16x3s", "bf16x3s", None),
            ("full wlhs x3", "bf16x3", "wlhs"),
        ):
            try:
                fn = fused.make_fused_two_stage_fn(n, d, np.complex64,
                                                   precision=prec,
                                                   variant=var)
                t = time_fn(fn, re, im)
                print(f"  {label:<20}: {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {label:<20}: FAILED {str(e)[:300]}", flush=True)
        if fused.radix_supported(n, np.complex64):
            for label, prec, variant in (
                ("radix bf16x3", "bf16x3", "default"),
                ("radix bf16x3s", "bf16x3s", "default"),
                ("radix wlhsB x3", "bf16x3", "wlhs_b"),
                ("radix wlhsB x3s", "bf16x3s", "wlhs_b"),
                ("radix ctw x3s", "bf16x3s", "ctw"),
                ("radix ctwg x3s", "bf16x3s", "ctwg"),
                ("radix ctwg x3", "bf16x3", "ctwg"),
            ):
                try:
                    fn = fused.make_fused_radix_fn(n, d, np.complex64,
                                                   precision=prec,
                                                   variant=variant)
                    t = time_fn(fn, re, im)
                    print(f"  {label:<20}: {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"  {label:<20}: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
