"""Round-5 one-pass-band decomposition: kernel = DMA + compute + overlap?

VERDICT r4 item 1: the 16k..262k one-pass band binds the bench geomean at
~30-37% of roofline.  Round-4 anatomy left two open constants that decide
what a faster kernel structure must look like:

  1. Does the Pallas auto-pipeline OVERLAP the block DMA with the kernel
     body at all?  (round-4 numbers suggest kernel ~= copy + compute,
     i.e. no overlap — but they were cross-run.)
  2. What does one full-data VPU op cost, and how many does the ctwg
     kernel spend?  (the bf16 cat-splits are suspected dominant.)

Same-run rows at n = 65536 (radix r=4, p=q=128), batch 512:

  xla-scale      XLA elementwise pair chain           (stream reference)
  ctwg / ctw     the shipping radix kernels           (the baseline)
  copy@radix     pure pair copy, (tb*128, 512) blocks (the kernel's DMA)
  copy@flat      pure pair copy, (rows, 65536) blocks (flat-aspect DMA)
  resident-ctwg  ctwg with const in/out index maps    (pure compute: the
                 grid runs the same block 64x, HBM sees one block)
  vpu-ladder     resident cmul chains, k = 4/16/64    (per-op VPU cost)
  mxu-ladder     resident stage-A cat-Gauss dots, m = 1/3

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_onepass5.py
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


def make_copy(rows, cols, br, bc):
    """Pure pair copy over a (rows, cols) f32 view with (br, bc) blocks."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rustfft_tpu.config import config
    from rustfft_tpu.ops.pallas.util import i32map

    def kernel(xr_ref, xi_ref, or_ref, oi_ref):
        or_ref[:] = xr_ref[:]
        oi_ref[:] = xi_ref[:]

    gr, gc = rows // br, cols // bc
    spec = pl.BlockSpec((br, bc), i32map(lambda r, c: (r, c)),
                        memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=max(config.pallas_vmem_limit, 112 * 2**20))

    def apply(x):
        xr, xi = x
        o_r, o_i = pl.pallas_call(
            kernel, grid=(gr, gc), in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((rows, cols), jnp.float32)] * 2,
            compiler_params=cparams,
        )(xr.reshape(rows, cols), xi.reshape(rows, cols))
        return o_r.reshape(xr.shape), o_i.reshape(xi.shape)

    return apply


def make_resident_ctwg(grid_steps=B // TB):
    """ctwg radix kernel body on ONE resident (tb*p, r*q) block, grid 64.

    In/out index maps are constant, so HBM sees one block in and one out;
    the body still executes grid_steps times — pure compute cost."""
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
    kernel = functools.partial(
        fused._fused_kernel_ctwg, R, P, Q, TB, precision, FftDirection.FORWARD
    )
    bspec = pl.BlockSpec((TB * P, R * Q), i32map(lambda i: (0, 0)),
                         memory_space=pltpu.VMEM)

    def cspec(w):
        return pl.BlockSpec(w.shape, i32map(lambda i: (0, 0)),
                            memory_space=pltpu.VMEM)

    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=max(config.pallas_vmem_limit, 112 * 2**20))

    def apply(x):
        xr, xi = x
        o_r, o_i = pl.pallas_call(
            kernel, grid=(grid_steps,),
            in_specs=[bspec, bspec] + [cspec(w) for w in consts],
            out_specs=[bspec, bspec],
            out_shape=[jax.ShapeDtypeStruct((TB * P, R * Q), jnp.float32)] * 2,
            compiler_params=cparams,
        )(xr, xi, *[jnp.asarray(w) for w in consts])
        return o_r, o_i

    return apply


def make_vpu_ladder(k, grid_steps=B // TB):
    """Resident chain of k complex-multiplies on one (tb*p, r*q) block."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rustfft_tpu.config import config
    from rustfft_tpu.ops.pallas.util import i32map

    t = np.cos(np.arange(TB * P * R * Q, dtype=np.float64) * 0.001)
    tr = t.reshape(TB * P, R * Q).astype(np.float32)
    ti = np.roll(t, 7).reshape(TB * P, R * Q).astype(np.float32) * 0.1

    def kernel(xr_ref, xi_ref, tr_ref, ti_ref, or_ref, oi_ref):
        xr, xi = xr_ref[:], xi_ref[:]
        trv, tiv = tr_ref[:], ti_ref[:]
        for _ in range(k):
            xr, xi = xr * trv - xi * tiv, xr * tiv + xi * trv
        or_ref[:] = xr
        oi_ref[:] = xi

    bspec = pl.BlockSpec((TB * P, R * Q), i32map(lambda i: (0, 0)),
                         memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=max(config.pallas_vmem_limit, 112 * 2**20))

    def apply(x):
        xr, xi = x
        o_r, o_i = pl.pallas_call(
            kernel, grid=(grid_steps,),
            in_specs=[bspec] * 4,
            out_specs=[bspec, bspec],
            out_shape=[jax.ShapeDtypeStruct((TB * P, R * Q), jnp.float32)] * 2,
            compiler_params=cparams,
        )(xr, xi, jnp.asarray(tr), jnp.asarray(ti))
        return o_r, o_i

    return apply


def make_mxu_ladder(m, grid_steps=B // TB):
    """Resident chain of m stage-A-style cat-Gauss contractions."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rustfft_tpu.common import FftDirection
    from rustfft_tpu.config import config
    from rustfft_tpu.ops.pallas import fused
    from rustfft_tpu import twiddles
    from rustfft_tpu.ops.pallas.util import i32map

    precision = fused.resolve_precision(None, False)
    w6 = fused.gauss_tables(
        twiddles.dft_matrix(P, FftDirection.FORWARD), precision
    )
    dims = (((1,), (1,)), ((), ()))

    def kernel(xr_ref, xi_ref, *refs):
        w_refs, (or_ref, oi_ref) = refs[:-2], refs[-2:]
        xr = xr_ref[:].reshape(TB, P, R * Q)
        xi = xi_ref[:].reshape(TB, P, R * Q)
        for _ in range(m):
            ar, ai = fused.gauss_contract(xr, xi, [w[:] for w in w_refs],
                                          dims, precision)
            # output is (TB, R*Q, P): feed back via a lane<->sublane
            # transpose (lane-dim reshapes are illegal in VMEM) — the
            # m-delta therefore prices "one cat-Gauss group + 2 transposes"
            xr = jnp.swapaxes(ar, 1, 2)[:, :P, :]
            xi = jnp.swapaxes(ai, 1, 2)[:, :P, :]
        or_ref[:] = xr.reshape(TB * P, R * Q)
        oi_ref[:] = xi.reshape(TB * P, R * Q)

    bspec = pl.BlockSpec((TB * P, R * Q), i32map(lambda i: (0, 0)),
                         memory_space=pltpu.VMEM)

    def cspec(w):
        return pl.BlockSpec(w.shape, i32map(lambda i: (0, 0)),
                            memory_space=pltpu.VMEM)

    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=max(config.pallas_vmem_limit, 112 * 2**20))

    def apply(x):
        xr, xi = x
        o_r, o_i = pl.pallas_call(
            kernel, grid=(grid_steps,),
            in_specs=[bspec, bspec] + [cspec(w) for w in w6],
            out_specs=[bspec, bspec],
            out_shape=[jax.ShapeDtypeStruct((TB * P, R * Q), jnp.float32)] * 2,
            compiler_params=cparams,
        )(xr, xi, *[jnp.asarray(w) for w in w6])
        return o_r, o_i

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
    nbytes = 2 * 2 * 4 * N * B  # pair x (read + write)

    scale = 1e-30
    re = jax.device_put((rng.standard_normal((B, N)) * scale).astype(np.float32))
    im = jax.device_put((rng.standard_normal((B, N)) * scale).astype(np.float32))
    re_blk = jax.device_put(
        (rng.standard_normal((TB * P, R * Q)) * scale).astype(np.float32))
    im_blk = jax.device_put(
        (rng.standard_normal((TB * P, R * Q)) * scale).astype(np.float32))

    rows = {}

    def row(label, fn, a=None, b=None):
        a = re if a is None else a
        b = im if b is None else b
        try:
            t = time_fn(fn, a, b)
            rows[label] = t
            print(f"  {label:<34} {t*1e3:8.3f} ms  {flops/t/1e9:7.1f} GF/s-eq"
                  f"  {nbytes/t/1e9:7.1f} GB/s-eq", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {label:<34} FAILED {str(e)[:160]}", flush=True)

    # references
    row("xla-scale", lambda x: (x[0] * 1.0000001, x[1] * 1.0000001))

    # the shipping kernels
    for variant in ("ctwg", "ctw"):
        fn = fused.make_fused_radix_fn(
            N, FftDirection.FORWARD, np.complex64, variant=variant)
        row(f"radix-{variant}", fn)

    # pure copies at the kernel's own layout and at flat aspects
    row("copy@radix (1024,512)blk", make_copy(B * P, R * Q, TB * P, R * Q))
    row("copy@radix (128,512)blk", make_copy(B * P, R * Q, P, R * Q))
    row("copy@radix (8192,512)blk", make_copy(B * P, R * Q, 64 * P, R * Q))
    row("copy@flat (8,65536)blk", make_copy(B, N, 8, N))
    row("copy@flat (64,65536)blk", make_copy(B, N, 64, N))
    row("copy@flat (512,4096)blk", make_copy(B, N, B, 4096))

    # resident compute (one block of HBM traffic total)
    row("resident-ctwg x64", make_resident_ctwg(), re_blk, im_blk)

    # VPU op ladder (per-op cost from the k-deltas)
    for k in (4, 16, 64):
        row(f"vpu-ladder k={k}", make_vpu_ladder(k), re_blk, im_blk)
    if all(f"vpu-ladder k={k}" in rows for k in (16, 64)):
        dt = rows["vpu-ladder k=64"] - rows["vpu-ladder k=16"]
        per_op = dt / 48 / 6  # 6 vector ops per cmul iteration
        data = TB * P * R * Q * (B // TB)
        print(f"  -> one full-data VPU op ~ {per_op*1e6:.1f} us"
              f" ({data / max(per_op,1e-12) / 1e12:.2f} T f32-op/s)",
              flush=True)

    # MXU ladder
    for m in (1, 3):
        row(f"mxu-ladder m={m}", make_mxu_ladder(m), re_blk, im_blk)
    if all(f"mxu-ladder m={m}" in rows for m in (1, 3)):
        dt = rows["mxu-ladder m=3"] - rows["mxu-ladder m=1"]
        per_stage = dt / 2
        print(f"  -> one stage-A cat-Gauss group ~ {per_stage*1e3:.3f} ms",
              flush=True)

    # additivity check
    if all(k in rows for k in ("radix-ctwg", "copy@radix (1024,512)blk",
                               "resident-ctwg x64")):
        kern = rows["radix-ctwg"]
        dma = rows["copy@radix (1024,512)blk"]
        comp = rows["resident-ctwg x64"]
        print(f"  -> additivity: kernel {kern*1e3:.2f} vs dma {dma*1e3:.2f}"
              f" + compute {comp*1e3:.2f} = {(dma+comp)*1e3:.2f} ms"
              f" (max = {max(dma, comp)*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
