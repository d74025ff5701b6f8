"""Fused two-stage FFT kernel: whole transform in VMEM, one HBM pass.

For n = p*q (p, q <= 512), the four-step decomposition (ops/ct.py derivation)
runs entirely inside one Pallas kernel per batch tile:

    load (TB, n) -> (TB, p, q) -> swap -> GEMM vs DFT_p block -> twiddle
    -> swap -> GEMM vs DFT_q block -> swap -> store (TB, n)

Both GEMMs are real block-matrix complex matmuls (calg.block_last) with
K = 2p / 2q contraction dims that tile the 128x128 MXU; the three transposes
and the twiddle multiply are VMEM-local, so each transform costs exactly one
HBM read + one HBM write — the memory-bound speed of light for a batched
FFT.  This kernel replaces a chain of XLA einsum stages that would each
round-trip HBM (the XLA-level path remains as the fallback and the CPU path).

Reference counterpart: the AVX "butterfly-with-scratch" kernels that keep
64..512-point FFTs entirely in registers (avx32_butterflies.rs:118-244), and
the mixedradix_transpose! packed writebacks (avx_mixed_radix.rs:427-530).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...common import FftDirection
from ...config import config
from ... import twiddles
from .. import calg

#: largest fused transform: p, q <= 512 keeps the (2p)^2 DFT blocks and the
#: (TB, n) tile within VMEM limits.
MAX_FUSED_N = 512 * 512


def fused_supported(n: int, dtype) -> bool:
    """Fused kernel applies to c64 on TPU backends for factorable sizes."""
    if np.dtype(dtype) != np.complex64:
        return False
    if n < 4 or n > MAX_FUSED_N:
        return False
    return _choose_pq(n) is not None


def _choose_pq(n: int) -> Optional[Tuple[int, int]]:
    """Near-balanced n = p*q with p, q <= 512 (prefer q >= p; lane-friendly q)."""
    best = None
    for p in range(2, 513):
        if n % p:
            continue
        q = n // p
        if q > 512:
            continue
        score = abs(p - q)
        if best is None or score < best[0]:
            best = (score, p, q)
    if best is None:
        return None
    _, p, q = best
    return p, q


def _pick_batch_tile(batch: int, n: int) -> int:
    """Choose TB so the kernel's working set fits VMEM.

    Empirically ~20 live f32 tile copies (intermediates + Mosaic's
    double-buffered in/out blocks) bound the footprint; keep them under ~6MB
    of the 16MB VMEM.
    """
    budget = 6 * 1024 * 1024
    per_row = 20 * 4 * n
    tb = max(1, budget // per_row)
    tb = 1 << (tb.bit_length() - 1)  # floor to a power of two
    return min(tb, 128, batch)


def _fused_kernel(p, q, precision, xr_ref, xi_ref, wp_ref, wq_ref, twr_ref,
                  twi_ref, or_ref, oi_ref):
    # Mosaic cannot split/merge the lane (last) dim, so tiles arrive already
    # shaped (tb, p, q) and leave shaped (tb, q, p); only leading-dim merges
    # and last-two-dim transposes happen in VMEM (both supported shape casts).
    tb = xr_ref.shape[0]
    xr = xr_ref[:]
    xi = xi_ref[:]

    # stage 1: DFT_p over j1 (right-mult after a VMEM transpose)
    t1r = jnp.swapaxes(xr, -1, -2).reshape(tb * q, p)  # [j2, j1]
    t1i = jnp.swapaxes(xi, -1, -2).reshape(tb * q, p)
    xs = jnp.concatenate([t1r, t1i], axis=-1)  # (tb*q, 2p)
    a = jnp.dot(xs, wp_ref[:], preferred_element_type=jnp.float32,
                precision=precision)
    ar = a[:, :p].reshape(tb, q, p)  # [j2, k1]
    ai = a[:, p:].reshape(tb, q, p)

    # inter-stage twiddle w_n^(k1*j2), table transposed to [j2, k1]
    twr = twr_ref[:]
    twi = twi_ref[:]
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr

    # stage 2: DFT_q over j2
    cr = jnp.swapaxes(br, -1, -2).reshape(tb * p, q)  # [k1, j2]
    ci = jnp.swapaxes(bi, -1, -2).reshape(tb * p, q)
    cs = jnp.concatenate([cr, ci], axis=-1)  # (tb*p, 2q)
    d = jnp.dot(cs, wq_ref[:], preferred_element_type=jnp.float32,
                precision=precision)
    dr = d[:, :q].reshape(tb, p, q)  # [k1, k2]
    di = d[:, q:].reshape(tb, p, q)

    # natural order k = k2*p + k1: emit (tb, q, p); caller flattens to (tb, n)
    or_ref[:] = jnp.swapaxes(dr, -1, -2)
    oi_ref[:] = jnp.swapaxes(di, -1, -2)


def make_fused_two_stage_fn(
    n: int,
    direction: FftDirection,
    dtype,
    split: Optional[Tuple[int, int]] = None,
    interpret: bool = False,
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n) running the fused kernel."""
    assert np.dtype(dtype) == np.complex64, "fused kernel is c64/f32 only"
    pq = split or _choose_pq(n)
    assert pq is not None, f"no fused split for n={n}"
    p, q = pq
    rdt = np.float32

    wp = calg.block_last(twiddles.dft_matrix(p, direction), rdt)  # (2p, 2p)
    wq = calg.block_last(twiddles.dft_matrix(q, direction), rdt)  # (2q, 2q)
    tw = twiddles.twiddle_table(p, q, direction).T  # [j2, k1]
    twr = np.ascontiguousarray(tw.real).astype(rdt)
    twi = np.ascontiguousarray(tw.imag).astype(rdt)

    kernel = functools.partial(_fused_kernel, p, q, config.matmul_precision)

    def call(xr, xi, tb):
        batch = xr.shape[0]
        grid = batch // tb
        in_bspec = pl.BlockSpec((tb, p, q), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        out_bspec = pl.BlockSpec((tb, q, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        out_r, out_i = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                in_bspec,
                in_bspec,
                pl.BlockSpec((2 * p, 2 * p), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * q, 2 * q), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((q, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((q, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[out_bspec, out_bspec],
            out_shape=[
                jax.ShapeDtypeStruct((batch, q, p), jnp.float32),
                jax.ShapeDtypeStruct((batch, q, p), jnp.float32),
            ],
            interpret=interpret,
        )(
            xr.reshape(batch, p, q),
            xi.reshape(batch, p, q),
            jnp.asarray(wp),
            jnp.asarray(wq),
            jnp.asarray(twr),
            jnp.asarray(twi),
        )
        return out_r.reshape(batch, n), out_i.reshape(batch, n)

    def apply(x):
        xr, xi = x
        shape = xr.shape
        flat_r = xr.reshape(-1, n)
        flat_i = xi.reshape(-1, n)
        batch = flat_r.shape[0]
        tb = _pick_batch_tile(batch, n)
        pad = (-batch) % tb
        if pad:
            flat_r = jnp.pad(flat_r, ((0, pad), (0, 0)))
            flat_i = jnp.pad(flat_i, ((0, pad), (0, 0)))
        out_r, out_i = call(flat_r, flat_i, tb)
        if pad:
            out_r = out_r[:batch]
            out_i = out_i[:batch]
        return out_r.reshape(shape), out_i.reshape(shape)

    return apply
