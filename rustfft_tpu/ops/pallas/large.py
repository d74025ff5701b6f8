"""Large-N FFT as two Pallas kernels: 2 HBM passes for n beyond VMEM tiles.

For n = P*Q beyond what a single VMEM-resident kernel can hold
(ops/pallas/fused.py), the Cooley-Tukey split (ops/ct.py derivation, the
reference's MixedRadix six-step, mixed_radix.rs:128-158) is executed as two
column/row kernels with all transposes absorbed into block layouts and GEMM
output orders — no standalone XLA transpose passes:

  kernel A ("column stage"): one (P, Q) tile [j1, j2] per batch element
      (2D blocks of the (B*P, Q) view — 2D DMA measures faster than 3D):
      contract the sublane j1 axis against the dense 2P x 2P block DFT
      matrix (MXU), multiply by the resident outer twiddle w_n^(k1*j2)
      (VPU), and emit (Q, P) [j2, k1] — the dot_general output order makes
      the inter-stage transpose free.
  kernel B ("row stage"): one (Q, P) tile [j2, k1] per batch element:
      FFT of length Q over the *sublane* axis via an internal two-stage
      q1 x q2 decomposition; the stage output orders land the result flat
      in natural order [k2, k1].

Output (B, Q, P) reshaped to (B, n) is X[k2*P + k1]: ascending frequency.

Total HBM traffic: read + write per kernel = 2 passes over the signal, vs
~6 for the XLA six-step (3 transposes each costing a read+write).  MXU work
is 24*(P + q1 + q2) bf16-flops/element at the default bf16x3 precision —
pick P, q1, q2 to hold that near the 2-pass memory bound.

Twiddle precision: all tables computed host-side in f64 (twiddles.py), cast
to f32; the n-sized outer table is an HBM constant whose (Q, P) layout is
read once per batch element.
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
from .fused import _split_bf16, _dot3


def _contract(x, w_hi, w_lo, dims, precision):
    if precision == "bf16x3":
        return _dot3(x, w_hi, w_lo, dims)
    return jax.lax.dot_general(
        x, w_hi, dims, preferred_element_type=jnp.float32, precision=precision
    )


def _kernel_a(p, q, precision, xr_ref, xi_ref, wp_hi_ref, wp_lo_ref,
              twr_ref, twi_ref, or_ref, oi_ref):
    """Column stage: (P, Q) [j1, j2] -> (Q, P) [j2, k1], twiddled."""
    xb = jnp.concatenate([xr_ref[:], xi_ref[:]], axis=0)  # (2P, Q)
    # contract the sublane j1 axis; output order = (Q, 2P): [j2, k1]
    a = _contract(
        xb, wp_hi_ref[:], wp_lo_ref[:], (((0,), (1,)), ((), ())), precision
    )
    ar = a[:, :p]
    ai = a[:, p:]
    twr = twr_ref[:]  # (Q, P) outer twiddle table [j2, k1]
    twi = twi_ref[:]
    or_ref[:] = ar * twr - ai * twi
    oi_ref[:] = ar * twi + ai * twr


def _kernel_b(q1, q2, pt, precision, variant, xr_ref, xi_ref, w1_hi_ref,
              w1_lo_ref, w2_hi_ref, w2_lo_ref, twr_ref, twi_ref,
              or_ref, oi_ref):
    """Row stage: (Q, pt) [j2, k1] -> (Q, pt) [k2, k1] natural order.

    FFT of length Q = q1*q2 over the sublane axis, lanes untouched.
    """
    xr = xr_ref[:].reshape(q1, q2, pt)  # [ja, jb, k1]
    xi = xi_ref[:].reshape(q1, q2, pt)

    def wlhs(w_hi_ref, w_lo_ref, x, rhs_dim):
        """Weights-as-lhs contraction: out[k, ...] = sum_j w[k, j] x[..j..]."""
        dims = (((1,), (rhs_dim,)), ((), ()))
        if precision == "bf16x3":
            w_hi, w_lo = w_hi_ref[:], w_lo_ref[:]
            x_hi = x.astype(jnp.bfloat16)
            x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            kw = dict(preferred_element_type=jnp.float32)
            return (
                jax.lax.dot_general(w_hi, x_hi, dims, **kw)
                + jax.lax.dot_general(w_lo, x_hi, dims, **kw)
                + jax.lax.dot_general(w_hi, x_lo, dims, **kw)
            )
        return jax.lax.dot_general(
            w_hi_ref[:], x, dims,
            preferred_element_type=jnp.float32, precision=precision,
        )

    # stage 1: DFT_q1 over ja
    if variant == "wlhs":
        xb = jnp.concatenate([xr, xi], axis=0)  # (2q1, q2, pt)
        a = wlhs(w1_hi_ref, w1_lo_ref, xb, 0)  # (2q1, q2, pt) [ka, jb, k1]
    else:  # "swap": make ja the sublane dim, contract rhs-style, fix order
        s_r = jnp.swapaxes(xr, 0, 1)  # (q2, q1, pt)
        s_i = jnp.swapaxes(xi, 0, 1)
        sb = jnp.concatenate([s_r, s_i], axis=1)  # (q2, 2q1, pt)
        a = _contract(
            sb, w1_hi_ref[:], w1_lo_ref[:], (((1,), (1,)), ((), ())), precision
        )  # (q2, pt, 2q1)
        a = jnp.moveaxis(a, -1, 0)  # (2q1, q2, pt) [ka, jb, k1]

    ar = a[:q1]
    ai = a[q1:]

    # inner twiddle w_Q^(ka*jb), tables (q1, q2, 1) broadcast over lanes
    twr = twr_ref[:].reshape(q1, q2, 1)
    twi = twi_ref[:].reshape(q1, q2, 1)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr  # (q1, q2, pt) [ka, jb, k1]

    # stage 2: DFT_q2 over jb
    bb = jnp.concatenate([br, bi], axis=1)  # (q1, 2q2, pt)
    if variant == "wlhs":
        d = wlhs(w2_hi_ref, w2_lo_ref, bb, 1)  # (2q2, q1, pt) [kb, ka, k1]
    else:
        d = _contract(
            bb, w2_hi_ref[:], w2_lo_ref[:], (((1,), (1,)), ((), ())), precision
        )  # (q1, pt, 2q2)
        d = jnp.moveaxis(d, -1, 0)  # (2q2, q1, pt) [kb, ka, k1]
    dr = d[:q2]
    di = d[q2:]

    # flat index kb*q1 + ka = natural order within Q
    or_ref[:] = dr.reshape(q1 * q2, pt)
    oi_ref[:] = di.reshape(q1 * q2, pt)


def choose_pqq(n: int) -> Optional[Tuple[int, int, int]]:
    """Pick n = P * (q1*q2) minimizing MXU work with VMEM-feasible tiles."""
    best = None
    budget = int(config.pallas_vmem_limit * 0.85)
    for p in range(8, 513):
        if n % p:
            continue
        rest = n // p
        if rest < 4:
            continue
        # both kernels hold ~10 live f32 copies of a (P, Q)/(Q, P) tile;
        # beyond the budget (n ~> 1.4M at 64MB) fall back to the XLA path
        if 10 * 4 * n > budget:
            continue
        # split rest = q1*q2 as balanced as possible, both <= 256
        inner = None
        for q1 in range(2, 257):
            if rest % q1:
                continue
            q2 = rest // q1
            if q2 > 256:
                continue
            key = (q1 + q2, abs(q1 - q2))
            if inner is None or key < inner[0]:
                inner = (key, q1, q2)
        if inner is None:
            continue
        _, q1, q2 = inner
        work = p + q1 + q2  # bf16 passes per element / 24
        key = (work, abs(p * p - n))  # prefer balanced P vs Q
        if best is None or key < best[0]:
            best = (key, p, q1, q2)
    if best is None:
        return None
    _, p, q1, q2 = best
    return p, q1, q2


def large_supported(n: int, dtype) -> bool:
    if np.dtype(dtype) != np.complex64:
        return False
    return choose_pqq(n) is not None


def make_large_fft_fn(
    n: int,
    direction: FftDirection,
    dtype,
    split: Optional[Tuple[int, int, int]] = None,
    interpret: bool = False,
    precision=None,
    variant: str = "swap",
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n), the two-kernel pipeline."""
    assert np.dtype(dtype) == np.complex64, "large kernel is c64/f32 only"
    pqq = split or choose_pqq(n)
    assert pqq is not None, f"no large split for n={n}"
    p, q1, q2 = pqq
    q = q1 * q2
    assert p * q == n
    if precision is None:
        precision = config.pallas_precision
    rdt = np.float32

    # kernel A constants
    wp = calg.block_mid(twiddles.dft_matrix(p, direction), rdt)  # (2P, 2P)
    # outer twiddle table, stored transposed (Q, P) = [j2, k1]
    tw_outer = twiddles.twiddle_table(p, q, direction).T
    twr_o = np.ascontiguousarray(tw_outer.real).astype(rdt)
    twi_o = np.ascontiguousarray(tw_outer.imag).astype(rdt)

    # kernel B constants
    w1 = calg.block_mid(twiddles.dft_matrix(q1, direction), rdt)
    w2 = calg.block_mid(twiddles.dft_matrix(q2, direction), rdt)
    tw_inner = twiddles.twiddle_table(q1, q2, direction)  # (q1, q2) [ka, jb]
    twr_i = np.ascontiguousarray(tw_inner.real).astype(rdt)
    twi_i = np.ascontiguousarray(tw_inner.imag).astype(rdt)

    if precision == "bf16x3":
        wp_hi, wp_lo = _split_bf16(wp)
        w1_hi, w1_lo = _split_bf16(w1)
        w2_hi, w2_lo = _split_bf16(w2)
    else:
        zeros = lambda w: np.zeros_like(w, dtype=jnp.bfloat16)
        wp_hi, wp_lo = wp, zeros(wp)
        w1_hi, w1_lo = w1, zeros(w1)
        w2_hi, w2_lo = w2, zeros(w2)

    kernel_a = functools.partial(_kernel_a, p, q, precision)
    kernel_b = functools.partial(_kernel_b, q1, q2, p, precision, variant)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=config.pallas_vmem_limit)

    def const_spec(w):
        return pl.BlockSpec(w.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)

    def call(xr, xi):
        batch = xr.shape[0]

        # ---- kernel A: per-batch (P, Q) tile -> (Q, P), twiddled ----
        a_r, a_i = pl.pallas_call(
            kernel_a,
            grid=(batch,),
            in_specs=[
                pl.BlockSpec((p, q), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((p, q), lambda b: (b, 0), memory_space=pltpu.VMEM),
                const_spec(wp_hi),
                const_spec(wp_lo),
                const_spec(twr_o),
                const_spec(twi_o),
            ],
            out_specs=[
                pl.BlockSpec((q, p), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((q, p), lambda b: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((batch * q, p), jnp.float32),
                jax.ShapeDtypeStruct((batch * q, p), jnp.float32),
            ],
            compiler_params=cparams,
            interpret=interpret,
        )(
            xr.reshape(batch * p, q),
            xi.reshape(batch * p, q),
            jnp.asarray(wp_hi),
            jnp.asarray(wp_lo),
            jnp.asarray(twr_o),
            jnp.asarray(twi_o),
        )

        # ---- kernel B: FFT_Q over sublanes of per-batch (Q, P) tiles ----
        out_r, out_i = pl.pallas_call(
            kernel_b,
            grid=(batch,),
            in_specs=[
                pl.BlockSpec((q, p), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((q, p), lambda b: (b, 0), memory_space=pltpu.VMEM),
                const_spec(w1_hi),
                const_spec(w1_lo),
                const_spec(w2_hi),
                const_spec(w2_lo),
                const_spec(twr_i),
                const_spec(twi_i),
            ],
            out_specs=[
                pl.BlockSpec((q, p), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((q, p), lambda b: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((batch * q, p), jnp.float32),
                jax.ShapeDtypeStruct((batch * q, p), jnp.float32),
            ],
            compiler_params=cparams,
            interpret=interpret,
        )(
            a_r,
            a_i,
            jnp.asarray(w1_hi),
            jnp.asarray(w1_lo),
            jnp.asarray(w2_hi),
            jnp.asarray(w2_lo),
            jnp.asarray(twr_i),
            jnp.asarray(twi_i),
        )
        return out_r.reshape(batch, n), out_i.reshape(batch, n)

    def apply(x):
        xr, xi = x
        shape = xr.shape
        out_r, out_i = call(xr.reshape(-1, n), xi.reshape(-1, n))
        return out_r.reshape(shape), out_i.reshape(shape)

    return apply
