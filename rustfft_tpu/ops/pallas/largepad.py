"""Padded-lane two-kernel pipeline: lane-MISALIGNED big composites.

The two-kernel pipeline (large.py) requires both factors to be multiples
of 128 — Mosaic rejects lane blocks that are neither 128-multiples nor
whole dims, and whole-dim misaligned lane blocks fail outright (verified
at 3^11).  That strands an entire class the reference benches — pow5,
pow7, 3^k, and real-world sizes like 10^6 — on the XLA six-step
(~180-250 GF/s measured).

This tier pads the LANE axes only (the transform length is exact):

    x (B, P, Q) --XLA pad--> (B, P, Q') with Q' = ceil(Q/128)*128
    kernel A': per (Q'-tile, batch) block (1, P, 128): contract the
        sublane j1 axis against the dense 2P x 2P block DFT (sublane
        contractions have NO alignment constraint — P can be 125 or 243),
        multiply the outer twiddle whose PAD ROWS ARE ZERO (j2 >= Q), and
        emit (1, 128, P') with the lane axis zero-padded in-VMEM to
        P' = ceil(P/128)*128 -> (B, Q', P').
    kernel B': per (P'-tile, batch) block (1, Q', 128): slice the live Q
        sublane rows, run the two-stage q1 x q2 FFT over them
        (large._kernel_b's swap scheme — sublane reshapes are free-form),
        zero-pad rows back to Q' -> (B, Q', P') [k2, k1].
    XLA slice [:, :Q, :P] -> (B, n) ascending frequency.

HBM traffic: ~8 traversals x the pad ratio (Q'*P')/n vs ~12 unpadded for
the XLA six-step; the split chooser rejects ratios above PAD_RATIO_MAX
(pathological shapes like 7^5 = 343*49 inflate 2.9x and stay on XLA).

Reference counterpart: the MixedRadix six-step over arbitrary factor
pairs (mixed_radix.rs:128-158); the padding trick is the TPU analogue of
AVX's partial load/stores for remainder columns (avx_vector.rs:442-447).
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
from .fused import contract_rhs as _contract, resolve_precision, w_split

from .util import i32map

#: padded-points / n above which the tier loses to the XLA six-step
PAD_RATIO_MAX = 1.75


def _r128(v: int) -> int:
    return -(-v // 128) * 128


def choose_pq_padded(n: int) -> Optional[Tuple[int, int, int]]:
    """Split n = P * (q1*q2), P <= 512, q1, q2 <= 256, minimizing the
    (pad-ratio, MXU-flops) pair; None when every split pads too much or
    the kernel-B' working set exceeds VMEM."""
    best = None
    budget = int(config.pallas_vmem_limit * 0.85)
    for p in range(8, 513):
        if n % p:
            continue
        q = n // p
        if q < 4:
            continue
        inner = None
        # q1, q2 >= 8: sub-8 factors put <16-lane intermediates through
        # kernel B's moveaxis and the Mosaic compile fails (measured: the
        # (125, 5, 25) split at 15625 and 10000; (9, 27) compiles)
        for q1 in range(8, 257):
            if q % q1:
                continue
            q2 = q // q1
            if q2 > 256 or q2 < 8:
                continue
            key = (q1 + q2, abs(q1 - q2))
            if inner is None or key < inner[0]:
                inner = (key, q1, q2)
        if inner is None:
            continue
        _, q1, q2 = inner
        ratio = _r128(q) * _r128(p) / n
        if ratio > PAD_RATIO_MAX:
            continue
        # kernel B' holds a (Q', 128) pair (~8 live f32 copies)
        if 8 * _r128(q) * 128 * 4 > budget:
            continue
        key = (round(ratio, 3), p + q1 + q2)
        if best is None or key < best[0]:
            best = (key, p, q1, q2)
    if best is None:
        return None
    _, p, q1, q2 = best
    return p, q1, q2


def largepad_supported(n: int, dtype) -> bool:
    if np.dtype(dtype) != np.complex64:
        return False
    return choose_pq_padded(n) is not None


def _kernel_a_pad(tb, p, p_pad, qt, precision, xr_ref, xi_ref, wp_hi_ref,
                  wp_lo_ref, twr_ref, twi_ref, or_ref, oi_ref):
    """(tb, P, qt) [j1, j2] -> (tb, qt, P') [j2, k1], twiddled, lane-padded.

    Batch-tiled: the grid-step count at these mid sizes otherwise makes the
    pipeline DMA-latency bound (measured 33.8ms at 15625 x 4096 with tb=1 —
    ~8us/step on ~250KB blocks)."""
    xb = jnp.concatenate([xr_ref[:], xi_ref[:]], axis=1)  # (tb, 2P, qt)
    a = _contract(
        xb, wp_hi_ref[:], wp_lo_ref[:], (((1,), (1,)), ((), ())), precision
    )  # (tb, qt, 2P)
    ar = a[:, :, :p]
    ai = a[:, :, p:]
    twr = twr_ref[:]  # (qt, P) block; rows j2 >= Q are zero
    twi = twi_ref[:]
    zr = ar * twr - ai * twi
    zi = ar * twi + ai * twr
    if p_pad != p:
        pad = jnp.zeros((tb, zr.shape[1], p_pad - p), jnp.float32)
        zr = jnp.concatenate([zr, pad], axis=2)
        zi = jnp.concatenate([zi, pad], axis=2)
    or_ref[:] = zr
    oi_ref[:] = zi


def _kernel_b_pad(tb, q1, q2, q_pad, pt, precision, xr_ref, xi_ref,
                  w1_hi_ref, w1_lo_ref, w2_hi_ref, w2_lo_ref, twr_ref,
                  twi_ref, or_ref, oi_ref):
    """(tb, Q', pt) [j2, k1] -> (tb, Q', pt) [k2, k1]: FFT_Q over the live
    sublane rows (large._kernel_b's swap scheme), rows re-padded after."""
    q = q1 * q2
    xr = xr_ref[:][:, :q].reshape(tb, q1, q2, pt)
    xi = xi_ref[:][:, :q].reshape(tb, q1, q2, pt)

    s_r = jnp.swapaxes(xr, 1, 2)  # (tb, q2, q1, pt)
    s_i = jnp.swapaxes(xi, 1, 2)
    sb = jnp.concatenate([s_r, s_i], axis=2)  # (tb, q2, 2q1, pt)
    a = _contract(
        sb, w1_hi_ref[:], w1_lo_ref[:], (((2,), (1,)), ((), ())), precision
    )  # (tb, q2, pt, 2q1)
    a = jnp.moveaxis(a, -1, 1)  # (tb, 2q1, q2, pt) [ka, jb, k1]
    ar, ai = a[:, :q1], a[:, q1:]

    twr = twr_ref[:].reshape(1, q1, q2, 1)
    twi = twi_ref[:].reshape(1, q1, q2, 1)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr  # (tb, q1, q2, pt) [ka, jb, k1]

    bb = jnp.concatenate([br, bi], axis=2)  # (tb, q1, 2q2, pt)
    d = _contract(
        bb, w2_hi_ref[:], w2_lo_ref[:], (((2,), (1,)), ((), ())), precision
    )  # (tb, q1, pt, 2q2)
    d = jnp.moveaxis(d, -1, 1)  # (tb, 2q2, q1, pt) [kb, ka, k1]
    dr = d[:, :q2].reshape(tb, q, pt)
    di = d[:, q2:].reshape(tb, q, pt)
    if q_pad != q:
        pad = jnp.zeros((tb, q_pad - q, pt), jnp.float32)
        dr = jnp.concatenate([dr, pad], axis=1)
        di = jnp.concatenate([di, pad], axis=1)
    or_ref[:] = dr
    oi_ref[:] = di


def make_largepad_fft_fn(
    n: int,
    direction: FftDirection,
    dtype,
    split: Optional[Tuple[int, int, int]] = None,
    interpret: bool = False,
    precision=None,
    qt: int = 128,
    pt: int = 128,
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n), the padded-lane pipeline."""
    assert np.dtype(dtype) == np.complex64, "largepad kernel is c64/f32 only"
    pqq = split or choose_pq_padded(n)
    assert pqq is not None, f"no padded split for n={n}"
    p, q1, q2 = pqq
    q = q1 * q2
    assert p * q == n
    p_pad = _r128(p)
    q_pad = _r128(q)
    precision = resolve_precision(precision, interpret)
    rdt = np.float32
    # default tiles: whole Q' for kernel A (it is small at these sizes),
    # 128 lanes for kernel B
    qt = min(qt if qt > 128 else q_pad, q_pad)
    pt = min(pt, p_pad)
    assert q_pad % qt == 0 and p_pad % pt == 0, (pqq, qt, pt)

    def _tb(batch):
        # ~8 live f32 pair-copies of the largest in-kernel tile
        per = 8 * 2 * 4 * max(p * qt, qt * p_pad, q_pad * pt)
        budget = int(config.pallas_vmem_limit * 0.8)
        tb = max(1, budget // per)
        tb = 1 << (tb.bit_length() - 1)
        return max(1, min(tb, 32, batch))

    wp = calg.block_mid(twiddles.dft_matrix(p, direction), rdt)  # (2P, 2P)
    wp_hi, wp_lo = w_split(wp, precision)
    # outer twiddle (Q', P) with zero pad rows: kills the lane-pad garbage
    tw_outer = np.zeros((q_pad, p), np.complex128)
    tw_outer[:q] = twiddles.twiddle_table(p, q, direction).T  # [j2, k1]
    twr_o = np.ascontiguousarray(tw_outer.real).astype(rdt)
    twi_o = np.ascontiguousarray(tw_outer.imag).astype(rdt)

    w1 = calg.block_mid(twiddles.dft_matrix(q1, direction), rdt)
    w2 = calg.block_mid(twiddles.dft_matrix(q2, direction), rdt)
    w1_hi, w1_lo = w_split(w1, precision)
    w2_hi, w2_lo = w_split(w2, precision)
    tw_inner = twiddles.twiddle_table(q1, q2, direction)
    twr_i = np.ascontiguousarray(tw_inner.real).astype(rdt)
    twi_i = np.ascontiguousarray(tw_inner.imag).astype(rdt)

    cparams = pltpu.CompilerParams(vmem_limit_bytes=config.pallas_vmem_limit)

    def cspec(w):
        return pl.BlockSpec(
            w.shape, i32map(lambda *_: (0, 0)), memory_space=pltpu.VMEM
        )

    def call(xr, xi):
        batch = xr.shape[0]
        tb = _tb(batch)
        pad_b = (-batch) % tb
        # lane-pad Q -> Q' and batch -> tb multiple (one XLA copy); the
        # transform length stays n
        xr = jnp.pad(
            xr.reshape(batch, p, q),
            ((0, pad_b), (0, 0), (0, q_pad - q)),
        )
        xi = jnp.pad(
            xi.reshape(batch, p, q),
            ((0, pad_b), (0, 0), (0, q_pad - q)),
        )
        bpad = batch + pad_b
        kernel_a = functools.partial(_kernel_a_pad, tb, p, p_pad, qt, precision)
        kernel_b = functools.partial(
            _kernel_b_pad, tb, q1, q2, q_pad, pt, precision
        )

        tw_spec = pl.BlockSpec(
            (qt, p), i32map(lambda qi, b: (qi, 0)), memory_space=pltpu.VMEM
        )
        a_r, a_i = pl.pallas_call(
            kernel_a,
            grid=(q_pad // qt, bpad // tb),  # batch fastest: twiddles resident
            in_specs=[
                pl.BlockSpec((tb, p, qt), i32map(lambda qi, b: (b, 0, qi)), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, p, qt), i32map(lambda qi, b: (b, 0, qi)), memory_space=pltpu.VMEM),
                cspec(wp_hi), cspec(wp_lo),
                tw_spec, tw_spec,
            ],
            out_specs=[
                pl.BlockSpec((tb, qt, p_pad), i32map(lambda qi, b: (b, qi, 0)), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, qt, p_pad), i32map(lambda qi, b: (b, qi, 0)), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bpad, q_pad, p_pad), jnp.float32)
            ] * 2,
            compiler_params=cparams,
            interpret=interpret,
        )(xr, xi, jnp.asarray(wp_hi), jnp.asarray(wp_lo),
          jnp.asarray(twr_o), jnp.asarray(twi_o))

        io_spec = pl.BlockSpec(
            (tb, q_pad, pt), i32map(lambda pi, b: (b, 0, pi)), memory_space=pltpu.VMEM
        )
        out_r, out_i = pl.pallas_call(
            kernel_b,
            grid=(p_pad // pt, bpad // tb),
            in_specs=[
                io_spec, io_spec,
                cspec(w1_hi), cspec(w1_lo), cspec(w2_hi), cspec(w2_lo),
                cspec(twr_i), cspec(twi_i),
            ],
            out_specs=[io_spec, io_spec],
            out_shape=[
                jax.ShapeDtypeStruct((bpad, q_pad, p_pad), jnp.float32)
            ] * 2,
            compiler_params=cparams,
            interpret=interpret,
        )(a_r, a_i,
          jnp.asarray(w1_hi), jnp.asarray(w1_lo),
          jnp.asarray(w2_hi), jnp.asarray(w2_lo),
          jnp.asarray(twr_i), jnp.asarray(twi_i))

        # slice the live lanes/rows; flat k = k2*P + k1 ascending
        out_r = out_r[:batch, :q, :p].reshape(batch, n)
        out_i = out_i[:batch, :q, :p].reshape(batch, n)
        return out_r, out_i

    def apply(x):
        xr, xi = x
        shape = xr.shape
        out_r, out_i = call(xr.reshape(-1, n), xi.reshape(-1, n))
        return out_r.reshape(shape), out_i.reshape(shape)

    return apply
