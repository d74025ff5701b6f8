"""Large-N FFT as two Pallas kernels: 2 HBM passes for n up to 2^22.

Size bound: choose_pqq needs n = P * q1 * q2 with P <= 512, q1, q2 <= 256,
and kernel B's (Q, 128) working set inside the VMEM budget — measured on
v5e, Q = 16384 fails the Mosaic compile even at a 112MB request, so Q caps
at 8192 and the hard ceiling is 512 * 8192 = 2^22.  (Thinner kernel-B lane
tiles are NOT a fallback either: Mosaic rejects pt < 128 blocks — see
max_lane_tile.)  Sizes beyond 2^22 fall back to the XLA six-step path.

For n = P*Q beyond what a single VMEM-resident kernel can hold
(ops/pallas/fused.py), the Cooley-Tukey split (ops/ct.py derivation, the
reference's MixedRadix six-step, mixed_radix.rs:128-158) is executed as two
column/row kernels with all transposes absorbed into block layouts and GEMM
output orders — no standalone XLA transpose passes:

  kernel A ("column stage"): x (B, P, Q) [j1, j2]
      per (Q-tile, batch) grid step: contract the sublane j1 axis against
      the dense 2P x 2P block DFT matrix (MXU) and multiply by the streamed
      outer twiddle w_n^(k1*j2) (VPU).  The dot_general output order
      (tile, k1-lanes) lands directly in the (B, Q, P) layout kernel B wants.
  kernel B ("row stage"): a (B, Q, P) [j2, k1]
      per (P-tile, batch) grid step: FFT of length Q over the *sublane* axis
      via an internal two-stage q1 x q2 decomposition; both stages contract
      with weights-as-lhs dot_generals whose output orders make the result
      come out flat in natural order [k2, k1] — again no transposes.

Output (B, Q, P) reshaped to (B, n) is X[k2*P + k1]: ascending frequency.

Total HBM traffic: read + write per kernel = 2 passes over the signal, vs
~6 for the XLA six-step (3 transposes each costing a read+write).  MXU work
is 24*(P + q1 + q2) bf16-flops/element at the default bf16x3 precision —
pick P, q1, q2 to hold that near the 2-pass memory bound.

Twiddle precision: all tables computed host-side in f64 (twiddles.py), cast
to f32; the streamed outer table is (Q, P) f32 in HBM, fetched once per
Q-tile (the batch loop is the fast grid axis, so Mosaic never refetches).
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
from .fused import (contract_rhs as _contract, contract_wlhs,
                    gauss_contract, gauss_tables, resolve_precision,
                    w_split)

from .util import i32map


def _kernel_a(p, qt, precision, xr_ref, xi_ref, wp_hi_ref, wp_lo_ref,
              twr_ref, twi_ref, or_ref, oi_ref):
    """Column stage: (1, P, qt) [j1, j2] -> (1, qt, P) [j2, k1], twiddled."""
    xb = jnp.concatenate([xr_ref[:], xi_ref[:]], axis=1)  # (1, 2P, qt)
    # contract the sublane j1 axis; output order = (1, qt, 2P): [j2, k1]
    a = _contract(
        xb, wp_hi_ref[:], wp_lo_ref[:], (((1,), (1,)), ((), ())), precision
    )
    ar = a[:, :, :p]
    ai = a[:, :, p:]
    twr = twr_ref[:]  # (qt, P) block of the (Q, P) outer twiddle table
    twi = twi_ref[:]
    or_ref[:] = ar * twr - ai * twi
    oi_ref[:] = ar * twi + ai * twr


def _kernel_a_gauss(p, qt, precision, xr_ref, xi_ref, w0, w1, w2, w3, w4,
                    w5, twr_ref, twi_ref, or_ref, oi_ref):
    """Column stage via Gauss 3-multiplication dots (25% less MXU work).

    DFT_P is kernel A's whale (24*P bf16-flops/pt dense), and the probe
    ladder shows GEMM time is the band's visible increment while
    elementwise ops ride free (tools/perf_anatomy.py) — same trade as the
    fused kernels' ctwg/gauss variants.

    MEASURED NEGATIVE on v5e (tools/perf_lgauss.py, same run, 2026-08-18):
    gauss loses at every large-tier size — 2^19: 669 vs 749 GF/s, 2^20:
    814 vs 873, 2^21: remote compile FAIL (exit 1) vs block 829 — and
    carries worse error (9.1e-6 vs 6.0e-6 rel: the P3-P1-P2 recombine
    cancels).  Unlike the one-pass band, this pipeline's kernels overlap
    their GEMMs with streaming DMA; cutting MXU flops buys nothing while
    the extra (xr+xi) temps and recombines add VPU serial time.  Default
    stays config.large_gauss=False; kernels kept for the record.
    """
    dims = (((1,), (1,)), ((), ()))
    ar, ai = gauss_contract(
        xr_ref[:], xi_ref[:], (w0, w1, w2, w3, w4, w5), dims, precision
    )  # (1, qt, P) each [j2, k1]
    twr = twr_ref[:]
    twi = twi_ref[:]
    or_ref[:] = ar * twr - ai * twi
    oi_ref[:] = ar * twi + ai * twr


def fftq_sublane_gauss(xr, xi, q1, q2, pt, precision, w6_1, w6_2, twr, twi):
    """fftq_sublane's Gauss twin: each stage as 3 real dots of K = q_i.

    Same swap-form dataflow (rhs sublane contraction + moveaxis); w6_i are
    the six gauss_tables() arrays per stage.
    """
    dims = (((1,), (1,)), ((), ()))
    s_r = jnp.swapaxes(xr.reshape(q1, q2, pt), 0, 1)  # (q2, q1, pt)
    s_i = jnp.swapaxes(xi.reshape(q1, q2, pt), 0, 1)

    # stage 1: DFT_q1 over ja
    ar, ai = gauss_contract(s_r, s_i, w6_1, dims, precision)  # (q2, pt, q1)
    ar = jnp.moveaxis(ar, -1, 0)  # (q1, q2, pt) [ka, jb, k1]
    ai = jnp.moveaxis(ai, -1, 0)

    twr = twr.reshape(q1, q2, 1)
    twi = twi.reshape(q1, q2, 1)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr

    # stage 2: DFT_q2 over jb
    dr, di = gauss_contract(br, bi, w6_2, dims, precision)  # (q1, pt, q2)
    dr = jnp.moveaxis(dr, -1, 0)  # (q2, q1, pt) [kb, ka, k1]
    di = jnp.moveaxis(di, -1, 0)
    return dr.reshape(q1 * q2, pt), di.reshape(q1 * q2, pt)


def _kernel_b_gauss(q1, q2, pt, precision, xr_ref, xi_ref, *refs):
    """Row stage, Gauss form: 12 weight refs (6 per stage) + twiddles."""
    q = q1 * q2
    w6_1 = refs[0:6]
    w6_2 = refs[6:12]
    twr_ref, twi_ref = refs[12:14]
    or_ref, oi_ref = refs[14:]
    dr, di = fftq_sublane_gauss(
        xr_ref[:].reshape(q, pt), xi_ref[:].reshape(q, pt), q1, q2, pt,
        precision,
        tuple(w[:] for w in w6_1), tuple(w[:] for w in w6_2),
        twr_ref[:], twi_ref[:],
    )
    or_ref[:] = dr[None]
    oi_ref[:] = di[None]


def _kernel_a_deep(p, qt, radices, precision, xr_ref, xi_ref, *refs):
    """Column stage, multi-stage form: DFT_P as 2-3 sublane stages.

    The dense form above runs 24*P bf16-flops/point — at P >= 256 that is
    compute-bound (the 2-pass memory bound is ~0.06 ns/pt, 24*512 flops is
    ~0.16 ns/pt).  Decomposing DFT_P over the sublane axis with the lanepack
    stage machinery (ops/pallas/lanepack.py _fft_sublane — sublane reshapes
    are Mosaic-legal, so the digit ordering works out to natural k1) cuts
    the flops to 24*(r1+..+rk) at the price of ONE in-VMEM lane transpose
    per block ((P, qt) -> (qt, P), the [k1, j2] -> [j2, k1] relayout the
    dense form gets free from its dot output order).
    """
    from .lanepack import _fft_sublane
    from .fused import CAT_TIERS

    k = len(radices)
    # per stage: one merged cat table, or wA_hi, wA_lo, wB_hi, wB_lo
    # (must mirror lanepack._stage_consts' layout)
    tps = 1 if precision in CAT_TIERS else 4
    w_refs = refs[: tps * k]
    tw_refs = refs[tps * k : tps * k + 2 * (k - 1)]
    twr_ref, twi_ref = refs[-4:-2]  # outer twiddle, (P, Q) [k1, j2] blocks
    or_ref, oi_ref = refs[-2:]

    xr = xr_ref[:].reshape(p, qt)
    xi = xi_ref[:].reshape(p, qt)
    yr, yi = _fft_sublane(xr, xi, p, radices, w_refs, tw_refs, precision, qt)
    twr = twr_ref[:]  # (P, qt) [k1, j2]
    twi = twi_ref[:]
    zr = yr * twr - yi * twi
    zi = yr * twi + yi * twr
    or_ref[:] = jnp.swapaxes(zr, 0, 1)[None]  # (1, qt, P) [j2, k1]
    oi_ref[:] = jnp.swapaxes(zi, 0, 1)[None]


def fftq_sublane(xr, xi, q1, q2, pt, precision, variant, w1_hi, w1_lo,
                 w2_hi, w2_lo, twr, twi):
    """FFT of length Q = q1*q2 over the sublane axis of (Q, pt) pairs.

    Natural-order output [k, lane]; lanes untouched.  Shared by _kernel_b
    and the fused Bluestein convolution kernel (convlarge._kernel_bconv),
    which chains two of these around the pointwise H multiply.
    """
    xr = xr.reshape(q1, q2, pt)  # [ja, jb, k1]
    xi = xi.reshape(q1, q2, pt)

    def wlhs(w_hi, w_lo, x, rhs_dim):
        """Weights-as-lhs contraction: out[k, ...] = sum_j w[k, j] x[..j..].

        Output order = (lhs free = k) + (rhs free dims) — the k axis lands
        leading and the lane axis is untouched, so no relayout is needed.
        """
        dims = (((1,), (rhs_dim,)), ((), ()))
        return contract_wlhs(w_hi, w_lo, x, dims, precision)

    # stage 1: DFT_q1 over ja
    if variant == "wlhs":
        xb = jnp.concatenate([xr, xi], axis=0)  # (2q1, q2, pt)
        a = wlhs(w1_hi, w1_lo, xb, 0)  # (2q1, q2, pt) [ka, jb, k1]
    else:  # "swap": make ja the sublane dim, contract rhs-style, fix order
        s_r = jnp.swapaxes(xr, 0, 1)  # (q2, q1, pt)
        s_i = jnp.swapaxes(xi, 0, 1)
        sb = jnp.concatenate([s_r, s_i], axis=1)  # (q2, 2q1, pt)
        a = _contract(
            sb, w1_hi, w1_lo, (((1,), (1,)), ((), ())), precision
        )  # (q2, pt, 2q1)
        a = jnp.moveaxis(a, -1, 0)  # (2q1, q2, pt) [ka, jb, k1]

    ar = a[:q1]
    ai = a[q1:]

    # inner twiddle w_Q^(ka*jb), tables (q1, q2, 1) broadcast over lanes
    twr = twr.reshape(q1, q2, 1)
    twi = twi.reshape(q1, q2, 1)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr  # (q1, q2, pt) [ka, jb, k1]

    # stage 2: DFT_q2 over jb
    bb = jnp.concatenate([br, bi], axis=1)  # (q1, 2q2, pt)
    if variant == "wlhs":
        d = wlhs(w2_hi, w2_lo, bb, 1)  # (2q2, q1, pt) [kb, ka, k1]
    else:
        d = _contract(
            bb, w2_hi, w2_lo, (((1,), (1,)), ((), ())), precision
        )  # (q1, pt, 2q2)
        d = jnp.moveaxis(d, -1, 0)  # (2q2, q1, pt) [kb, ka, k1]
    dr = d[:q2]
    di = d[q2:]

    # flat index kb*q1 + ka = natural order within Q
    return dr.reshape(q1 * q2, pt), di.reshape(q1 * q2, pt)


def _kernel_b(q1, q2, pt, precision, variant, xr_ref, xi_ref, w1_hi_ref,
              w1_lo_ref, w2_hi_ref, w2_lo_ref, twr_ref, twi_ref,
              or_ref, oi_ref):
    """Row stage: (1, Q, pt) [j2, k1] -> (1, Q, pt) [k2, k1] natural order.

    FFT of length Q = q1*q2 over the sublane axis, lanes untouched.
    """
    q = q1 * q2
    dr, di = fftq_sublane(
        xr_ref[:].reshape(q, pt), xi_ref[:].reshape(q, pt), q1, q2, pt,
        precision, variant, w1_hi_ref[:], w1_lo_ref[:], w2_hi_ref[:],
        w2_lo_ref[:], twr_ref[:], twi_ref[:],
    )
    or_ref[:] = dr[None]
    oi_ref[:] = di[None]


def _kernel_a_2d(p, qt, precision, xr_ref, xi_ref, wp_hi_ref, wp_lo_ref,
                 twr_ref, twi_ref, or_ref, oi_ref):
    """_kernel_a on 2D (p, qt) HBM block descriptions of the same bytes
    (round-2 rule: 2D block specs DMA ~25% faster than equivalent 3D)."""
    xb = jnp.concatenate([xr_ref[:], xi_ref[:]], axis=0)  # (2P, qt)
    a = _contract(
        xb, wp_hi_ref[:], wp_lo_ref[:], (((0,), (1,)), ((), ())), precision
    )  # (qt, 2P) [j2, k1]
    ar = a[:, :p]
    ai = a[:, p:]
    twr = twr_ref[:]  # (qt, P) block of the (Q, P) outer twiddle table
    twi = twi_ref[:]
    or_ref[:] = ar * twr - ai * twi
    oi_ref[:] = ar * twi + ai * twr


def _kernel_b_2d(q1, q2, pt, precision, variant, xr_ref, xi_ref, w1_hi_ref,
                 w1_lo_ref, w2_hi_ref, w2_lo_ref, twr_ref, twi_ref,
                 or_ref, oi_ref):
    """_kernel_b on 2D (Q, pt) HBM block descriptions of the same bytes."""
    dr, di = fftq_sublane(
        xr_ref[:], xi_ref[:], q1, q2, pt,
        precision, variant, w1_hi_ref[:], w1_lo_ref[:], w2_hi_ref[:],
        w2_lo_ref[:], twr_ref[:], twi_ref[:],
    )
    or_ref[:] = dr
    oi_ref[:] = di


def _lane_tile(dim: int, cap: int) -> int:
    """Largest 128-multiple tile <= cap dividing `dim`, else `dim` itself.

    The whole-dim fallback is only reachable for lane-misaligned factors,
    which choose_pqq rejects for the TPU path (whole-dim lane blocks FAILED
    the Mosaic compile at n = 3^11); make_large_fft_fn asserts 128-multiple
    tiles off-interpret, so the fallback only serves interpret-mode tests."""
    t = min(cap, dim)
    while t >= 128:
        if dim % t == 0 and t % 128 == 0:
            return t
        t //= 2
    return dim


def max_lane_tile(q: int) -> Optional[int]:
    """Kernel-B lane tile: 128 if the (Q, 128) working set (~8 live f32
    copies) fits the VMEM budget, else None.

    Mosaic requires block minor dims to be (8, 128)-aligned unless equal to
    the array dims — measured on v5e, a pt = 64 kernel-B block fails to
    lower ("last two dimensions of your block..."), and Q = 16384 at
    pt = 128 fails the compile even under a 112MB request, so neither
    thinner tiles nor a bigger budget extend the range: Q beyond the
    default budget means no large pipeline (the size falls back to the
    XLA six-step path).
    """
    budget = int(config.pallas_vmem_limit * 0.85)
    if 8 * q * 128 * 4 <= budget:
        return 128
    return None


def choose_pqq(n: int) -> Optional[Tuple[int, int, int]]:
    """Pick n = P * (q1*q2) minimizing MXU work with VMEM-feasible tiles."""
    best = None
    for p in range(8, 513):
        if n % p:
            continue
        rest = n // p
        if rest < 4:
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
        # kernel-B feasibility: the (Q, 128) working set must fit VMEM
        q = q1 * q2
        if max_lane_tile(q) is None:
            continue
        # both lane-tiled axes need 128-multiple tiles: whole-dim blocks
        # for odd factors (the _lane_tile fallback) FAIL the Mosaic compile
        # on v5e (verified at n = 3^11, split (243, 27, 27)) — such sizes
        # take the XLA six-step path instead
        if p % 128 or q % 128:
            continue
        # measured on v5e (2^20 sweep): the largest P up to 256 wins (smaller
        # kernel-B tiles dominate; beyond 256 kernel A goes compute-bound),
        # with balanced q1 == q2 preferred within that
        key = (
            0 if p <= 256 else 1,
            -p if p <= 256 else p,
            q1 + q2,
            abs(q1 - q2),
        )
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
    qt: int = 512,
    pt: int = 128,
    variant: str = "swap",
    deep_a: Optional[bool] = None,
    gauss: Optional[bool] = None,
    blocks2d: Optional[bool] = None,
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n), the two-kernel pipeline.

    deep_a: use the multi-stage kernel A (_kernel_a_deep) instead of the
    dense 24*P-flop contraction; None resolves to False (measured slower
    on v5e — see the in-code note) — the option exists for the perf
    harness and future hardware.
    """
    assert np.dtype(dtype) == np.complex64, "large kernel is c64/f32 only"
    pqq = split or choose_pqq(n)
    assert pqq is not None, f"no large split for n={n}"
    p, q1, q2 = pqq
    q = q1 * q2
    assert p * q == n
    precision = resolve_precision(precision, interpret)
    rdt = np.float32

    # Lane-tile rule (Mosaic): a block's lane dim must be a multiple of 128
    # OR equal to the array dim.  For odd factors (e.g. q = 3^6) no pow2
    # tile divides, so fall back to the whole dimension as one tile — the
    # equal-to-array-dim exception keeps it legal (choose_pqq checked the
    # whole-dim working set fits VMEM for such splits).
    qt = _lane_tile(q, qt)
    lane_cap = max_lane_tile(q)
    assert lane_cap is not None, f"kernel-B tile for Q={q} exceeds VMEM"
    pt = _lane_tile(p, min(pt, lane_cap))
    if not interpret:
        # Mosaic rejects lane blocks that are neither 128-multiples nor ==
        # the array dim, and whole-dim blocks for misaligned factors failed
        # the compile outright (verified at n = 3^11) — reject up front
        # rather than surfacing a Mosaic error from a harness-passed split.
        assert qt % 128 == 0 and pt % 128 == 0, (
            f"large pipeline needs 128-multiple lane tiles on TPU; "
            f"got qt={qt}, pt={pt} for split {pqq}"
        )

    from . import lanepack

    if deep_a is None:
        # measured on v5e: deep LOSES decisively (2^20: 459 vs 858 GF/s
        # dense) — the per-block (P, qt) lane transpose costs far more than
        # the 24*P -> 24*(r1+r2) MXU flop cut saves.  Lane transposes are
        # the dominant in-VMEM cost at these shapes (same story as the
        # lanepack stack experiment); keep the dense dot, whose output
        # order provides the [j2, k1] relayout for free.
        deep_a = False
    if deep_a:
        a_radices = lanepack.choose_radices(p)
        assert a_radices is not None, f"no sublane radices for deep_a P={p}"
        a_radices = tuple(a_radices)
    else:
        a_radices = ()

    # kernel A constants
    wp = calg.block_mid(twiddles.dft_matrix(p, direction), rdt)  # (2P, 2P)
    # outer twiddle table: dense form consumes (Q, P) = [j2, k1] blocks,
    # the deep form consumes (P, Q) = [k1, j2] blocks
    tw_outer = twiddles.twiddle_table(p, q, direction)  # (P, Q) [k1, j2]
    if not deep_a:
        tw_outer = tw_outer.T
    twr_o = np.ascontiguousarray(tw_outer.real).astype(rdt)
    twi_o = np.ascontiguousarray(tw_outer.imag).astype(rdt)

    # kernel B constants
    w1 = calg.block_mid(twiddles.dft_matrix(q1, direction), rdt)
    w2 = calg.block_mid(twiddles.dft_matrix(q2, direction), rdt)
    tw_inner = twiddles.twiddle_table(q1, q2, direction)  # (q1, q2) [ka, jb]
    twr_i = np.ascontiguousarray(tw_inner.real).astype(rdt)
    twi_i = np.ascontiguousarray(tw_inner.imag).astype(rdt)

    wp_hi, wp_lo = w_split(wp, precision)
    w1_hi, w1_lo = w_split(w1, precision)
    w2_hi, w2_lo = w_split(w2, precision)

    if gauss is None:
        gauss = config.large_gauss
    if blocks2d is None:
        blocks2d = config.large_blocks2d
    if blocks2d:
        assert not deep_a and not gauss, "blocks2d: default kernels only"

    if deep_a:
        kernel_a = functools.partial(_kernel_a_deep, p, qt, a_radices, precision)
        a_consts = lanepack._stage_consts(p, a_radices, direction, precision)
    elif gauss:
        kernel_a = functools.partial(_kernel_a_gauss, p, qt, precision)
        a_consts = gauss_tables(twiddles.dft_matrix(p, direction), precision)
    else:
        kernel_a = functools.partial(_kernel_a, p, qt, precision)
        a_consts = [wp_hi, wp_lo]
    if gauss:
        kernel_b = functools.partial(_kernel_b_gauss, q1, q2, pt, precision)
        b_consts = gauss_tables(
            twiddles.dft_matrix(q1, direction), precision
        ) + gauss_tables(twiddles.dft_matrix(q2, direction), precision)
    else:
        kernel_b = functools.partial(_kernel_b, q1, q2, pt, precision, variant)
        b_consts = [w1_hi, w1_lo, w2_hi, w2_lo]
    cparams = pltpu.CompilerParams(vmem_limit_bytes=config.pallas_vmem_limit)
    # the deep kernel A is temp-heavy (sublane stages + transpose)
    cparams_a = pltpu.CompilerParams(
        vmem_limit_bytes=max(config.pallas_vmem_limit, 112 * 2**20)
        if deep_a
        else config.pallas_vmem_limit
    )

    def const_spec(w, ndim=2):
        return pl.BlockSpec(w.shape, i32map(lambda *_: (0,) * ndim), memory_space=pltpu.VMEM)

    def call_2d(xr, xi):
        """Same pipeline with every I/O array described 2D: (B*P, Q) in,
        (B*Q, P) between and out.  Identical bytes and grids; only the
        HBM block descriptions change (the round-2 measured rule: 2D
        block specs DMA ~25% faster than equivalent 3D blocks)."""
        batch = xr.shape[0]
        tw_spec = pl.BlockSpec((qt, p), i32map(lambda qi, b: (qi, 0)), memory_space=pltpu.VMEM)
        a_in = pl.BlockSpec((p, qt), i32map(lambda qi, b: (b, qi)), memory_space=pltpu.VMEM)
        nq = q // qt
        a_out = pl.BlockSpec(
            (qt, p), i32map(lambda qi, b: (b * nq + qi, 0)), memory_space=pltpu.VMEM
        )
        a_r, a_i = pl.pallas_call(
            functools.partial(_kernel_a_2d, p, qt, precision),
            grid=(nq, batch),  # batch fastest: twiddle block stays put
            in_specs=[a_in, a_in]
            + [const_spec(w) for w in a_consts]
            + [tw_spec, tw_spec],
            out_specs=[a_out, a_out],
            out_shape=[
                jax.ShapeDtypeStruct((batch * q, p), jnp.float32),
                jax.ShapeDtypeStruct((batch * q, p), jnp.float32),
            ],
            compiler_params=cparams_a,
            interpret=interpret,
        )(
            xr.reshape(batch * p, q),
            xi.reshape(batch * p, q),
            *[jnp.asarray(w) for w in a_consts],
            jnp.asarray(twr_o),
            jnp.asarray(twi_o),
        )

        b_spec = pl.BlockSpec((q, pt), i32map(lambda pi, b: (b, pi)), memory_space=pltpu.VMEM)
        out_r, out_i = pl.pallas_call(
            functools.partial(_kernel_b_2d, q1, q2, pt, precision, variant),
            grid=(p // pt, batch),
            in_specs=[b_spec, b_spec]
            + [const_spec(w) for w in b_consts]
            + [const_spec(twr_i), const_spec(twi_i)],
            out_specs=[b_spec, b_spec],
            out_shape=[
                jax.ShapeDtypeStruct((batch * q, p), jnp.float32),
                jax.ShapeDtypeStruct((batch * q, p), jnp.float32),
            ],
            compiler_params=cparams,
            interpret=interpret,
        )(
            a_r,
            a_i,
            *[jnp.asarray(w) for w in b_consts],
            jnp.asarray(twr_i),
            jnp.asarray(twi_i),
        )
        return out_r.reshape(batch, n), out_i.reshape(batch, n)

    def call(xr, xi):
        if blocks2d:
            return call_2d(xr, xi)
        batch = xr.shape[0]

        # ---- kernel A: (B, P, Q) -> (B, Q, P), twiddled ----
        if deep_a:
            # deep form consumes the outer twiddle as (P, Q) [k1, j2] blocks
            tw_spec = pl.BlockSpec((p, qt), i32map(lambda qi, b: (0, qi)), memory_space=pltpu.VMEM)
        else:
            tw_spec = pl.BlockSpec((qt, p), i32map(lambda qi, b: (qi, 0)), memory_space=pltpu.VMEM)
        a_r, a_i = pl.pallas_call(
            kernel_a,
            grid=(q // qt, batch),  # batch fastest: twiddle block stays put
            in_specs=[
                pl.BlockSpec((1, p, qt), i32map(lambda qi, b: (b, 0, qi)), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p, qt), i32map(lambda qi, b: (b, 0, qi)), memory_space=pltpu.VMEM),
            ]
            + [const_spec(w) for w in a_consts]
            + [tw_spec, tw_spec],
            out_specs=[
                pl.BlockSpec((1, qt, p), i32map(lambda qi, b: (b, qi, 0)), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qt, p), i32map(lambda qi, b: (b, qi, 0)), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((batch, q, p), jnp.float32),
                jax.ShapeDtypeStruct((batch, q, p), jnp.float32),
            ],
            compiler_params=cparams_a,
            interpret=interpret,
        )(
            xr.reshape(batch, p, q),
            xi.reshape(batch, p, q),
            *[jnp.asarray(w) for w in a_consts],
            jnp.asarray(twr_o),
            jnp.asarray(twi_o),
        )

        # ---- kernel B: FFT_Q over sublanes of (B, Q, P) ----
        out_r, out_i = pl.pallas_call(
            kernel_b,
            grid=(p // pt, batch),
            in_specs=[
                pl.BlockSpec((1, q, pt), i32map(lambda pi, b: (b, 0, pi)), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q, pt), i32map(lambda pi, b: (b, 0, pi)), memory_space=pltpu.VMEM),
            ]
            + [const_spec(w) for w in b_consts]
            + [const_spec(twr_i), const_spec(twi_i)],
            out_specs=[
                pl.BlockSpec((1, q, pt), i32map(lambda pi, b: (b, 0, pi)), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q, pt), i32map(lambda pi, b: (b, 0, pi)), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((batch, q, p), jnp.float32),
                jax.ShapeDtypeStruct((batch, q, p), jnp.float32),
            ],
            compiler_params=cparams,
            interpret=interpret,
        )(
            a_r,
            a_i,
            *[jnp.asarray(w) for w in b_consts],
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
