"""Very-large-N FFT as TWO Pallas kernels: 4 HBM traversals for n >= 2^22.

The three-kernel pipeline (ops/pallas/large3.py) runs 6 signal traversals;
at 2^23 it measures ~57% of its own 6-traversal memory bound, so the
remaining lever on the big-pow2 band is structural: fewer passes.  The
two-kernel pipeline (ops/pallas/large.py) is 4 traversals but its kernel B
degrades past Q = 4096 and kernel A's lane split caps at P = 512, so n =
2^22 was its measured ceiling (678 GF/s vs large3's 813).  This module
keeps BOTH fast structures — kernel A's dense MXU column stage and the
Q = 4096 two-stage kernel B — by fusing large3's pass 2 (the P2-point VPU
chain) INTO the column stage instead of running it as its own HBM pass:

    n = P1 * P2 * Q,   j = j1*(P2*Q) + j2*Q + j3,
    X[((k3*P2 + k2)*P1) + k1]  — ascending frequency (same digit plan as
    large3, so pass 3 is reused verbatim).

  kernel A12 ("fused column stage"): x viewed (B, P1, P2, Q); per
      (Q-tile, batch) grid step the block is (1, P1, P2, qt3) [j1, j2, j3]:
        1. sublane-side swapaxes -> (P2, P1, qt3) (the proven _kernel_q
           relayout; lanes untouched),
        2. dense DFT_P1 as ONE 3D sublane contraction (MXU, K = 2*P1) ->
           (P2, qt3, 2*P1) [j2, j3, k1],
        3. outer twiddle w_n^(k1*(j2*Q+j3)) applied FACTORIZED:
           w_n^(k1*j2*Q) = w_{P1*P2}^(k1*j2) is a tiny (P2, P1) VMEM
           constant, and w_n^(k1*j3) is a (Q, P1) table streamed one
           (qt3, P1) block per Q-tile — so NO (M, P1) table exists at all.
           large3 streams that n-element table; at 2^25 it is a ~134MB
           closure literal the remote compile helper rejects (HTTP 413),
           which is what capped large3 at P2 <= 16 / n <= 2^24.  (An
           in-kernel sin/cos variant — phase_trig — was measured first:
           pass 1 alone ran 20.4ms vs kernel Q's 15.2 at equal traffic;
           Mosaic transcendentals are the tax.  Tables keep the kernel
           pure mul/add.),
        4. P2-point FFT over j2 as a radix-2 VPU chain on the list of
           (qt3, P1) slices (fused._vpu_fft_list — leading-axis butterflies
           are pure elementwise VPU work),
        5. mid twiddle w_M^(k2*j3) from a (Q, P2) table, streamed
           (qt3, P2) per Q-tile; column k2 lane-broadcasts over P1,
      output (1, P2, qt3, P1) [k2, j3, k1] into the (B, P2, Q, P1) array
      pass 3 consumes.
  kernel Q (pass 3, reused from large3): per (k2, P1-tile, batch) block
      FFT_Q over j3 with the two-stage q1 x q2 scheme; the k2 digit rides
      the output BlockSpec's lane offset so the result lands in natural
      order (B, Q, P2*P1) with no extra HBM pass.

Total HBM traffic: 4 signal traversals (vs 6 for large3, ~12 for the XLA
six-step) plus (Q*(P1+P2))*8 bytes of twiddle tables read once per call
(< 1% of signal traffic).  MXU work 24*(P1 + q1 + q2) bf16-flops/point
at bf16x3 plus a ~10*log2(P2) + 12 flops/point VPU tax (j2 chain + the
two table twiddle multiplies).

Twiddle accuracy: both factors are host-f64 tables cast to f32; their
product carries one extra f32 rounding (~1e-7 rel) vs large3's single
(M, P1) table — orders below the pipeline's measured ~7.5e-6 worst rel
err (ACCURACY_TPU.md) and the reference's 0.1 tolerance
(accuracy.rs:30-37).

Reference lineage: this is the MixedRadix/six-step decomposition
(/root/reference/src/algorithm/mixed_radix.rs:128-158) specialized to a
three-digit plan with the middle digit's FFT fused into the first pass —
a TPU-bandwidth design with no reference counterpart.
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
from . import large as _large
from . import large3 as _large3
from .fused import (_vpu_fft_list, contract_rhs as _contract,
                    resolve_precision, w_split)
from .util import i32map


def outer_table(q: int, p1: int, n: int, direction: FftDirection) -> np.ndarray:
    """(Q, P1) table t[j3, k1] = w_n^(j3*k1) in f64 (exponent < Q*P1 <= n)."""
    sign = -1.0 if direction == FftDirection.FORWARD else 1.0
    e = np.arange(q, dtype=np.int64)[:, None] * np.arange(p1, dtype=np.int64)
    return np.exp(sign * 2j * np.pi * e / n)


def choose_split2f(n: int) -> Optional[Tuple[int, int, int, int, int]]:
    """Pick n = P1 * P2 * (q1*q2) for the fused two-kernel pipeline.

    Constraints (measured on v5e unless noted):
      P1 in {128, 256} (kernel-A lane-split rules, large.py);
      P2 a power of two in [8, 64] — the radix-2 VPU chain needs a pow2,
      the in-kernel swapaxes needs P2 on whole sublane tiles (>= 8), and
      64 bounds the per-block working set at 2^26;
      Q = q1*q2 with q1, q2 <= 256: 4096 is the measured kernel-B sweet
      spot (Q = 8192 degrades, large.py), 2048 admitted as fallback.
    Preference: largest Q, then smallest P1 (kernel A costs 24*P1
    bf16-flops/point; P1=128 measured +3% over 256 at 2^23 in large3).
    """
    best = None
    for p1 in (256, 128):
        if n % p1:
            continue
        m = n // p1
        for q in (4096, 2048):
            if m % q:
                continue
            p2 = m // q
            if p2 < 8 or p2 > 64 or (p2 & (p2 - 1)):
                continue
            inner = None
            for q1 in range(2, 257):
                if q % q1:
                    continue
                q2 = q // q1
                if q2 > 256:
                    continue
                key = (q1 + q2, abs(q1 - q2))
                if inner is None or key < inner[0]:
                    inner = (key, q1, q2)
            if inner is None:
                continue
            _, q1, q2 = inner
            key = (-q, p1)
            if best is None or key < best[0]:
                best = (key, p1, p2, q1, q2)
    if best is None:
        return None
    _, p1, p2, q1, q2 = best
    return p1, p2, q1, q2, q1 * q2


def large2f_supported(n: int, dtype) -> bool:
    if np.dtype(dtype) != np.complex64:
        return False
    # measured envelope cap: 2^26's only split is (P1=256, P2=64), whose
    # pass-1 block exhausts VMEM even at a 128MB scoped limit; 2^25
    # (P1=128, P2=64) compiles with the cparams1 headroom and runs 882 GF/s
    if n > 1 << 25:
        return False
    return choose_split2f(n) is not None


def _kernel_a12(p1, p2, qt3, direction, precision, xr_ref, xi_ref,
                wp_hi_ref, wp_lo_ref, wos_r_ref, wos_i_ref,
                wob_r_ref, wob_i_ref, wm_r_ref, wm_i_ref, or_ref, oi_ref):
    """Fused column stage: (1, P1, P2, qt3) [j1, j2, j3] ->
    (1, P2, qt3, P1) [k2, j3, k1], outer+mid twiddled, j2 FFT'd."""
    xr = xr_ref[:].reshape(p1, p2, qt3)
    xi = xi_ref[:].reshape(p1, p2, qt3)
    # sublane-side relayout so the contraction hits the sublane axis of a
    # 3D view (the measured Mosaic rule — leading-axis contractions insert
    # per-tile transposes and run ~13x slower)
    xr = jnp.swapaxes(xr, 0, 1)  # (P2, P1, qt3)
    xi = jnp.swapaxes(xi, 0, 1)
    xb = jnp.concatenate([xr, xi], axis=1)  # (P2, 2*P1, qt3)
    a = _contract(
        xb, wp_hi_ref[:], wp_lo_ref[:], (((1,), (1,)), ((), ())), precision
    )  # (P2, qt3, 2*P1) [j2, j3, k1]

    # outer twiddle w_n^(k1*(j2*Q + j3)) = w_{P1P2}^(k1*j2) * w_n^(k1*j3):
    # tiny (P2, P1) constant row x streamed (qt3, P1) block
    wob_r = wob_r_ref[:]
    wob_i = wob_i_ref[:]
    wos_r = wos_r_ref[:]
    wos_i = wos_i_ref[:]
    vr_l, vi_l = [], []
    for j2 in range(p2):
        sr = wos_r[j2 : j2 + 1, :]  # (1, P1)
        si = wos_i[j2 : j2 + 1, :]
        twr = sr * wob_r - si * wob_i  # (qt3, P1)
        twi = sr * wob_i + si * wob_r
        ar = a[j2, :, :p1]
        ai = a[j2, :, p1:]
        vr_l.append(ar * twr - ai * twi)
        vi_l.append(ar * twi + ai * twr)

    # P2-point FFT over j2: radix-2 VPU chain on the slice list
    br_l, bi_l = _vpu_fft_list(vr_l, vi_l, direction)

    # mid twiddle w_M^(k2*j3): column k2 of the streamed (qt3, P2) block,
    # lane-broadcast over P1
    wm_r = wm_r_ref[:]
    wm_i = wm_i_ref[:]
    out_r, out_i = [], []
    for k2 in range(p2):
        twr = wm_r[:, k2 : k2 + 1]  # (qt3, 1)
        twi = wm_i[:, k2 : k2 + 1]
        out_r.append(br_l[k2] * twr - bi_l[k2] * twi)
        out_i.append(br_l[k2] * twi + bi_l[k2] * twr)
    or_ref[:] = jnp.stack(out_r, axis=0)[None]  # (1, P2, qt3, P1)
    oi_ref[:] = jnp.stack(out_i, axis=0)[None]


def _kernel_a12_2d(p1, p2, qt3, direction, precision, xr_ref, xi_ref,
                   wp_hi_ref, wp_lo_ref, wos_r_ref, wos_i_ref,
                   wob_r_ref, wob_i_ref, wm_r_ref, wm_i_ref,
                   or_ref, oi_ref):
    """_kernel_a12 on reduced-rank HBM block descriptions: input 2D
    (p1*p2, qt3) blocks of the (B*P1*P2, Q) view, output 3D (p2, qt3, p1)
    blocks of the (B*P2, Q, P1) view (round-5: lower-rank block specs DMA
    faster — the flat-view rule applied to the large2f tier)."""
    # sublane-dim split (lane dim untouched) is legal in VMEM
    xr = jnp.swapaxes(xr_ref[:].reshape(p1, p2, qt3), 0, 1)  # (P2, P1, qt3)
    xi = jnp.swapaxes(xi_ref[:].reshape(p1, p2, qt3), 0, 1)
    xb = jnp.concatenate([xr, xi], axis=1)  # (P2, 2*P1, qt3)
    a = _contract(
        xb, wp_hi_ref[:], wp_lo_ref[:], (((1,), (1,)), ((), ())), precision
    )  # (P2, qt3, 2*P1) [j2, j3, k1]

    wob_r = wob_r_ref[:]
    wob_i = wob_i_ref[:]
    wos_r = wos_r_ref[:]
    wos_i = wos_i_ref[:]
    vr_l, vi_l = [], []
    for j2 in range(p2):
        sr = wos_r[j2 : j2 + 1, :]  # (1, P1)
        si = wos_i[j2 : j2 + 1, :]
        twr = sr * wob_r - si * wob_i  # (qt3, P1)
        twi = sr * wob_i + si * wob_r
        ar = a[j2, :, :p1]
        ai = a[j2, :, p1:]
        vr_l.append(ar * twr - ai * twi)
        vi_l.append(ar * twi + ai * twr)

    br_l, bi_l = _vpu_fft_list(vr_l, vi_l, direction)

    wm_r = wm_r_ref[:]
    wm_i = wm_i_ref[:]
    out_r, out_i = [], []
    for k2 in range(p2):
        twr = wm_r[:, k2 : k2 + 1]  # (qt3, 1)
        twi = wm_i[:, k2 : k2 + 1]
        out_r.append(br_l[k2] * twr - bi_l[k2] * twi)
        out_i.append(br_l[k2] * twi + bi_l[k2] * twr)
    or_ref[:] = jnp.stack(out_r, axis=0)  # (P2, qt3, P1)
    oi_ref[:] = jnp.stack(out_i, axis=0)


def _kernel_q_2d(q1, q2, pt, precision, xr_ref, xi_ref, w1_hi_ref,
                 w1_lo_ref, w2_hi_ref, w2_lo_ref, twr_ref, twi_ref,
                 or_ref, oi_ref):
    """large3._kernel_q on reduced-rank blocks: 3D (1, Q, pt) input of the
    (B*P2, Q, P1) view, 2D (Q, pt) output of the (B*Q, P2*P1) view (the
    k2 digit still rides the out-spec lane offset)."""
    q = q1 * q2
    dr, di = _large.fftq_sublane(
        xr_ref[:].reshape(q, pt), xi_ref[:].reshape(q, pt), q1, q2, pt,
        precision, "swap", w1_hi_ref[:], w1_lo_ref[:], w2_hi_ref[:],
        w2_lo_ref[:], twr_ref[:], twi_ref[:],
    )
    or_ref[:] = dr
    oi_ref[:] = di


def _pick_qt3(p1: int, p2: int, q: int) -> int:
    """Q-tile for the fused column stage: largest divisor of Q whose
    ~10-live-copy (P1, P2, qt3) f32-pair working set fits the VMEM budget."""
    budget = int(max(config.pallas_vmem_limit, 64 * 2**20) * 0.8)
    qt3 = q
    while qt3 > 128 and 10 * 2 * 4 * p1 * p2 * qt3 > budget:
        qt3 //= 2
    return qt3


def make_large2f_fft_fn(
    n: int,
    direction: FftDirection,
    dtype,
    split: Optional[Tuple[int, int, int, int, int]] = None,
    interpret: bool = False,
    precision=None,
    pt: int = 128,
    qt3: Optional[int] = None,
    blocks2d: Optional[bool] = None,
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n), the fused 2-kernel
    pipeline.  split = (P1, P2, q1, q2, Q); qt3 tiles pass 1's j3 axis,
    pt tiles the P1 lane axis in pass 3."""
    assert np.dtype(dtype) == np.complex64, "large2f kernel is c64/f32 only"
    sp = split or choose_split2f(n)
    assert sp is not None, f"no fused 2-kernel split for n={n}"
    p1, p2, q1, q2, q = sp
    assert q1 * q2 == q and p1 * p2 * q == n, sp
    precision = resolve_precision(precision, interpret)
    rdt = np.float32

    pt = min(pt, p1)
    if qt3 is None:
        qt3 = _pick_qt3(p1, p2, q)
    if not interpret:
        assert p1 % pt == 0 and pt % 128 == 0 and qt3 % 128 == 0, (sp, qt3, pt)
    assert q % qt3 == 0, (q, qt3)

    # pass 1 constants: dense block DFT_P1 + the three factorized twiddle
    # tables (all tiny: Q*(P1+P2) + P2*P1 entries total, vs large3's n)
    wp = calg.block_mid(twiddles.dft_matrix(p1, direction), rdt)
    wp_hi, wp_lo = w_split(wp, precision)
    wos = twiddles.twiddle_table(p2, p1, direction)  # (P2, P1) [j2, k1]
    wos_r = np.ascontiguousarray(wos.real).astype(rdt)
    wos_i = np.ascontiguousarray(wos.imag).astype(rdt)
    wob = outer_table(q, p1, n, direction)  # (Q, P1) [j3, k1]
    wob_r = np.ascontiguousarray(wob.real).astype(rdt)
    wob_i = np.ascontiguousarray(wob.imag).astype(rdt)
    wm = twiddles.twiddle_table(q, p2, direction)  # (Q, P2) [j3, k2]
    wm_r = np.ascontiguousarray(wm.real).astype(rdt)
    wm_i = np.ascontiguousarray(wm.imag).astype(rdt)

    # pass 3 constants: block DFT_q1/q2 + inner twiddle (q1, q2) [ka, jb]
    w1 = calg.block_mid(twiddles.dft_matrix(q1, direction), rdt)
    w2 = calg.block_mid(twiddles.dft_matrix(q2, direction), rdt)
    w1_hi, w1_lo = w_split(w1, precision)
    w2_hi, w2_lo = w_split(w2, precision)
    tw_inner = twiddles.twiddle_table(q1, q2, direction)
    twr_i = np.ascontiguousarray(tw_inner.real).astype(rdt)
    twi_i = np.ascontiguousarray(tw_inner.imag).astype(rdt)

    if blocks2d is None:
        blocks2d = config.large_blocks2d
    kernel_a12 = functools.partial(
        _kernel_a12, p1, p2, qt3, direction, precision
    )
    kernel_q = functools.partial(_large3._kernel_q, q1, q2, pt, precision)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=config.pallas_vmem_limit)
    # P2 = 64 at 2^25+ measured 65.45M of scoped VMEM at the qt3 = 128
    # floor — 1.45M over the 64M default; v5e has 128M, so give pass 1
    # headroom instead of shrinking the block
    cparams1 = pltpu.CompilerParams(
        vmem_limit_bytes=max(config.pallas_vmem_limit, 100 * 2**20)
        if p2 >= 64
        else config.pallas_vmem_limit
    )

    def cspec(w, ndim=2):
        return pl.BlockSpec(
            w.shape, i32map(lambda *_: (0,) * ndim), memory_space=pltpu.VMEM
        )

    def call_2d(xr, xi):
        """Reduced-rank twin of call(): pass-1 input 2D (B*P1*P2, Q),
        intermediate 3D (B*P2, Q, P1), output 2D (B*Q, P2*P1).  Same
        bytes, grids, and math; only HBM block ranks change."""
        batch = xr.shape[0]

        in_spec1 = pl.BlockSpec(
            (p1 * p2, qt3), i32map(lambda qi, b: (b, qi)),
            memory_space=pltpu.VMEM,
        )
        out_spec1 = pl.BlockSpec(
            (p2, qt3, p1), i32map(lambda qi, b: (b, qi, 0)),
            memory_space=pltpu.VMEM,
        )
        wob_spec = pl.BlockSpec(
            (qt3, p1), i32map(lambda qi, b: (qi, 0)), memory_space=pltpu.VMEM
        )
        wm_spec = pl.BlockSpec(
            (qt3, p2), i32map(lambda qi, b: (qi, 0)), memory_space=pltpu.VMEM
        )
        b_r, b_i = pl.pallas_call(
            functools.partial(_kernel_a12_2d, p1, p2, qt3, direction, precision),
            grid=(q // qt3, batch),  # batch fastest: DFT table stays put
            in_specs=[
                in_spec1, in_spec1, cspec(wp_hi), cspec(wp_lo),
                cspec(wos_r), cspec(wos_i),
                wob_spec, wob_spec, wm_spec, wm_spec,
            ],
            out_specs=[out_spec1, out_spec1],
            out_shape=[
                jax.ShapeDtypeStruct((batch * p2, q, p1), jnp.float32)
            ] * 2,
            compiler_params=cparams1,
            interpret=interpret,
        )(
            xr.reshape(batch * p1 * p2, q),
            xi.reshape(batch * p1 * p2, q),
            jnp.asarray(wp_hi), jnp.asarray(wp_lo),
            jnp.asarray(wos_r), jnp.asarray(wos_i),
            jnp.asarray(wob_r), jnp.asarray(wob_i),
            jnp.asarray(wm_r), jnp.asarray(wm_i),
        )

        in_spec3 = pl.BlockSpec(
            (1, q, pt),
            i32map(lambda c2, pi, b: (b * p2 + c2, 0, pi)),
            memory_space=pltpu.VMEM,
        )
        lanes_per_k2 = p1 // pt
        out_spec3 = pl.BlockSpec(
            (q, pt),
            i32map(lambda c2, pi, b: (b, c2 * lanes_per_k2 + pi)),
            memory_space=pltpu.VMEM,
        )
        out_r, out_i = pl.pallas_call(
            functools.partial(_kernel_q_2d, q1, q2, pt, precision),
            grid=(p2, p1 // pt, batch),
            in_specs=[
                in_spec3, in_spec3,
                cspec(w1_hi), cspec(w1_lo), cspec(w2_hi), cspec(w2_lo),
                cspec(twr_i), cspec(twi_i),
            ],
            out_specs=[out_spec3, out_spec3],
            out_shape=[
                jax.ShapeDtypeStruct((batch * q, p2 * p1), jnp.float32)
            ] * 2,
            compiler_params=cparams,
            interpret=interpret,
        )(
            b_r, b_i,
            jnp.asarray(w1_hi), jnp.asarray(w1_lo),
            jnp.asarray(w2_hi), jnp.asarray(w2_lo),
            jnp.asarray(twr_i), jnp.asarray(twi_i),
        )
        return out_r.reshape(batch, n), out_i.reshape(batch, n)

    def call(xr, xi):
        if blocks2d:
            return call_2d(xr, xi)
        batch = xr.shape[0]

        # ---- pass 1 (fused): (B, P1, P2, Q) -> (B, P2, Q, P1) ----
        in_spec1 = pl.BlockSpec(
            (1, p1, p2, qt3),
            i32map(lambda qi, b: (b, 0, 0, qi)),
            memory_space=pltpu.VMEM,
        )
        out_spec1 = pl.BlockSpec(
            (1, p2, qt3, p1),
            i32map(lambda qi, b: (b, 0, qi, 0)),
            memory_space=pltpu.VMEM,
        )
        # streamed twiddle blocks: keyed by the Q-tile only, so with batch
        # as the fast grid axis each block is fetched once per call
        wob_spec = pl.BlockSpec(
            (qt3, p1), i32map(lambda qi, b: (qi, 0)), memory_space=pltpu.VMEM
        )
        wm_spec = pl.BlockSpec(
            (qt3, p2), i32map(lambda qi, b: (qi, 0)), memory_space=pltpu.VMEM
        )
        b_r, b_i = pl.pallas_call(
            kernel_a12,
            grid=(q // qt3, batch),  # batch fastest: DFT table stays put
            in_specs=[
                in_spec1, in_spec1, cspec(wp_hi), cspec(wp_lo),
                cspec(wos_r), cspec(wos_i),
                wob_spec, wob_spec, wm_spec, wm_spec,
            ],
            out_specs=[out_spec1, out_spec1],
            out_shape=[
                jax.ShapeDtypeStruct((batch, p2, q, p1), jnp.float32)
            ] * 2,
            compiler_params=cparams1,
            interpret=interpret,
        )(
            xr.reshape(batch, p1, p2, q),
            xi.reshape(batch, p1, p2, q),
            jnp.asarray(wp_hi), jnp.asarray(wp_lo),
            jnp.asarray(wos_r), jnp.asarray(wos_i),
            jnp.asarray(wob_r), jnp.asarray(wob_i),
            jnp.asarray(wm_r), jnp.asarray(wm_i),
        )

        # ---- pass 3 (reused from large3): FFT_Q over j3, k2 rides the
        # output block's lane offset into natural order (B, Q, P2*P1) ----
        in_spec3 = pl.BlockSpec(
            (1, 1, q, pt),
            i32map(lambda c2, pi, b: (b, c2, 0, pi)),
            memory_space=pltpu.VMEM,
        )
        lanes_per_k2 = p1 // pt
        out_spec3 = pl.BlockSpec(
            (1, q, pt),
            i32map(lambda c2, pi, b: (b, 0, c2 * lanes_per_k2 + pi)),
            memory_space=pltpu.VMEM,
        )
        out_r, out_i = pl.pallas_call(
            kernel_q,
            grid=(p2, p1 // pt, batch),
            in_specs=[
                in_spec3, in_spec3,
                cspec(w1_hi), cspec(w1_lo), cspec(w2_hi), cspec(w2_lo),
                cspec(twr_i), cspec(twi_i),
            ],
            out_specs=[out_spec3, out_spec3],
            out_shape=[
                jax.ShapeDtypeStruct((batch, q, p2 * p1), jnp.float32)
            ] * 2,
            compiler_params=cparams,
            interpret=interpret,
        )(
            b_r, b_i,
            jnp.asarray(w1_hi), jnp.asarray(w1_lo),
            jnp.asarray(w2_hi), jnp.asarray(w2_lo),
            jnp.asarray(twr_i), jnp.asarray(twi_i),
        )
        return out_r.reshape(batch, n), out_i.reshape(batch, n)

    def apply(x):
        xr, xi = x
        shape = xr.shape
        out_r, out_i = call(xr.reshape(-1, n), xi.reshape(-1, n))
        return out_r.reshape(shape), out_i.reshape(shape)

    return apply
