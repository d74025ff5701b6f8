"""Very-large-N FFT as three Pallas kernels: 3 HBM passes for n > 2^22.

The two-kernel pipeline (ops/pallas/large.py) is hard-capped at
n = 512 * 8192 = 2^22 by kernel B's (Q, 128) VMEM working set and the
Mosaic compile ceiling on bigger kernel-A lane splits ((512,128,128)@2^23
fails).  This module adds one more split level so the reference's full
bench envelope (pow2 to 16,777,216, benches/bench_rustfft.rs:43-105) runs
at pipeline speeds instead of falling back to the ~6-pass XLA six-step:

    n = P1 * P2 * Q,   j = j1*(P2*Q) + j2*Q + j3,
    X[((k3*P2 + k2)*P1) + k1]  — ascending frequency.

  pass 1 (kernel A, reused from large.py): x (B, P1, M) [j1, jrest]
      dense DFT_P1 sublane contraction (MXU) + outer twiddle
      w_n^(k1*jrest) -> (B, M, P1) [jrest, k1];  M = P2*Q.
  pass 2 (kernel P2, new): view (B, P2, Q, P1); per (Q-tile, P1-tile,
      batch) block run the P2-point FFT over the *leading* j2 axis as a
      radix-2 VPU chain (fused._vpu_fft_list — a K = 2*P2 MXU contraction
      would waste the systolic array; leading-axis butterflies are pure
      elementwise VPU work), then twiddle w_M^(k2*j3).  Layout preserved:
      [k2, j3, k1].
  pass 3 (kernel Q, kernel-B structure): per (k2, P1-tile, batch) block
      (1, 1, Q, pt) FFT the sublane j3 axis with the two-stage q1 x q2
      scheme of large._kernel_b; the OUTPUT BlockSpec writes each (Q, pt)
      result into (B, Q, P2*P1) at lane offset k2*P1 + pi*pt — the final
      natural order [k3, k2, k1], so the middle-axes transpose that would
      otherwise cost a 7th/8th HBM traversal is absorbed into block
      placement.  (A (1, Q, 1, pt) scatter block is NOT an option: Mosaic
      rejects 1-extent sublane dims, verified on v5e.)

Total HBM traffic: 6 signal traversals (read+write per pass) vs ~12 for
the XLA six-step; MXU work 24*(P1 + q1 + q2) bf16-flops/point at bf16x3
plus a ~10*log2(P2) flops/point VPU tax.

All tables computed host-side in f64 (twiddles.py) and cast to f32; the
pass-1 outer table is (M, P1) f32 in HBM — 2*4*M*P1 bytes (134MB at 2^24),
fetched once per Q-tile with batch as the fast grid axis.
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
from .fused import (_vpu_fft_list, contract_rhs as _contract, contract_wlhs,
                    resolve_precision, w_split)

from .util import i32map


def choose_split3(n: int) -> Optional[Tuple[int, int, int, int, int]]:
    """Pick n = P1 * P2 * (q1*q2) for the 3-kernel pipeline.

    Constraints (all measured on v5e unless noted):
      P1 % 128 == 0, P1 <= 256 (kernel A: largest P up to 256 wins; 512-lane
      splits fail the Mosaic compile at 2^23);
      P2 a power of two in [2, 16] (VPU radix-2 chain; P2 = 32 at
      n = 2^25 fails the remote compile with HTTP 413 — the (M, P1)
      pass-1 twiddle table is closure-captured into the HLO as a literal
      and the payload outgrows the compile helper at ~134MB);
      Q = q1*q2 with q1, q2 <= 256, Q <= 4096 — the Q = 8192 pass-3 kernel
      FAILS the Mosaic compile (HTTP 500 on v5e) even though large.py's
      3D-blocked kernel B compiles at that Q; Q = 4096 measured 795 GF/s
      at 2^23 anyway (the balanced q1 = q2 = 64 stages win).
    Preference: largest Q, then SMALLEST P1 — kernel A's dense contraction
    costs 24*P1 bf16-flops/point, and P1=128 measured +3% over P1=256 at
    2^23 same-run (828 vs 803 GF/s); P2 absorbs the difference on the VPU
    as long as it stays within its <= 16 cap.
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
            if p2 < 2 or p2 > 16 or (p2 & (p2 - 1)):
                continue
            if _large.max_lane_tile(q) is None:
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
            key = (-q, p1, p2)
            if best is None or key < best[0]:
                best = (key, p1, p2, q1, q2)
    if best is None:
        return None
    _, p1, p2, q1, q2 = best
    return p1, p2, q1, q2, q1 * q2


def large3_supported(n: int, dtype) -> bool:
    if np.dtype(dtype) != np.complex64:
        return False
    return choose_split3(n) is not None


def choose_split3f(n: int) -> Optional[Tuple[int, int, int, int, int]]:
    """Split chooser for the FACTORED-twiddle 3-kernel pipeline (large3f).

    Same constraints as choose_split3 except P2 extends to 128: the factored
    pass-1 table is (Q, P1) — a few MB — so the (M, P1) literal that forced
    P2 <= 16 (HTTP 413 at ~134MB) no longer exists, and the P2 FFT's VPU
    chain is the only P2 cost.  Preference: largest Q, then SMALLEST P2
    (shallowest radix-2 chain, least Mosaic compile risk), then smallest P1.
    Covers 2^26 as (P1=256, P2=64, Q=4096) — past both large2f's VMEM edge
    and large3's table cap.
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
            if p2 < 2 or p2 > 128 or (p2 & (p2 - 1)):
                continue
            if q % 512 and q != m:  # pass-1 lane tile must divide Q
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
            key = (-q, p2, p1)
            if best is None or key < best[0]:
                best = (key, p1, p2, q1, q2)
    if best is None:
        return None
    _, p1, p2, q1, q2 = best
    return p1, p2, q1, q2, q1 * q2


def large3f_supported(n: int, dtype) -> bool:
    if np.dtype(dtype) != np.complex64:
        return False
    return choose_split3f(n) is not None


def _kernel_p2(p2, qt2, pt, direction, xr_ref, xi_ref, twr_ref, twi_ref,
               or_ref, oi_ref):
    """(1, P2, qt2, pt) [j2, j3, k1] -> same shape [k2, j3, k1].

    FFT over the leading j2 axis as a radix-2 VPU chain (scalar twiddles
    baked into the kernel body), then the w_M^(k2*j3) twiddle from the
    streamed (P2, qt2) table block.
    """
    xr = xr_ref[:].reshape(p2, qt2, pt)
    xi = xi_ref[:].reshape(p2, qt2, pt)
    vr_l, vi_l = _vpu_fft_list(
        [xr[j] for j in range(p2)], [xi[j] for j in range(p2)], direction
    )
    vr = jnp.stack(vr_l, axis=0)  # (p2, qt2, pt) [k2, j3, k1]
    vi = jnp.stack(vi_l, axis=0)
    twr = twr_ref[:].reshape(p2, qt2, 1)
    twi = twi_ref[:].reshape(p2, qt2, 1)
    or_ref[:] = (vr * twr - vi * twi)[None]
    oi_ref[:] = (vr * twi + vi * twr)[None]


def _kernel_p2f(p2, qt2, pt, direction, xr_ref, xi_ref, wosr_ref, wosi_ref,
                twr_ref, twi_ref, or_ref, oi_ref):
    """Factored-twiddle pass 2: (1, P2, qt2, pt) [j2, j3, k1] -> [k2, j3, k1].

    Applies the j2 half of the factorized outer twiddle
    w_n^(k1*(j2*Q+j3)) = w_{P1P2}^(k1*j2) * w_n^(k1*j3) — the (P2, pt)
    streamed block wos[j2, k1] — BEFORE the j2 FFT (pass 1 applied only the
    w_n^(k1*j3) factor), then runs the radix-2 VPU chain and the mid
    twiddle exactly like _kernel_p2.
    """
    xr = xr_ref[:].reshape(p2, qt2, pt)
    xi = xi_ref[:].reshape(p2, qt2, pt)
    wos_r = wosr_ref[:].reshape(p2, 1, pt)  # [j2, k1] broadcast over j3
    wos_i = wosi_ref[:].reshape(p2, 1, pt)
    vr = xr * wos_r - xi * wos_i
    vi = xr * wos_i + xi * wos_r
    vr_l, vi_l = _vpu_fft_list(
        [vr[j] for j in range(p2)], [vi[j] for j in range(p2)], direction
    )
    vr = jnp.stack(vr_l, axis=0)  # (p2, qt2, pt) [k2, j3, k1]
    vi = jnp.stack(vi_l, axis=0)
    twr = twr_ref[:].reshape(p2, qt2, 1)
    twi = twi_ref[:].reshape(p2, qt2, 1)
    or_ref[:] = (vr * twr - vi * twi)[None]
    oi_ref[:] = (vr * twi + vi * twr)[None]


def _kernel_q(q1, q2, pt, precision, xr_ref, xi_ref, w1_hi_ref, w1_lo_ref,
              w2_hi_ref, w2_lo_ref, twr_ref, twi_ref, or_ref, oi_ref):
    """(1, 1, Q, pt) [j3, k1] -> (1, Q, pt) [k3, k1] natural order.

    large._kernel_b's proven "swap" two-stage scheme (sublane FFT of length
    Q = q1*q2, lanes untouched).  The input block is 4D (pass-2 array view);
    the output block is a plain (1, Q, pt) tile of the (B, Q, P2*P1) final
    array — the k2 digit is encoded in the block's LANE OFFSET by the
    out-spec index map (k2*(P1/pt) + pi), so the natural-order interleave
    costs no in-kernel work and no 1-extent sublane blocks (which Mosaic
    rejects: verified FAIL at (1, Q, 1, pt) on v5e).
    """
    xr = xr_ref[:].reshape(q1, q2, pt)  # [ja, jb, k1]
    xi = xi_ref[:].reshape(q1, q2, pt)

    # stage 1: DFT_q1 over ja (swap ja into sublanes, rhs-contract)
    s_r = jnp.swapaxes(xr, 0, 1)  # (q2, q1, pt)
    s_i = jnp.swapaxes(xi, 0, 1)
    sb = jnp.concatenate([s_r, s_i], axis=1)  # (q2, 2q1, pt)
    a = _contract(
        sb, w1_hi_ref[:], w1_lo_ref[:], (((1,), (1,)), ((), ())), precision
    )  # (q2, pt, 2q1)
    a = jnp.moveaxis(a, -1, 0)  # (2q1, q2, pt) [ka, jb, k1]
    ar, ai = a[:q1], a[q1:]

    # inner twiddle w_Q^(ka*jb)
    twr = twr_ref[:].reshape(q1, q2, 1)
    twi = twi_ref[:].reshape(q1, q2, 1)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr  # (q1, q2, pt) [ka, jb, k1]

    # stage 2: DFT_q2 over jb
    bb = jnp.concatenate([br, bi], axis=1)  # (q1, 2q2, pt)
    d = _contract(
        bb, w2_hi_ref[:], w2_lo_ref[:], (((1,), (1,)), ((), ())), precision
    )  # (q1, pt, 2q2)
    d = jnp.moveaxis(d, -1, 0)  # (2q2, q1, pt) [kb, ka, k1]
    dr, di = d[:q2], d[q2:]

    # flat kb*q1 + ka = natural order within Q
    or_ref[:] = dr.reshape(1, q1 * q2, pt)
    oi_ref[:] = di.reshape(1, q1 * q2, pt)


def _pick_qt2(p2: int, q: int, pt: int) -> int:
    """Pass-2 j3 tile: largest divisor of Q whose (P2, qt2, pt) working set
    (~10 live f32 pair-copies) fits the VMEM budget.

    Mosaic floor: qt2 is the LANE dim of the (P2, qt2) twiddle block, so it
    must be a multiple of 128 (or all of Q) — qt2=64 at 2^26 (P2=64) failed
    the hardware compile outright (round-4 sweep).  When the floored tile
    overshoots the budget, pass 2 raises its own VMEM limit instead
    (large2f's pattern at 2^25)."""
    budget = int(max(config.pallas_vmem_limit, 64 * 2**20) * 0.8)
    floor = q if q < 128 else 128
    qt2 = q
    while qt2 > floor and 10 * 2 * 4 * p2 * qt2 * pt > budget:
        qt2 //= 2
    return max(qt2, floor)


def make_large3_fft_fn(
    n: int,
    direction: FftDirection,
    dtype,
    split: Optional[Tuple[int, int, int, int, int]] = None,
    interpret: bool = False,
    precision=None,
    qt: int = 512,
    pt: int = 128,
    qt2: Optional[int] = None,
    factored: bool = False,
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n), the three-kernel pipeline.

    split = (P1, P2, q1, q2, Q); qt tiles pass 1's lane axis, pt tiles the
    P1 lane axis in passes 2/3, qt2 tiles pass 2's j3 sublane axis.

    factored=True ("large3f"): pass 1 streams only the (Q, P1) j3 factor of
    the outer twiddle (block row = qi % (Q/qt) — each kernel-A block lies in
    one j2 since qt | Q), and pass 2 applies the (P2, P1) j2 factor before
    its VPU chain (_kernel_p2f).  No (M, P1) table exists, so the P2 <= 16
    cap (the ~134MB HLO literal, HTTP 413) lifts to 128 and the envelope
    extends to 2^26; the table read per call drops from M*P1 to Q*P1 + P2*P1
    entries.
    """
    assert np.dtype(dtype) == np.complex64, "large3 kernel is c64/f32 only"
    sp = split or (choose_split3f(n) if factored else choose_split3(n))
    assert sp is not None, f"no 3-kernel split for n={n}"
    p1, p2, q1, q2, q = sp
    assert q1 * q2 == q and p1 * p2 * q == n, sp
    m = p2 * q
    precision = resolve_precision(precision, interpret)
    rdt = np.float32

    qt = _large._lane_tile(m, qt)
    pt = min(pt, p1)
    if not interpret:
        assert p1 % pt == 0 and pt % 128 == 0 and qt % 128 == 0, (sp, qt, pt)
    if factored:
        if qt > q:
            qt = q
        assert q % qt == 0, (q, qt)  # kernel-A blocks must not straddle j2
    if qt2 is None:
        qt2 = _pick_qt2(p2, q, pt)
    assert q % qt2 == 0, (q, qt2)

    # pass 1 constants: dense block DFT_P1 + outer twiddle — (M, P1)
    # [jrest, k1] in the plain form, or only the (Q, P1) j3 factor
    # w_n^(j3*k1) when factored (exponent < Q*P1 <= n, exact in f64)
    wp = calg.block_mid(twiddles.dft_matrix(p1, direction), rdt)
    wp_hi, wp_lo = w_split(wp, precision)
    if factored:
        sign = -1.0 if direction == FftDirection.FORWARD else 1.0
        e = np.arange(q, dtype=np.int64)[:, None] * np.arange(p1, dtype=np.int64)
        tw_outer = np.exp(sign * 2j * np.pi * e / n)  # (Q, P1) [j3, k1]
        # the j2 factor, applied in pass 2: (P2, P1) w_{P1P2}^(j2*k1)
        wos = twiddles.twiddle_table(p2, p1, direction)
        wos_r = np.ascontiguousarray(wos.real).astype(rdt)
        wos_i = np.ascontiguousarray(wos.imag).astype(rdt)
    else:
        tw_outer = twiddles.twiddle_table(p1, m, direction).T  # (M, P1)
    twr_o = np.ascontiguousarray(tw_outer.real).astype(rdt)
    twi_o = np.ascontiguousarray(tw_outer.imag).astype(rdt)

    # pass 2 constants: w_M^(k2*j3) table (P2, Q) [k2, j3]
    tw_mid = twiddles.twiddle_table(p2, q, direction)
    twr_m = np.ascontiguousarray(tw_mid.real).astype(rdt)
    twi_m = np.ascontiguousarray(tw_mid.imag).astype(rdt)

    # pass 3 constants: block DFT_q1/q2 + inner twiddle (q1, q2) [ka, jb]
    w1 = calg.block_mid(twiddles.dft_matrix(q1, direction), rdt)
    w2 = calg.block_mid(twiddles.dft_matrix(q2, direction), rdt)
    w1_hi, w1_lo = w_split(w1, precision)
    w2_hi, w2_lo = w_split(w2, precision)
    tw_inner = twiddles.twiddle_table(q1, q2, direction)
    twr_i = np.ascontiguousarray(tw_inner.real).astype(rdt)
    twi_i = np.ascontiguousarray(tw_inner.imag).astype(rdt)

    kernel_a = functools.partial(_large._kernel_a, p1, qt, precision)
    if factored:
        kernel_p2 = functools.partial(_kernel_p2f, p2, qt2, pt, direction)
    else:
        kernel_p2 = functools.partial(_kernel_p2, p2, qt2, pt, direction)
    kernel_q = functools.partial(_kernel_q, q1, q2, pt, precision)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=config.pallas_vmem_limit)
    # pass 2 only: the Mosaic lane floor (qt2 >= 128) can push the working
    # set past the standard budget at P2=64 (2^26) — raise this one call's
    # limit rather than shrinking below the floor (which cannot compile)
    _p2_est = 10 * 2 * 4 * p2 * qt2 * pt
    if _p2_est > int(max(config.pallas_vmem_limit, 64 * 2**20) * 0.8):
        cparams2 = pltpu.CompilerParams(
            vmem_limit_bytes=max(config.pallas_vmem_limit, 112 * 2**20)
        )
    else:
        cparams2 = cparams

    def cspec(w, ndim=2):
        return pl.BlockSpec(
            w.shape, i32map(lambda *_: (0,) * ndim), memory_space=pltpu.VMEM
        )

    def call(xr, xi):
        batch = xr.shape[0]

        # ---- pass 1: (B, P1, M) -> (B, M, P1) [jrest, k1], twiddled ----
        if factored:
            # the (Q, P1) j3-factor table wraps every Q/qt blocks (qt | Q,
            # so each kernel-A block has a single j2 and j3 = jrest mod Q)
            blocks_per_j2 = q // qt
            tw_spec = pl.BlockSpec(
                (qt, p1),
                i32map(lambda qi, b: (qi % blocks_per_j2, 0)),
                memory_space=pltpu.VMEM,
            )
        else:
            tw_spec = pl.BlockSpec(
                (qt, p1), i32map(lambda qi, b: (qi, 0)), memory_space=pltpu.VMEM
            )
        a_r, a_i = pl.pallas_call(
            kernel_a,
            grid=(m // qt, batch),  # batch fastest: twiddle block stays put
            in_specs=[
                pl.BlockSpec((1, p1, qt), i32map(lambda qi, b: (b, 0, qi)), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p1, qt), i32map(lambda qi, b: (b, 0, qi)), memory_space=pltpu.VMEM),
                cspec(wp_hi), cspec(wp_lo),
                tw_spec, tw_spec,
            ],
            out_specs=[
                pl.BlockSpec((1, qt, p1), i32map(lambda qi, b: (b, qi, 0)), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qt, p1), i32map(lambda qi, b: (b, qi, 0)), memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((batch, m, p1), jnp.float32)] * 2,
            compiler_params=cparams,
            interpret=interpret,
        )(
            xr.reshape(batch, p1, m),
            xi.reshape(batch, p1, m),
            jnp.asarray(wp_hi), jnp.asarray(wp_lo),
            jnp.asarray(twr_o), jnp.asarray(twi_o),
        )

        # ---- pass 2: (B, P2, Q, P1) FFT over j2 (VPU chain) + twiddle ----
        a_r = a_r.reshape(batch, p2, q, p1)
        a_i = a_i.reshape(batch, p2, q, p1)
        io_spec2 = pl.BlockSpec(
            (1, p2, qt2, pt),
            i32map(lambda qi, pi, b: (b, 0, qi, pi)),
            memory_space=pltpu.VMEM,
        )
        tw_spec2 = pl.BlockSpec(
            (p2, qt2), i32map(lambda qi, pi, b: (0, qi)), memory_space=pltpu.VMEM
        )
        if factored:
            # the j2 outer factor: (P2, pt) lane block keyed by the P1 tile
            wos_spec = pl.BlockSpec(
                (p2, pt),
                i32map(lambda qi, pi, b: (0, pi)),
                memory_space=pltpu.VMEM,
            )
            b_r, b_i = pl.pallas_call(
                kernel_p2,
                grid=(q // qt2, p1 // pt, batch),
                in_specs=[io_spec2, io_spec2, wos_spec, wos_spec,
                          tw_spec2, tw_spec2],
                out_specs=[io_spec2, io_spec2],
                out_shape=[
                    jax.ShapeDtypeStruct((batch, p2, q, p1), jnp.float32)
                ] * 2,
                compiler_params=cparams2,
                interpret=interpret,
            )(a_r, a_i, jnp.asarray(wos_r), jnp.asarray(wos_i),
              jnp.asarray(twr_m), jnp.asarray(twi_m))
        else:
            b_r, b_i = pl.pallas_call(
                kernel_p2,
                grid=(q // qt2, p1 // pt, batch),
                in_specs=[io_spec2, io_spec2, tw_spec2, tw_spec2],
                out_specs=[io_spec2, io_spec2],
                out_shape=[
                    jax.ShapeDtypeStruct((batch, p2, q, p1), jnp.float32)
                ] * 2,
                compiler_params=cparams2,
                interpret=interpret,
            )(a_r, a_i, jnp.asarray(twr_m), jnp.asarray(twi_m))

        # ---- pass 3: FFT_Q over j3; the k2 digit rides the output
        # block's lane offset so each (Q, pt) result lands directly at its
        # natural-order lanes of (B, Q, P2*P1) ----
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
