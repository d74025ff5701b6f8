"""Fused Bluestein convolution on the large-pipeline structure: 3 kernels.

Serves huge primes whose Bluestein inner m = 2^a*3^b is too big for a
single VMEM-resident conv kernel (ops/pallas/conv.py) — the planner routes
such n through an inner on the large two-kernel tier (planner.py
_routed_bluestein_inner).  The generic route there glues two full large-
pipeline FFTs with XLA elementwise passes (~16 HBM traversals of m); this
module fuses the whole convolution FFT -> xH -> conj -> FFT into three
Pallas kernels (~8 traversals) — the TPU analogue of the reference's fused
conjugated-multiply Bluestein (avx_bluesteins.rs:36-52, 116-135; algorithm
semantics per bluesteins_algorithm.rs:39-226).

The trick: the second, same-direction FFT consumes the first FFT's
natural-order (B, Q, P) output *directly* by running the mirrored
Cooley-Tukey factorization — no transpose passes anywhere:

  first FFT of y[j1*Q + j2] (layout (B, P, Q), j1 sublanes):
    kernel A (large._kernel_a): DFT_P over sublanes j1 -> k1 lanes,
        times w_m^(k1*j2); output (B, Q, P) [j2, k1]
    inside kernel B_conv: DFT_Q over sublanes j2 -> k2;
        value X[k2*P + k1] sits at (k2, k1): natural order

  pointwise (kernel B_conv, VPU): z = conj(X * H), H streamed as the
        (Q, P) reshape of the precomputed spectrum — H[k2*P+k1] at (k2, k1)

  second FFT of z[k2*P + k1] (already resident as [k2 sub, k1 lane]):
    w_m^((l2*Q+l1)(k2*P+k1)) = w_Q^(l1*k2) * w_m^(l1*k1) * w_P^(l2*k1), so
    inside kernel B_conv: DFT_Q over sublanes k2 -> l1, then times
        w_m^(l1*k1) — the SAME (Q, P) twiddle table kernel A streams,
        consumed in (Q, pt) blocks instead of (qt, P) blocks
    kernel A2: DFT_P over the *lane* axis k1 -> l2 (a plain x @ W MXU
        contraction); output (B, Q, pkeep) [l1, l2]

Only l = l2*Q + l1 < n survives the final truncation, so A2 slices the
DFT_P matrix rows to pkeep = roundup128(ceil(n/Q)) output lanes — for
m ~ 2.1*n that skips ~half of A2's MXU work and output traffic.  The final
chirp multiply, conjugation, and truncation ride the XLA transpose of the
(B, Q, pkeep) result (one fused pass).

HBM traffic per point of m: pad 1 + A 2 + B_conv 2 + A2 ~1.6 + out-
transpose ~1.6, plus streamed tables (outer twiddle twice, H once) ~3:
~11 m-volumes vs ~16 for the glued route, and B_conv replaces ~6 of them
with VMEM-resident work.
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
from ..bluestein import bluestein_tables
from .fused import contract_rhs as _contract, resolve_precision, w_split
from .large import _kernel_a, _lane_tile, choose_pqq, fftq_sublane
from .util import i32map


def _kernel_bconv(q1, q2, pt, precision, variant, xr_ref, xi_ref,
                  w1_hi_ref, w1_lo_ref, w2_hi_ref, w2_lo_ref, twr_ref,
                  twi_ref, hr_ref, hi_ref, t2r_ref, t2i_ref,
                  or_ref, oi_ref):
    """Convolution row stage: (1, Q, pt) [j2, k1] -> (1, Q, pt) [l1, k1].

    FFT_Q -> conj(.*H) -> FFT_Q -> .*w_m^(l1*k1), all VMEM-resident.
    """
    q = q1 * q2
    stage = (q1, q2, pt, precision, variant, w1_hi_ref[:], w1_lo_ref[:],
             w2_hi_ref[:], w2_lo_ref[:], twr_ref[:], twi_ref[:])
    yr, yi = fftq_sublane(
        xr_ref[:].reshape(q, pt), xi_ref[:].reshape(q, pt), *stage
    )  # [k2, k1] natural: the full first-FFT value X[k2*P + k1]
    hr = hr_ref[:]  # (Q, pt) block of the (Q, P) spectrum table
    hi = hi_ref[:]
    # z = conj(X * H): the conjugation-as-inverse trick (the second FFT
    # runs the same direction; bluesteins_algorithm.rs:116-135)
    zr = yr * hr - yi * hi
    zi = -(yr * hi + yi * hr)
    ur, ui = fftq_sublane(zr, zi, *stage)  # [l1, k1]
    t2r = t2r_ref[:]  # (Q, pt) block of the same (Q, P) outer twiddle
    t2i = t2i_ref[:]
    or_ref[:] = (ur * t2r - ui * t2i)[None]
    oi_ref[:] = (ur * t2i + ui * t2r)[None]


def _kernel_a2(p, qt, pkeep, precision, xr_ref, xi_ref, wh_ref, wl_ref,
               or_ref, oi_ref):
    """Final column stage: (1, qt, P) [l1, k1] -> (1, qt, pkeep) [l1, l2].

    DFT_P over the lane axis as a plain x @ W contraction (rows = l1 on
    sublanes, K = the 2P complex-pair lanes) — the natural MXU matmul.
    The DFT matrix ships with only the pkeep output rows kept.
    """
    xr = xr_ref[:].reshape(qt, p)
    xi = xi_ref[:].reshape(qt, p)
    xb = jnp.concatenate([xr, xi], axis=1)  # (qt, 2P)
    d = _contract(
        xb, wh_ref[:], wl_ref[:], (((1,), (1,)), ((), ())), precision
    )  # (qt, 2*pkeep) [l1, l2]
    or_ref[:] = d[:, :pkeep][None]
    oi_ref[:] = d[:, pkeep:][None]


def _bconv_vmem_units(q: int) -> int:
    """Peak live f32 bytes in kernel B_conv, in (Q, 128)-block units.

    Two chained two-stage FFTs (~6 live copies each at their peak), the
    H and twiddle tables (2 blocks each), inputs and outputs (2 each):
    ~20 copies; the bf16 splits inside the contractions are half-size."""
    return 20 * q * 128 * 4


def bconv_supported(m: int, dtype, n: Optional[int] = None) -> bool:
    """True when the fused 3-kernel Bluestein convolution can serve an
    inner of length m (c64, large-tier split, B_conv fits VMEM)."""
    if np.dtype(dtype) != np.complex64:
        return False
    pqq = choose_pqq(m)
    if pqq is None:
        return False
    _, q1, q2 = pqq
    # the kernel requests its own VMEM (up to the 100M hardware-validated
    # ceiling), so feasibility is judged against that, not the global default
    return int(1.25 * _bconv_vmem_units(q1 * q2)) <= 100 * 1024 * 1024


def make_bluestein_large_fn(
    n: int,
    m: int,
    direction: FftDirection,
    dtype,
    split: Optional[Tuple[int, int, int]] = None,
    interpret: bool = False,
    precision=None,
    qt: int = 512,
    pt: int = 128,
    variant: str = "swap",
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n): Bluestein via the fused
    large-pipeline convolution (inner length m = P*q1*q2 >= 2n-1)."""
    assert np.dtype(dtype) == np.complex64, "conv-large kernel is c64 only"
    pqq = split or choose_pqq(m)
    assert pqq is not None, f"no large split for m={m}"
    p, q1, q2 = pqq
    q = q1 * q2
    assert p * q == m
    precision = resolve_precision(precision, interpret)
    rdt = np.float32

    qt = _lane_tile(q, qt)
    pt = _lane_tile(p, pt)
    # A2 input blocks carry the full P on lanes; its sublane tile of Q
    qt2 = min(qt, q)
    if not interpret:
        assert qt % 128 == 0 and pt % 128 == 0 and p % 128 == 0, (
            f"conv-large needs 128-multiple lane tiles; split {pqq}"
        )

    # only outputs l = l2*Q + l1 < n survive the truncation
    pkeep = min(p, -(-((n - 1) // q + 1) // 128) * 128)

    # Bluestein plan-time tables (host f64: chirp (n,), H spectrum (m,))
    chirp, h_fft = bluestein_tables(n, m, direction)
    cr = chirp.real.astype(rdt)
    ci = chirp.imag.astype(rdt)
    h2 = h_fft.reshape(q, p)  # H[k2*P + k1] at (k2, k1)
    h2r = np.ascontiguousarray(h2.real).astype(rdt)
    h2i = np.ascontiguousarray(h2.imag).astype(rdt)

    # kernel A constants (as in large.make_large_fft_fn)
    wp = calg.block_mid(twiddles.dft_matrix(p, direction), rdt)  # (2P, 2P)
    tw_outer = twiddles.twiddle_table(p, q, direction).T  # (Q, P) w^(row*col)
    twr_o = np.ascontiguousarray(tw_outer.real).astype(rdt)
    twi_o = np.ascontiguousarray(tw_outer.imag).astype(rdt)

    # kernel B stage constants
    w1 = calg.block_mid(twiddles.dft_matrix(q1, direction), rdt)
    w2 = calg.block_mid(twiddles.dft_matrix(q2, direction), rdt)
    tw_inner = twiddles.twiddle_table(q1, q2, direction)  # (q1, q2)
    twr_i = np.ascontiguousarray(tw_inner.real).astype(rdt)
    twi_i = np.ascontiguousarray(tw_inner.imag).astype(rdt)

    # kernel A2 constant: DFT_P rows sliced to the kept l2 outputs
    wk = np.concatenate([wp[:pkeep], wp[p : p + pkeep]], axis=0)  # (2pk, 2P)

    wp_hi, wp_lo = w_split(wp, precision)
    w1_hi, w1_lo = w_split(w1, precision)
    w2_hi, w2_lo = w_split(w2, precision)
    wk_hi, wk_lo = w_split(wk, precision)

    kernel_a = functools.partial(_kernel_a, p, qt, precision)
    kernel_bconv = functools.partial(
        _kernel_bconv, q1, q2, pt, precision, variant
    )
    kernel_a2 = functools.partial(_kernel_a2, p, qt2, pkeep, precision)
    # B_conv's two chained sublane FFTs + tables legitimately need more
    # scoped VMEM than the global default (hardware: 71.57M at q=6144 vs
    # the 64M limit — Mosaic OOM); request this kernel's own estimate with
    # margin, capped at the 100M that large2f's 2^25 split also uses.
    vmem_request = min(
        100 * 1024 * 1024,
        max(config.pallas_vmem_limit, int(1.25 * _bconv_vmem_units(q))),
    )
    cparams = pltpu.CompilerParams(vmem_limit_bytes=vmem_request)

    def const_spec(w):
        return pl.BlockSpec(
            w.shape, i32map(lambda *_: (0,) * w.ndim), memory_space=pltpu.VMEM
        )

    def conv_core(yr, yi):
        """(B, m) f32 pair -> (B, Q, pkeep) [l1, l2]: FFT, xH, conj, FFT."""
        batch = yr.shape[0]

        # ---- kernel A: (B, P, Q) -> (B, Q, P) [j2, k1], twiddled ----
        tw_spec = pl.BlockSpec(
            (qt, p), i32map(lambda qi, b: (qi, 0)), memory_space=pltpu.VMEM
        )
        a_r, a_i = pl.pallas_call(
            kernel_a,
            grid=(q // qt, batch),  # batch fastest: twiddle block stays put
            in_specs=[
                pl.BlockSpec((1, p, qt), i32map(lambda qi, b: (b, 0, qi)), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p, qt), i32map(lambda qi, b: (b, 0, qi)), memory_space=pltpu.VMEM),
                const_spec(wp_hi),
                const_spec(wp_lo),
                tw_spec,
                tw_spec,
            ],
            out_specs=[
                pl.BlockSpec((1, qt, p), i32map(lambda qi, b: (b, qi, 0)), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qt, p), i32map(lambda qi, b: (b, qi, 0)), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((batch, q, p), jnp.float32),
                jax.ShapeDtypeStruct((batch, q, p), jnp.float32),
            ],
            compiler_params=cparams,
            interpret=interpret,
        )(
            yr.reshape(batch, p, q),
            yi.reshape(batch, p, q),
            jnp.asarray(wp_hi),
            jnp.asarray(wp_lo),
            jnp.asarray(twr_o),
            jnp.asarray(twi_o),
        )

        # ---- kernel B_conv: FFT_Q, xH, conj, FFT_Q, twiddle ----
        col_spec = pl.BlockSpec(
            (q, pt), i32map(lambda pi, b: (0, pi)), memory_space=pltpu.VMEM
        )
        b_r, b_i = pl.pallas_call(
            kernel_bconv,
            grid=(p // pt, batch),  # batch fastest: H/twiddle blocks stay put
            in_specs=[
                pl.BlockSpec((1, q, pt), i32map(lambda pi, b: (b, 0, pi)), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q, pt), i32map(lambda pi, b: (b, 0, pi)), memory_space=pltpu.VMEM),
                const_spec(w1_hi),
                const_spec(w1_lo),
                const_spec(w2_hi),
                const_spec(w2_lo),
                const_spec(twr_i),
                const_spec(twi_i),
                col_spec,
                col_spec,
                col_spec,
                col_spec,
            ],
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
            jnp.asarray(w1_hi),
            jnp.asarray(w1_lo),
            jnp.asarray(w2_hi),
            jnp.asarray(w2_lo),
            jnp.asarray(twr_i),
            jnp.asarray(twi_i),
            jnp.asarray(h2r),
            jnp.asarray(h2i),
            jnp.asarray(twr_o),
            jnp.asarray(twi_o),
        )

        # ---- kernel A2: DFT_P over lanes, kept outputs only ----
        z_r, z_i = pl.pallas_call(
            kernel_a2,
            grid=(q // qt2, batch),
            in_specs=[
                pl.BlockSpec((1, qt2, p), i32map(lambda qi, b: (b, qi, 0)), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qt2, p), i32map(lambda qi, b: (b, qi, 0)), memory_space=pltpu.VMEM),
                const_spec(wk_hi),
                const_spec(wk_lo),
            ],
            out_specs=[
                pl.BlockSpec((1, qt2, pkeep), i32map(lambda qi, b: (b, qi, 0)), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qt2, pkeep), i32map(lambda qi, b: (b, qi, 0)), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((batch, q, pkeep), jnp.float32),
                jax.ShapeDtypeStruct((batch, q, pkeep), jnp.float32),
            ],
            compiler_params=cparams,
            interpret=interpret,
        )(b_r, b_i, jnp.asarray(wk_hi), jnp.asarray(wk_lo))
        return z_r, z_i

    def prologue(xr, xi):
        """(B, n) pair -> padded+chirped (B, m) pair (one fused XLA write)."""
        return calg.pad_last(
            calg.cmul_const((xr, xi), jnp.asarray(cr), jnp.asarray(ci)),
            m - n,
        )

    def epilogue(z_r, z_i, batch):
        """(B, Q, pkeep) [l1, l2] -> (B, n): transpose, truncate, conj, chirp
        (XLA fuses the elementwise tail into the transpose output)."""
        zfr = z_r.transpose(0, 2, 1).reshape(batch, pkeep * q)[:, :n]
        zfi = z_i.transpose(0, 2, 1).reshape(batch, pkeep * q)[:, :n]
        return calg.cmul_const((zfr, -zfi), jnp.asarray(cr), jnp.asarray(ci))

    def apply(x):
        xr, xi = x
        shape = xr.shape
        xr = xr.reshape(-1, n)
        xi = xi.reshape(-1, n)
        batch = xr.shape[0]
        yr, yi = prologue(xr, xi)
        z_r, z_i = conv_core(yr, yi)
        out_r, out_i = epilogue(z_r, z_i, batch)
        return out_r.reshape(shape), out_i.reshape(shape)

    # introspection hooks for the phase-timing tools (perf_bconv_phases)
    apply.conv_core = conv_core
    apply.prologue = prologue
    apply.epilogue = epilogue
    apply.split = (p, q1, q2, pkeep)
    return apply
