"""Bluestein's chirp-z algorithm: arbitrary length n via inner FFT of m >= 2n-1.

Reference: algorithm/bluesteins_algorithm.rs:39-226.  Plan-time
precomputation (bluesteins_algorithm.rs:62-87): the inner-FFT spectrum of the
symmetric-wrapped, 1/m-scaled conjugate chirp, computed host-side in f64 with
the squared-index-mod-2n precision trick (twiddles.rs:25-57).  At run time the
chirp multiplies are VPU elementwise ops that XLA fuses with the surrounding
FFT stages; the conjugation-as-inverse trick reuses the same-direction inner
FFT for the second transform (bluesteins_algorithm.rs:116-135; the AVX
backend's fused `mul_complex_conjugated`, avx_bluesteins.rs:36-52, is exactly
the fusion XLA performs here).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..common import FftDirection
from .. import twiddles
from . import calg


def bluestein_tables(n: int, m: int, direction: FftDirection):
    """Plan-time constants shared by the XLA and Pallas Bluestein paths.

    Returns (chirp, h_fft) in complex128:
    * chirp — the "mundane" chirp applied before and after
      (bluesteins_algorithm.rs:87-89),
    * h_fft — the inner-FFT spectrum of the conjugate-direction chirp,
      scaled by 1/m and wrapped symmetrically
      (bluesteins_algorithm.rs:62-84).
    """
    if m < 2 * n - 1:
        raise ValueError(f"Bluestein inner length {m} < 2*{n}-1")
    chirp = twiddles.bluesteins_twiddles(n, direction)
    h = twiddles.bluesteins_twiddles(n, direction.opposite()) / m
    h_full = np.zeros(m, dtype=np.complex128)
    h_full[0] = h[0]
    h_full[1:n] = h[1:]
    h_full[m - n + 1 :] = h[1:][::-1]
    h_fft = twiddles.host_dft(h_full, direction)
    return chirp, h_fft


def make_bluestein_fn(
    n: int,
    m: int,
    inner_fn: Callable,
    direction: FftDirection,
    dtype,
):
    """Return fn: Cplx (..., n) -> Cplx (..., n). inner_fn: length-m FFT."""
    rdt = calg.real_dtype_of(dtype)
    chirp, h_fft = bluestein_tables(n, m, direction)
    cr = chirp.real.astype(rdt)
    ci = chirp.imag.astype(rdt)
    hr = h_fft.real.astype(rdt)
    hi = h_fft.imag.astype(rdt)

    def apply(x):
        y = calg.cmul_const(x, jnp.asarray(cr), jnp.asarray(ci))
        y = calg.pad_last(y, m - n)
        yf = inner_fn(y)
        z = calg.conj(calg.cmul_const(yf, jnp.asarray(hr), jnp.asarray(hi)))
        zf = inner_fn(z)
        head = (zf[0][..., :n], -zf[1][..., :n])  # conj + truncate
        return calg.cmul_const(head, jnp.asarray(cr), jnp.asarray(ci))

    return apply
