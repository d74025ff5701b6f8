"""Bluestein's chirp-z algorithm: arbitrary length n via inner FFT of m >= 2n-1.

Reference: algorithm/bluesteins_algorithm.rs:39-226.  Plan-time
precomputation (bluesteins_algorithm.rs:62-87): the inner-FFT spectrum of the
symmetric-wrapped, 1/m-scaled conjugate chirp, computed host-side in f64 with
the squared-index-mod-2n precision trick (twiddles.rs:25-57).  At run time the
chirp multiplies are VPU elementwise ops that XLA fuses with the surrounding
FFT stages; the conjugation-as-inverse trick reuses the same-direction inner
FFT for the second transform (bluesteins_algorithm.rs:116-135, the avx
backend's fused `mul_complex_conjugated`, avx_bluesteins.rs:36-52, is exactly
the fusion XLA performs here).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..common import FftDirection
from .. import twiddles


def make_bluestein_fn(
    n: int,
    m: int,
    inner_fn: Callable,
    direction: FftDirection,
    dtype,
):
    """Return fn: (..., n) -> (..., n). inner_fn is a length-m last-axis FFT."""
    assert m >= 2 * n - 1, f"Bluestein inner length {m} < 2*{n}-1"

    # "mundane" chirp applied before and after (bluesteins_algorithm.rs:87-89)
    chirp = twiddles.bluesteins_twiddles(n, direction)

    # conjugate-direction chirp, scaled by 1/m, wrapped symmetrically, then
    # transformed by the (same-direction) inner FFT
    # (bluesteins_algorithm.rs:62-84)
    h = twiddles.bluesteins_twiddles(n, direction.opposite()) / m
    h_full = np.zeros(m, dtype=np.complex128)
    h_full[0] = h[0]
    h_full[1:n] = h[1:]
    h_full[m - n + 1 :] = h[1:][::-1]
    h_fft = twiddles.host_dft(h_full, direction)

    chirp_dev = chirp.astype(dtype)
    h_fft_dev = h_fft.astype(dtype)

    def apply(x):
        shape = x.shape
        y = x * jnp.asarray(chirp_dev)
        pad = [(0, 0)] * (len(shape) - 1) + [(0, m - n)]
        y = jnp.pad(y, pad)
        yf = inner_fn(y)
        z = jnp.conj(yf * jnp.asarray(h_fft_dev))
        zf = inner_fn(z)
        return jnp.conj(zf[..., :n]) * jnp.asarray(chirp_dev)

    return apply
