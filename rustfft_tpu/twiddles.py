"""Twiddle-factor tables, computed on host in float64.

Behavioral port of reference src/twiddles.rs.  The reference computes every
twiddle angle in f64 even for f32 transforms (twiddles.rs:11-17); we do the
same with numpy and cast once at the end.  Tables are built at plan time and
become XLA constants / device arrays — there is no per-call trig on device.
"""
from __future__ import annotations

import numpy as np

from .common import FftDirection


def compute_twiddle(index: int, fft_len: int, direction: FftDirection) -> complex:
    """e^(-2*pi*i*index/fft_len), conjugated for inverse (twiddles.rs:6-23)."""
    angle = -2.0 * np.pi * (index % fft_len) / fft_len
    result = complex(np.cos(angle), np.sin(angle))
    return result if direction is FftDirection.FORWARD else result.conjugate()


def dft_matrix(n: int, direction: FftDirection) -> np.ndarray:
    """Dense n x n DFT matrix W[j,k] = e^(-2*pi*i*jk/n) in complex128.

    The small-size FFT kernel on TPU *is* this matrix: a batched matmul against
    it runs on the MXU.  This replaces both the reference's naive Dft
    (algorithm/dft.rs:22-81) and — for sizes 2..=32 — the hand-written butterfly
    kernels (algorithm/butterflies.rs), whose factored expressions only pay off
    on scalar/SIMD CPUs.

    Angles use index products reduced mod n before converting to float so that
    large n keeps full f64 precision.
    """
    from . import native
    from .config import config

    if config.use_native:
        mat = native.dft_matrix(n, direction is FftDirection.INVERSE)
        if mat is not None:
            return mat
    j = np.arange(n, dtype=np.int64)
    # exponent matrix mod n, in integer arithmetic (exact)
    exponents = np.outer(j, j) % n
    angle = -2.0 * np.pi / n
    mat = np.exp(1j * angle * exponents.astype(np.float64))
    if direction is FftDirection.INVERSE:
        mat = np.conj(mat)
    return mat


def twiddle_table(p: int, q: int, direction: FftDirection) -> np.ndarray:
    """Cooley-Tukey inter-stage twiddles tw[k1, j2] = w_{p*q}^(k1*j2).

    Equivalent of the per-algorithm twiddle precomputation in
    mixed_radix.rs:66-71 and radix4.rs:79-92, in table form.
    """
    from . import native
    from .config import config

    if config.use_native:
        table = native.twiddle_table(p, q, direction is FftDirection.INVERSE)
        if table is not None:
            return table
    n = p * q
    k1 = np.arange(p, dtype=np.int64)
    j2 = np.arange(q, dtype=np.int64)
    exponents = np.outer(k1, j2) % n
    angle = -2.0 * np.pi / n
    table = np.exp(1j * angle * exponents.astype(np.float64))
    if direction is FftDirection.INVERSE:
        table = np.conj(table)
    return table


def bluesteins_twiddles(length: int, direction: FftDirection) -> np.ndarray:
    """Chirp twiddles w_{2n}^(k^2 mod 2n) (reference: twiddles.rs:25-57).

    The reference reduces k^2 mod 2n in u64/u128 before converting to float to
    preserve precision at large n; Python integers are arbitrary precision so
    the same reduction is exact here for any n.
    """
    from . import native
    from .config import config

    if config.use_native:
        table = native.bluestein_chirp(length, direction is FftDirection.INVERSE)
        if table is not None:
            return table
    twice_len = 2 * length
    k = np.arange(length, dtype=object)
    exponents = np.array([int(i) * int(i) % twice_len for i in k], dtype=np.int64)
    angle = -2.0 * np.pi / twice_len
    table = np.exp(1j * angle * exponents.astype(np.float64))
    if direction is FftDirection.INVERSE:
        table = np.conj(table)
    return table


def host_dft(x: np.ndarray, direction: FftDirection) -> np.ndarray:
    """Unnormalized host-side DFT over the last axis, in complex128.

    Used for plan-time precomputation (Rader's/Bluestein's constant spectra,
    reference: raders_algorithm.rs:107-109, bluesteins_algorithm.rs:81-83) and
    as the correctness oracle in tests.  Forward = np.fft.fft; inverse is the
    unnormalized inverse DFT, i.e. n * np.fft.ifft.
    """
    x = np.asarray(x, dtype=np.complex128)
    if direction is FftDirection.FORWARD:
        return np.fft.fft(x, axis=-1)
    return np.fft.ifft(x, axis=-1) * x.shape[-1]
