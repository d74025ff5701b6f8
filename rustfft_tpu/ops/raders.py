"""Rader's algorithm: FFT of prime length p via cyclic convolution of p-1.

Reference: algorithm/raders_algorithm.rs:41-330.  The index-chasing
permutations by powers of the primitive root (raders_algorithm.rs:185-191,
228-233) become precomputed gather index arrays (the TPU analogue of the AVX
backend's gather-instruction version, avx_raders.rs:243-307).  The
"inverse-via-conjugation" trick is kept verbatim: the second inner transform
reuses the same-direction inner FFT by conjugating its input and output
(raders_algorithm.rs:207-233).

Plan-time precomputation (raders_algorithm.rs:86-109): the inner-FFT spectrum
of the reordered, 1/(p-1)-scaled twiddles, computed host-side in f64.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..common import FftDirection
from .. import math_utils, twiddles
from . import calg


def raders_tables(p: int, direction: FftDirection):
    """Plan-time constants shared by the XLA and Pallas Rader paths.

    Returns (perm_in, inv_gather, b_fft):
    * perm_in — input gather a[i] = x[g^(i+1) mod p]
      (raders_algorithm.rs:185-191),
    * inv_gather — the output scatter out[g^-(i+1)] = conj(D[i]) expressed
      as a gather (raders_algorithm.rs:228-233),
    * b_fft — inner-FFT spectrum of b[i] = w_p^(g^-i) / (p-1)
      (raders_algorithm.rs:86-109), complex128.
    """
    if not math_utils.is_prime(p):
        raise ValueError(f"Rader's algorithm requires prime length, got {p}")
    m = p - 1
    g = math_utils.primitive_root(p)
    g_inv = math_utils.mod_inverse(g, p)

    perm_in = np.empty(m, dtype=np.int64)
    idx = 1
    for i in range(m):
        idx = idx * g % p
        perm_in[i] = idx

    out_idx = np.empty(m, dtype=np.int64)
    idx = 1
    for i in range(m):
        idx = idx * g_inv % p
        out_idx[i] = idx
    inv_gather = np.empty(m, dtype=np.int64)
    inv_gather[out_idx - 1] = np.arange(m)

    b = np.empty(m, dtype=np.complex128)
    t = 1
    for i in range(m):
        b[i] = twiddles.compute_twiddle(t, p, direction)
        t = t * g_inv % p
    b_fft = twiddles.host_dft(b / m, direction)
    return perm_in, inv_gather, b_fft


def make_raders_fn(
    p: int,
    inner_fn: Callable,
    direction: FftDirection,
    dtype,
):
    """Return fn: Cplx (..., p) -> Cplx (..., p). inner_fn: length p-1 FFT."""
    rdt = calg.real_dtype_of(dtype)
    perm_in, inv_gather, b_fft = raders_tables(p, direction)
    bfr = b_fft.real.astype(rdt)
    bfi = b_fft.imag.astype(rdt)

    perm_in32 = perm_in.astype(np.int32)
    inv_gather32 = inv_gather.astype(np.int32)

    def apply(x):
        xr, xi = x
        a = calg.take(x, jnp.asarray(perm_in32), axis=-1)
        aft = inner_fn(a)
        # out[0] = x[0] + A[0]  (raders_algorithm.rs:202)
        out0 = (xr[..., :1] + aft[0][..., :1], xi[..., :1] + aft[1][..., :1])
        # pointwise multiply by the precomputed spectrum, conjugated to set up
        # the inverse-via-forward inner FFT  (raders_algorithm.rs:207-217)
        c = calg.conj(calg.cmul_const(aft, jnp.asarray(bfr), jnp.asarray(bfi)))
        # add conj(x[0]) to the DC bin  (raders_algorithm.rs:219-221)
        cr = c[0].at[..., 0].add(xr[..., 0])
        ci = c[1].at[..., 0].add(-xi[..., 0])
        d = inner_fn((cr, ci))
        rest = calg.conj(calg.take(d, jnp.asarray(inv_gather32), axis=-1))
        return calg.concat_last(out0, rest)

    return apply
