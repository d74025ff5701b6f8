"""Cooley-Tukey decomposition stages in tensor form.

This is the TPU-native replacement for three reference algorithm families:

* MixedRadix six-step (algorithm/mixed_radix.rs:128-158) — transpose /
  inner-FFT / twiddle / transpose / inner-FFT / transpose,
* Radix4 layered cross-FFTs (algorithm/radix4.rs:141-202), and
* RadixN generalized radix chains (algorithm/radixn.rs:338-541).

Derivation (standard decimation-in-time, self-sorting form): for n = p*q with
input index j = j1*q + j2 and output index k = k2*p + k1,

    X[k2*p + k1] = sum_{j2} w_q^(j2*k2) * [ w_n^(k1*j2) * sum_{j1} x[j1,j2] * w_p^(j1*k1) ]

i.e.  (1) DFT_p over the j1 axis, (2) twiddle by w_n^(k1*j2), (3) DFT_q over
the j2 axis, (4) swap the (k1, k2) axes.  On TPU step (1) is a batched matmul
against the p x p DFT matrix (MXU), step (2) fuses into it as a VPU
elementwise multiply, and step (4) is an XLA transpose.  There is no digit
reversal anywhere — the per-level axis swap makes the decomposition
self-sorting, which is why the reference's bitreversed_transpose
(array_utils.rs:372-422) and factor_transpose (array_utils.rs:460-557) have no
TPU counterpart: gathers would be strictly slower than transposes here.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..common import FftDirection
from .. import twiddles
from .dft import contract_middle_axis


def ct_stage_matmul(
    x,
    p: int,
    q: int,
    wp: np.ndarray,
    tw: np.ndarray,
    rest_fn: Callable,
    dtype,
):
    """One CT level where the p-axis DFT is a dense matrix.

    x: (..., p*q) -> (..., p*q), with rest_fn computing a length-q FFT over
    the last axis.
    """
    shape = x.shape
    x3 = x.reshape(shape[:-1] + (p, q))
    a = contract_middle_axis(wp, x3, dtype)  # [..., k1, j2]
    a = a * jnp.asarray(tw.astype(dtype))
    d = rest_fn(a)  # FFT over j2 -> [..., k1, k2]
    out = jnp.swapaxes(d, -1, -2)  # [..., k2, k1]; k = k2*p + k1
    return out.reshape(shape)


def ct_stage_general(
    x,
    p: int,
    q: int,
    left_fn: Callable,
    right_fn: Callable,
    tw: np.ndarray,
    dtype,
):
    """One CT level where both inner FFTs are arbitrary composed functions.

    Used for MixedRadix with two large halves (reference six-step shape:
    three transposes + two inner FFT batches + one twiddle multiply,
    mixed_radix.rs:128-158).  left_fn/right_fn compute FFTs over the last
    axis of (..., p) / (..., q) arrays respectively.
    """
    shape = x.shape
    x3 = x.reshape(shape[:-1] + (p, q))
    t = jnp.swapaxes(x3, -1, -2)  # (..., q, p) indexed [j2, j1]
    a = left_fn(t)  # DFT_p over last axis -> [j2, k1]
    a = a * jnp.asarray(np.ascontiguousarray(tw.T).astype(dtype))
    b = jnp.swapaxes(a, -1, -2)  # (..., p, q) indexed [k1, j2]
    d = right_fn(b)  # DFT_q over last axis -> [k1, k2]
    out = jnp.swapaxes(d, -1, -2)  # (..., q, p); k = k2*p + k1
    return out.reshape(shape)


def make_ct_chain_fn(
    factors,
    base_len: int,
    base_fn: Callable,
    direction: FftDirection,
    dtype,
):
    """FFT of n = prod(factors) * base_len as a chain of matmul CT stages.

    Lowers both Recipe.Radix4 (factors = (4,)*k, radix4.rs:141-202) and
    Recipe.RadixN (arbitrary factor tuple, radixn.rs:338-541).  Each factor f
    contributes one p=f stage whose DFT matrix is f x f; the base FFT runs at
    the innermost level over contiguous last-axis chunks.
    """
    n = base_len
    for f in factors:
        n *= f

    # Precompute per-level constants host-side (plan time), outermost first.
    levels = []
    rest = n
    for f in factors:
        q = rest // f
        wp = twiddles.dft_matrix(f, direction)
        tw = twiddles.twiddle_table(f, q, direction)
        levels.append((f, q, wp, tw))
        rest = q
    assert rest == base_len

    def apply(x, _level=0):
        if _level == len(levels):
            return base_fn(x)
        f, q, wp, tw = levels[_level]
        shape = x.shape
        x3 = x.reshape(shape[:-1] + (f, q))
        a = contract_middle_axis(wp, x3, dtype)
        a = a * jnp.asarray(tw.astype(dtype))
        d = apply(a, _level + 1)
        out = jnp.swapaxes(d, -1, -2)
        return out.reshape(shape)

    return apply
