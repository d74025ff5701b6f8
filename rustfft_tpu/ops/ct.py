"""Cooley-Tukey decomposition stages in tensor form (complex-pair).

This is the TPU-native replacement for three reference algorithm families:

* MixedRadix six-step (algorithm/mixed_radix.rs:128-158) — transpose /
  inner-FFT / twiddle / transpose / inner-FFT / transpose,
* Radix4 layered cross-FFTs (algorithm/radix4.rs:141-202), and
* RadixN generalized radix chains (algorithm/radixn.rs:338-541).

Derivation (standard decimation-in-time, self-sorting form): for n = p*q with
input index j = j1*q + j2 and output index k = k2*p + k1,

    X[k2*p + k1] = sum_{j2} w_q^(j2*k2) * [ w_n^(k1*j2) * sum_{j1} x[j1,j2] * w_p^(j1*k1) ]

i.e.  (1) DFT_p over the j1 axis, (2) twiddle by w_n^(k1*j2), (3) DFT_q over
the j2 axis, (4) swap the (k1, k2) axes.  On TPU step (1) is one real
block-matrix matmul against the 2p x 2p DFT block (MXU), step (2) fuses into
it as a VPU elementwise multiply, and step (4) is an XLA transpose.  There is
no digit reversal anywhere — the per-level axis swap makes the decomposition
self-sorting, which is why the reference's bitreversed_transpose
(array_utils.rs:372-422) and factor_transpose (array_utils.rs:460-557) have
no TPU counterpart: gathers would be strictly slower than transposes here.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..common import FftDirection
from .. import twiddles
from . import calg


def _stage_constants(p: int, q: int, direction: FftDirection, rdt):
    """Block DFT matrix for the p-axis contraction + twiddle table parts."""
    wb = calg.block_mid(twiddles.dft_matrix(p, direction), rdt)
    tw = twiddles.twiddle_table(p, q, direction)
    return wb, tw.real.astype(rdt), tw.imag.astype(rdt)


def make_ct_stage_fn(
    p: int,
    q: int,
    rest_fn: Callable,
    direction: FftDirection,
    dtype,
):
    """One CT level: matmul DFT_p over the middle axis, twiddle, recurse on q.

    Used for MixedRadix(+Small) where the left factor lowers to a dense
    matrix, and as the building block of radix chains.
    """
    rdt = calg.real_dtype_of(dtype)
    wb, twr, twi = _stage_constants(p, q, direction, rdt)

    def apply(x):
        shape = x[0].shape
        x3 = calg.reshape(x, shape[:-1] + (p, q))
        a = calg.matmul_mid(jnp.asarray(wb), x3)  # [..., k1, j2]
        a = calg.cmul_const(a, jnp.asarray(twr), jnp.asarray(twi))
        d = rest_fn(a)  # FFT over j2 -> [..., k1, k2]
        out = calg.swapaxes(d, -1, -2)  # k = k2*p + k1
        return calg.reshape(out, shape)

    return apply


def make_ct_stage_general_fn(
    p: int,
    q: int,
    left_fn: Callable,
    right_fn: Callable,
    direction: FftDirection,
    dtype,
):
    """One CT level with arbitrary composed inner FFTs (both last-axis).

    The reference six-step shape — three transposes + two inner FFT batches +
    one twiddle multiply (mixed_radix.rs:128-158) — for MixedRadix with two
    large halves.
    """
    rdt = calg.real_dtype_of(dtype)
    tw = twiddles.twiddle_table(p, q, direction)
    twr = np.ascontiguousarray(tw.real.T).astype(rdt)
    twi = np.ascontiguousarray(tw.imag.T).astype(rdt)

    def apply(x):
        shape = x[0].shape
        x3 = calg.reshape(x, shape[:-1] + (p, q))
        t = calg.swapaxes(x3, -1, -2)  # (..., q, p) indexed [j2, j1]
        a = left_fn(t)  # DFT_p -> [j2, k1]
        a = calg.cmul_const(a, jnp.asarray(twr), jnp.asarray(twi))
        b = calg.swapaxes(a, -1, -2)  # (..., p, q) indexed [k1, j2]
        d = right_fn(b)  # DFT_q -> [k1, k2]
        out = calg.swapaxes(d, -1, -2)  # k = k2*p + k1
        return calg.reshape(out, shape)

    return apply


def make_ct_chain_fn(
    factors,
    base_len: int,
    base_fn: Callable,
    direction: FftDirection,
    dtype,
):
    """FFT of n = prod(factors) * base_len as a chain of matmul CT stages.

    Lowers both Recipe.Radix4 (factors = (4,)*k, radix4.rs:141-202) and
    Recipe.RadixN (arbitrary factor tuple, radixn.rs:338-541).
    """
    fn = base_fn
    n = base_len
    # innermost stage first; wrap outward so factors[0] is the outermost split
    for f in reversed(factors):
        q = n
        n = f * q
        fn = make_ct_stage_fn(f, q, fn, direction, dtype)
    return fn
