"""Dense DFT as an MXU matmul (complex-pair form).

Replaces the reference's naive Dft oracle (algorithm/dft.rs:22-81) *and* the
hand-written butterfly kernels for small sizes (algorithm/butterflies.rs): on
TPU the fastest "butterfly" is a batched real block-matrix matmul against the
n x n DFT matrix, which XLA tiles onto the 128x128 systolic array.  The DFT
matrix is symmetric (W[j,k] = w^(jk)), so contraction side is free to choose.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..common import FftDirection
from .. import twiddles
from . import calg


def make_dft_fn(n: int, direction: FftDirection, dtype):
    """Return fn: Cplx (..., n) -> Cplx (..., n), the unnormalized DFT."""
    if n == 0 or n == 1:
        return lambda x: x
    rdt = calg.real_dtype_of(dtype)
    wb = calg.block_last(twiddles.dft_matrix(n, direction), rdt)

    def apply(x):
        return calg.matmul_last(x, jnp.asarray(wb))

    return apply
