"""Dense DFT as an MXU matmul.

Replaces the reference's naive Dft oracle (algorithm/dft.rs:22-81) *and* the
hand-written butterfly kernels for small sizes (algorithm/butterflies.rs): on
TPU the fastest "butterfly" is a batched matmul against the n x n DFT matrix,
which the XLA compiler tiles onto the 128x128 systolic array.  The matrix is
symmetric (W[j,k] = w^(jk)), so contraction order does not matter.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..common import FftDirection
from ..config import config
from .. import twiddles


def make_dft_fn(n: int, direction: FftDirection, dtype):
    """Return fn: (..., n) -> (..., n) computing the unnormalized DFT."""
    if n == 0 or n == 1:
        return lambda x: x
    w = twiddles.dft_matrix(n, direction).astype(dtype)

    def apply(x):
        return jnp.einsum(
            "...j,jk->...k", x, jnp.asarray(w), precision=config.matmul_precision
        )

    return apply


def contract_middle_axis(w: np.ndarray, x, dtype):
    """out[..., i, r] = sum_j w[i, j] * x[..., j, r].

    The workhorse contraction for Cooley-Tukey stages with a matrix base:
    a batched GEMM with M=K=p and N=rest, which XLA maps onto the MXU while
    fusing the surrounding reshapes/twiddles.
    """
    return jnp.einsum(
        "ij,...jr->...ir", jnp.asarray(w.astype(dtype)), x,
        precision=config.matmul_precision,
    )
