"""Complex-pair algebra: complex tensors as (real, imag) float pairs.

TPU hardware has no complex arithmetic units, and the TPU runtime used here
rejects complex dtypes outright — so the whole device compute path is built
on real tensors.  A complex array of shape (..., n) is carried as a tuple
``(re, im)`` of two real arrays; complex matmuls become single *block-matrix*
real matmuls on the MXU:

    [xr xi] @ [[Wr,  Wi],
               [-Wi, Wr]]  =  [xr@Wr - xi@Wi,  xr@Wi + xi@Wr]

One fused 2p x 2p real GEMM has the same FLOPs as the 4-matmul expansion but
better MXU tiling and a single kernel.  This plays the role of the reference
SIMD backends' complex-multiply primitives (e.g. AvxVector::mul_complex,
avx_vector.rs:85-98) — the "vector abstraction trait" of the TPU build.

Convention: all functions take/return pairs; constants enter as numpy arrays
(host, f64) and are cast to the pair's real dtype at closure-build time.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config

Cplx = Tuple[jnp.ndarray, jnp.ndarray]


def real_dtype_of(complex_dtype) -> np.dtype:
    return (
        np.dtype(np.float32)
        if np.dtype(complex_dtype) == np.complex64
        else np.dtype(np.float64)
    )


def from_numpy(x: np.ndarray, real_dtype) -> Tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x)
    return (
        np.ascontiguousarray(x.real).astype(real_dtype),
        np.ascontiguousarray(x.imag).astype(real_dtype),
    )


def cmul(a: Cplx, b: Cplx) -> Cplx:
    ar, ai = a
    br, bi = b
    return ar * br - ai * bi, ar * bi + ai * br


def cmul_const(a: Cplx, br, bi) -> Cplx:
    """Multiply by a broadcastable constant pair (twiddle tables)."""
    ar, ai = a
    return ar * br - ai * bi, ar * bi + ai * br


def conj(a: Cplx) -> Cplx:
    ar, ai = a
    return ar, -ai


def cadd(a: Cplx, b: Cplx) -> Cplx:
    return a[0] + b[0], a[1] + b[1]


def take(a: Cplx, idx, axis: int = -1) -> Cplx:
    """Gather a pair along an axis.

    Strategy switch (config.rader_gather): "packed" re-interleaves the pair
    as one complex64 array so the gather moves 8-byte elements — half the
    random-access transactions of two 4-byte gathers (measured ~10% faster
    at (512, 65536) on v5e: 2.64 vs 2.94 ms).  f32 pairs only; the TPU
    runtime has no complex128, so f64 pairs always take the two-gather path.
    NOT the default: the tunneled backend currently rejects all complex64
    compute (see config.rader_gather) — opt in only where complex works.
    """
    if config.rader_gather == "packed" and a[0].dtype == jnp.float32:
        g = jnp.take(jax.lax.complex(a[0], a[1]), idx, axis=axis)
        return jnp.real(g), jnp.imag(g)
    return jnp.take(a[0], idx, axis=axis), jnp.take(a[1], idx, axis=axis)


def reshape(a: Cplx, shape) -> Cplx:
    return a[0].reshape(shape), a[1].reshape(shape)


def swapaxes(a: Cplx, ax1: int, ax2: int) -> Cplx:
    return jnp.swapaxes(a[0], ax1, ax2), jnp.swapaxes(a[1], ax1, ax2)


def pad_last(a: Cplx, count: int) -> Cplx:
    if count == 0:
        return a
    widths = [(0, 0)] * (a[0].ndim - 1) + [(0, count)]
    return jnp.pad(a[0], widths), jnp.pad(a[1], widths)


def concat_last(a: Cplx, b: Cplx) -> Cplx:
    return (
        jnp.concatenate([a[0], b[0]], axis=-1),
        jnp.concatenate([a[1], b[1]], axis=-1),
    )


# -- block-matrix complex matmuls ------------------------------------------

def block_last(w: np.ndarray, real_dtype) -> np.ndarray:
    """Block matrix for right-multiplication over the last axis.

    x (..., p) complex, W (p, q) complex:  [xr xi] @ B = [out_r out_i],
    B = [[Wr, Wi], [-Wi, Wr]]  with shape (2p, 2q).
    """
    wr = w.real.astype(real_dtype)
    wi = w.imag.astype(real_dtype)
    top = np.concatenate([wr, wi], axis=1)
    bot = np.concatenate([-wi, wr], axis=1)
    return np.concatenate([top, bot], axis=0)


def block_mid(w: np.ndarray, real_dtype) -> np.ndarray:
    """Block matrix for left-multiplication over a middle axis.

    x (..., p, r) complex, W (q, p) complex: B @ [xr; xi] = [out_r; out_i],
    B = [[Wr, -Wi], [Wi, Wr]]  with shape (2q, 2p).
    """
    wr = w.real.astype(real_dtype)
    wi = w.imag.astype(real_dtype)
    top = np.concatenate([wr, -wi], axis=1)
    bot = np.concatenate([wi, wr], axis=1)
    return np.concatenate([top, bot], axis=0)


def matmul_last(x: Cplx, wb) -> Cplx:
    """x (..., p) complex times W (p, q) complex via block matrix wb (2p, 2q)."""
    xs = jnp.concatenate([x[0], x[1]], axis=-1)
    out = jnp.einsum("...j,jk->...k", xs, wb, precision=config.matmul_precision)
    q = out.shape[-1] // 2
    return out[..., :q], out[..., q:]


def matmul_mid(wb, x: Cplx) -> Cplx:
    """W (q, p) complex times x (..., p, r) complex via block wb (2q, 2p)."""
    xs = jnp.concatenate([x[0], x[1]], axis=-2)
    out = jnp.einsum("ij,...jr->...ir", wb, xs, precision=config.matmul_precision)
    q = out.shape[-2] // 2
    return out[..., :q, :], out[..., q:, :]
