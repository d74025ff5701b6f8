"""Flagship workload: batched large-N FFT pipelines.

The reference's headline benchmark scenario (BASELINE.md config 5) is a
batched 4096 x 2^20-point c64 transform via the six-step/MXU path with the
batch dimension sharded over ICI.  This module packages that workload — and
its single-chip reduction — as the repo's "flagship model":

* `make_forward_fn`  — single-chip batched planned FFT (pair in, pair out).
* `make_spectral_step` — the full multi-chip step: distributed forward FFT,
  pointwise spectral filter, distributed inverse FFT, 1/n normalization —
  a realistic spectral pipeline exercising every sharded code path (three
  all_to_alls per transform over the 'fft' axis, batch parallel over 'data').
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import FftDirection
from ..planner import FftPlanner
from ..parallel import make_distributed_fft


@dataclass(frozen=True)
class FlagshipConfig:
    batch: int = 4096
    n: int = 1 << 20
    dtype: type = np.complex64


def make_forward_fn(n: int, dtype=np.complex64) -> Callable:
    """Jittable single-chip batched forward FFT (complex-pair signature)."""
    plan = FftPlanner(dtype).plan_fft_forward(n)
    return plan.raw_fn


def make_spectral_step(mesh, n: int, dtype=np.complex64) -> Callable:
    """Full sharded step: FFT -> spectral lowpass -> IFFT -> normalize.

    Input/output: pair of (B, n) arrays, B sharded over 'data', n over 'fft'.
    """
    fwd = make_distributed_fft(n, FftDirection.FORWARD, dtype, mesh)
    inv = make_distributed_fft(n, FftDirection.INVERSE, dtype, mesh)
    rdt = np.float32 if np.dtype(dtype) == np.complex64 else np.float64

    # simple smooth spectral filter (host-precomputed, device constant)
    k = np.arange(n)
    filt = np.exp(-((np.minimum(k, n - k) / (n / 4.0)) ** 2)).astype(rdt)

    @jax.jit
    def step(pair):
        f = fwd(pair)
        f = (f[0] * filt, f[1] * filt)
        o = inv(f)
        scale = rdt(1.0 / n)
        return o[0] * scale, o[1] * scale

    return step
