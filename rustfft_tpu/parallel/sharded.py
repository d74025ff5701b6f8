"""Sharded FFT execution: batch sharding and the distributed six-step.

New TPU-first design (the reference is single-node; SURVEY.md §2.5).  Two
scaling modes:

1. `make_batch_sharded_fft` — shard the batch dimension of the reference's
   implicit-batching contract (lib.rs:200-209) across chips.  No collectives;
   pure data parallelism over ICI.

2. `make_distributed_fft` — shard a single huge transform across chips.  The
   seam is the MixedRadix six-step (mixed_radix.rs:128-158): n = p*q, and the
   three transposes of the six-step become three `jax.lax.all_to_all`
   distributed transposes over the mesh axis, with the p- and q-sized FFTs
   running shard-locally through the normal planner/executor stack and the
   inter-stage twiddles computed shard-locally (no global table is ever
   materialized).

Derivation (same DIT identity as ops/ct.py): with j = j1*q + j2 and
k = k2*p + k1,

    X[k2*p+k1] = sum_{j2} wq^(j2 k2) * w_n^(k1 j2) * sum_{j1} x[j1,j2] wp^(j1 k1)

Steps (local shapes for mesh axis size D; requires p % D == 0, q % D == 0):
    x (B, p, q) sharded on p
    1. all_to_all transpose -> (B, q, p) sharded on q      [ICI]
    2. local FFT_p over last axis          -> A[j2, k1]
    3. local twiddle by w_n^(k1 * j2_global)
    4. all_to_all transpose -> (B, p, q) sharded on p      [ICI]
    5. local FFT_q over last axis          -> X3[k1, k2]
    6. all_to_all transpose -> (B, q, p) sharded on q      [ICI]
       = output flat (B, n) in ascending-frequency order, sharded on n.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import executor
from ..common import FftDirection, canonical_complex_dtype
from ..ops import calg
from ..planner import FftPlannerTpu


def make_batch_sharded_fft(
    plan,
    mesh: Mesh,
    batch_axis: str = "data",
) -> Callable:
    """Jit `plan`'s computation with the leading batch dim sharded over mesh.

    Input/output: a complex pair (re, im) each (B, len) with B sharded over
    `batch_axis`.  XLA runs the identical per-chip program on each shard; no
    collectives are inserted.
    """
    spec = NamedSharding(mesh, P(batch_axis, None))
    return jax.jit(plan.raw_fn, in_shardings=spec, out_shardings=spec)


def choose_split(n: int, n_shards: int) -> Tuple[int, int]:
    """Pick n = p*q with p,q both divisible by n_shards and near-balanced.

    The divisibility makes all three all_to_all transposes equal-split.
    """
    best: Optional[Tuple[int, int]] = None
    target = math.isqrt(n)
    for p in range(n_shards, n + 1, n_shards):
        if n % p:
            continue
        q = n // p
        if q % n_shards:
            continue
        if best is None or abs(p - target) < abs(best[0] - target):
            best = (p, q)
    if best is None:
        raise ValueError(
            f"Cannot shard FFT of size {n} over {n_shards} devices: need a "
            f"factorization n = p*q with both p and q divisible by {n_shards}"
        )
    return best


def make_distributed_fft(
    n: int,
    direction: FftDirection,
    dtype,
    mesh: Mesh,
    fft_axis: str = "fft",
    batch_axis: Optional[str] = "data",
    split: Optional[Tuple[int, int]] = None,
) -> Callable:
    """Build fn: (B, n) -> (B, n), n sharded over `fft_axis` of the mesh.

    Batch dim is sharded over `batch_axis` when that axis exists in the mesh
    (set batch_axis=None to replicate the batch).  Output is the ascending-
    frequency unnormalized DFT, sharded like the input.
    """
    dtype = canonical_complex_dtype(dtype)
    d = mesh.shape[fft_axis]
    if split is None:
        split = choose_split(n, d)
    p, q = split
    assert p * q == n and p % d == 0 and q % d == 0, (n, p, q, d)
    if n >= 2**31:
        raise ValueError("distributed FFT supports n < 2^31 (int32 twiddle indices)")
    p_loc, q_loc = p // d, q // d

    planner = FftPlannerTpu(dtype)
    fft_p = executor.build(planner.design_fft_for_len(p), direction, dtype)
    fft_q = executor.build(planner.design_fft_for_len(q), direction, dtype)

    sign = -1.0 if direction is FftDirection.FORWARD else 1.0
    rdt = np.float32 if dtype == np.complex64 else np.float64

    def _a2a_transpose(pair):
        """Distributed transpose of the trailing (rows, cols) pair of axes:
        global (B, r, c) sharded on r -> (B, c, r) sharded on c, via one
        equal-split all_to_all per component (the ICI leg of the six-step)."""
        out = []
        for part in pair:
            t = jax.lax.all_to_all(
                part, fft_axis, split_axis=2, concat_axis=1, tiled=True
            )
            out.append(jnp.swapaxes(t, -1, -2))
        return tuple(out)

    def local_step(x_l):
        # x_l: pair of (B_loc, n/d) = this device's contiguous slice
        b = x_l[0].shape[0]
        my = jax.lax.axis_index(fft_axis)
        x3 = calg.reshape(x_l, (b, p_loc, q))

        # 1. distributed transpose (B, p, q)@p -> (B, q, p)@q          [ICI]
        t = _a2a_transpose(x3)  # rows j2 in [my*q_loc, ...)

        # 2. shard-local FFT over p
        a = fft_p(t)  # [j2, k1]

        # 3. shard-local twiddle w_n^(k1 * j2_global); exponent reduced mod n
        #    in integer arithmetic (the precision discipline of twiddles.rs:11-17)
        j2g = my * q_loc + jax.lax.broadcasted_iota(jnp.int32, (q_loc, 1), 0)
        k1 = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        expo = (j2g * k1) % np.int32(n)  # product < p*q = n < 2^31, no overflow
        angle = (sign * 2.0 * np.pi / n) * expo.astype(rdt)
        a = calg.cmul_const(a, jnp.cos(angle), jnp.sin(angle))

        # 4. distributed transpose (B, q, p)@q -> (B, p, q)@p          [ICI]
        u = _a2a_transpose(a)  # rows k1 in [my*p_loc, ...)

        # 5. shard-local FFT over q
        x5 = fft_q(u)  # [k1, k2]

        # 6. distributed transpose -> (B, q, p)@q == flat k = k2*p + k1 [ICI]
        v = _a2a_transpose(x5)
        return calg.reshape(v, (b, q_loc * p))

    in_spec = P(batch_axis, fft_axis) if batch_axis else P(None, fft_axis)
    shard_fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=((in_spec, in_spec),),
        out_specs=(in_spec, in_spec),
    )

    sharding = NamedSharding(mesh, in_spec)
    return jax.jit(shard_fn, in_shardings=sharding, out_shardings=sharding)
