"""Shared helpers for the Pallas TPU kernels."""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def take_lane(v, idx):
    """``jnp.take_along_axis(v, idx, axis=1)`` for 2D ``v``, x64-safe.

    jnp.take_along_axis unconditionally converts indices to the default int
    dtype (int64 when ``jax_enable_x64`` is on) and Mosaic rejects 64-bit
    types in-kernel.  This emits the identical batched ``lax.gather`` that
    Mosaic pattern-matches to ``tpu.dynamic_gather`` (lane gather), with the
    indices kept int32.  c128 users must enable x64, so the c64 kernel tier
    has to stay compilable with it on.
    """
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return lax.gather(
        v,
        idx[..., None].astype(jnp.int32),
        dnums,
        (1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def i32map(f):
    """Force a BlockSpec index map to return uniform int32 indices.

    Index maps mix `pl.program_id` values (always i32) with Python int
    constants; under ``jax_enable_x64`` the constants trace as i64 and Mosaic
    rejects the mixed tuple ("failed to legalize operation 'func.return'",
    observed on v5e).  c128 users are told to enable x64, so the c64 kernel
    tier must stay compilable with it on.
    """

    def g(*args):
        return tuple(jnp.int32(v) for v in f(*args))

    return g
