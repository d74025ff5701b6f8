"""Shared helpers for the Pallas TPU kernels."""
from __future__ import annotations

import jax.numpy as jnp


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
