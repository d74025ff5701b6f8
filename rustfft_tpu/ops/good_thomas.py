"""Good-Thomas (Prime-Factor) algorithm: coprime n = p*q with no twiddles.

Reference: algorithm/good_thomas_algorithm.rs:40-649.  The reference streams
the CRT input re-index and Ruritanian output re-index with one integer
division per row (good_thomas_algorithm.rs:144-222); on TPU both re-indexes
are precomputed host-side as flat index arrays and applied as single gathers —
the TPU equivalent of GoodThomasAlgorithmSmall's precomputed
input_output_map (good_thomas_algorithm.rs:363-420), applied at every size.

Math: with input map j = (q*j1 + p*j2) mod n, w_n^(jk) splits exactly into
w_p^(j1*k) * w_q^(j2*k), so

    X[k] = ( DFT_p (x) DFT_q )(x3)[k mod p, k mod q]

— a 2-D DFT with *zero* twiddle multiplies, which is the whole point of the
algorithm.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from . import calg


def make_index_maps(p: int, q: int):
    """Precompute gather indices for input (CRT) and output (residue) maps."""
    n = p * q
    j1 = np.arange(p, dtype=np.int64)[:, None]
    j2 = np.arange(q, dtype=np.int64)[None, :]
    input_map = ((q * j1 + p * j2) % n).reshape(-1)  # x3[j1,j2] = x[input_map]
    k = np.arange(n, dtype=np.int64)
    output_map = (k % p) * q + (k % q)  # X[k] = yflat[output_map[k]]
    return input_map.astype(np.int32), output_map.astype(np.int32)


def make_good_thomas_fn(
    p: int,
    q: int,
    left_fn: Callable,
    right_fn: Callable,
    dtype,
    pallas_mode: str = "off",
):
    """left_fn: last-axis FFT of length p; right_fn: last-axis FFT of length q.

    pallas_mode ("off"/"tpu"/"interpret", executor._pallas_mode): in the
    Pallas modes both re-index gathers run as the in-VMEM Benes permutation
    kernel (ops/pallas/permute.py) when n fits its (X<=16, 128, 128) grid
    and config.rader_gather == "kernel"."""
    input_map, output_map = make_index_maps(p, q)
    n = p * q

    in_perm_fn = out_perm_fn = None
    if pallas_mode != "off":
        from ..config import config
        from .pallas import permute

        if config.rader_gather == "kernel" and permute.permute_supported(
            n, dtype
        ):
            interpret = pallas_mode == "interpret"
            in_perm_fn = permute.make_permute_fn(
                input_map.astype(np.int64), interpret=interpret
            )
            out_perm_fn = permute.make_permute_fn(
                output_map.astype(np.int64), interpret=interpret
            )

    def apply(x):
        shape = x[0].shape
        if in_perm_fn is not None:
            gathered = in_perm_fn(x)
        else:
            gathered = calg.take(x, jnp.asarray(input_map), axis=-1)
        x3 = calg.reshape(gathered, shape[:-1] + (p, q))
        y = right_fn(x3)  # DFT over j2 -> [j1, k2]
        y = calg.swapaxes(y, -1, -2)  # (..., q, p)
        y = left_fn(y)  # DFT over j1 -> [k2, k1]
        y = calg.swapaxes(y, -1, -2)  # (..., p, q) = [k mod p, k mod q]
        yflat = calg.reshape(y, shape)
        if out_perm_fn is not None:
            return out_perm_fn(yflat)
        return calg.take(yflat, jnp.asarray(output_map), axis=-1)

    return apply
