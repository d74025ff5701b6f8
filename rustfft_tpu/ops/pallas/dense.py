"""Dense whole-DFT matmul kernel: the MXU-first answer to the small-n band.

One Pallas kernel computes the full DFT as a single batched matmul
out = x @ W_n per batch tile — no factorization, no twiddles, no lane
transposes, ONE HBM traversal.  Works for ANY length (primes and
lane-misaligned sizes included: the weight table is lane-padded and the
x blocks ride lanepack's whole-dim lane-block form).

Why this wins where the factored kernels can't: the small band is
op-count bound (CLAUDE.md lanepack anatomy: ~30 VPU ops/group dominate,
ceiling ~370-500 GF/s at 1024), while the MXU at ~205 TF/s bf16 makes
even the O(n^2) dense transform fast below ~1.5k points:

    nominal rate = 5 log2(n) / (passes * 6 n_pad) * 205e12   (gauss)
      n=256: ~1.8 TF/s   n=512: ~1.0 TF/s   n=1009: ~560 GF/s

vs the measured factored tiers (lanepack 359-502, Bluestein conv ~150 at
1009).  This is the TPU translation of the reference's hand-rolled
butterflies (butterflies.rs, 6.4k LoC of fixed-size kernels) and its
dense-DFT fallback (algorithm/dft.rs:1-60): on a systolic-array machine
the DFT *matrix* is the butterfly.

Complex arithmetic uses the 3-multiply (Gauss) split by default — 25%
fewer MXU passes than the block-matrix form at one extra VPU add:

    P1 = xr @ Wr, P2 = xi @ Wi, P3 = (xr + xi) @ (Wr + Wi)
    out_re = P1 - P2, out_im = P3 - P1 - P2

The "block" variant keeps the single [xr xi] @ [[Wr, Wi], [-Wi, Wr]]
GEMM for comparison (same layout as ops/calg.py).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...common import FftDirection
from ...config import config
from ... import twiddles
from .util import i32map
from .fused import (CAT_TIERS, contract_rhs as _contract,
                    resolve_precision, w_split)

LANES = 128


def _n_pad(n: int) -> int:
    return -(-n // LANES) * LANES


def _pack_group(n: int) -> int:
    """Transforms packed per lane row (block-diagonal weights): for n < 128
    the single-transform row wastes most of the vreg lane width AND most of
    the padded weight matrix; packing g = 128//n transforms per row makes
    both dense.  1 for n >= 128."""
    return max(1, LANES // n)


def _passes(precision) -> int:
    # cat tiers ship one (out, passes*K) table: same bytes as `passes` tables
    return {"bf16x3": 3, "bf16x2": 2, "bf16": 1,
            "bf16x3s": 3, "bf16x2s": 2}.get(precision, 3)


def _weight_bytes(n: int, variant: str, precision) -> int:
    """Weight-table VMEM bytes, precision-aware.

    Per logical table of E elements: the cat tiers ship ONE bf16
    (out, passes*K) table = 2*passes*E bytes (1.5x the non-cat pair at
    3 passes — this blew VMEM at n=2003 before it was modeled); the
    split tiers ship a bf16 (hi, lo) pair = 4*E; XLA-precision tiers a
    f32 table = 4*E.  gauss has 3 tables of npad^2, block one of 4*npad^2.
    """
    npad = _n_pad(n)
    elems = 3 * npad * npad if variant == "gauss" else 4 * npad * npad
    if precision in CAT_TIERS:
        return 2 * _passes(precision) * elems
    return 4 * elems


def _vmem_bytes(n: int, bt: int, variant: str, precision) -> int:
    npad = _n_pad(n)
    # x/out windows are double-buffered (2 levels x 4 refs), plus the
    # product tiles / bf16 split temporaries: ~6 (bt, npad) f32 of work
    windows = 2 * 4 * bt * npad * 4
    work = 6 * bt * npad * 4
    return _weight_bytes(n, variant, precision) + windows + work


def pad_worth_it(n: int) -> bool:
    """Routing gate: is the dense kernel's lane padding cheap enough at n?

    The kernel pads the (packed) row to the 128-lane multiple — real MXU
    work.  Round-4 hardware boundary sweep (tools/perf_small.py,
    differential timer): dense wins whenever the pad ratio is small (125:
    617 vs XLA 514; 128: 648 vs 575; 243: 586 vs 437; 256: 634 vs 436) and
    LOSES to the XLA path at high-pad smooth sizes (144, ratio 1.78: 324
    vs 427; 160, ratio 1.6: 365 vs 446; 192, ratio 1.33: tie).  Sizes with
    a prime factor > 32 have no fast XLA alternative (the recipe tree goes
    Rader/Bluestein there — 85 GF/s at 2003 vs dense 215), so they route
    dense regardless of padding.
    """
    from ...math_utils import PrimeFactors

    g = _pack_group(n)
    L = g * n
    if _n_pad(L) <= 1.25 * L:
        return True
    return PrimeFactors.compute(n).has_factors_gt(32)


def choose_variant(n: int) -> str:
    """Measured GEMM-form rule for length n (round-4 crossovers, see
    make_dense_fft_fn): the 4-mult "block" form while the packed row fits
    2 vregs, the 3-mult "gauss" form above.  The single source of truth
    for make_dense_fft_fn's default AND bench.py's roofline flop factor —
    keep them from drifting apart.
    """
    return "block" if _n_pad(_pack_group(n) * n) <= 256 else "gauss"


def dense_supported(n: int, dtype, variant: str = "gauss") -> bool:
    """True when the dense whole-DFT kernel can serve length n (c64).

    Feasibility is judged at the NON-cat f32-grade footprint — if the
    default cat tier would exceed VMEM, make_dense_fft_fn silently drops
    to the split tier (same accuracy, one more MXU instruction/stage).
    """
    if np.dtype(dtype) != np.complex64:
        return False
    if n < 4:
        return False
    return _vmem_bytes(n, 64, variant, "bf16x3") <= config.pallas_vmem_limit


def _kernel_gauss(n, npad, precision, xr_ref, xi_ref, wr_hi_ref, wr_lo_ref,
                  wi_hi_ref, wi_lo_ref, ws_hi_ref, ws_lo_ref,
                  or_ref, oi_ref):
    """(bt, n) pair -> (bt, n) pair: out = x @ W_n, 3-multiply complex."""
    xr = xr_ref[:]
    xi = xi_ref[:]
    if npad != n:
        pad = jnp.zeros((xr.shape[0], npad - n), jnp.float32)
        xr = jnp.concatenate([xr, pad], axis=1)
        xi = jnp.concatenate([xi, pad], axis=1)
    # cat tiers ship transposed tables (w_split concatenates along axis 1)
    dims = ((((1,), (1,)) if precision in CAT_TIERS else ((1,), (0,))), ((), ()))
    p1 = _contract(xr, wr_hi_ref[:], wr_lo_ref[:], dims, precision)
    p2 = _contract(xi, wi_hi_ref[:], wi_lo_ref[:], dims, precision)
    p3 = _contract(xr + xi, ws_hi_ref[:], ws_lo_ref[:], dims, precision)
    or_ref[:] = (p1 - p2)[:, :n]
    oi_ref[:] = (p3 - p1 - p2)[:, :n]


def _kernel_block(n, npad, precision, xr_ref, xi_ref, wh_ref, wl_ref,
                  or_ref, oi_ref):
    """Single block-GEMM variant: [xr xi] @ [[Wr, Wi], [-Wi, Wr]]."""
    xr = xr_ref[:]
    xi = xi_ref[:]
    if npad != n:
        pad = jnp.zeros((xr.shape[0], npad - n), jnp.float32)
        xr = jnp.concatenate([xr, pad], axis=1)
        xi = jnp.concatenate([xi, pad], axis=1)
    xb = jnp.concatenate([xr, xi], axis=1)  # (bt, 2*npad)
    dims = ((((1,), (1,)) if precision in CAT_TIERS else ((1,), (0,))), ((), ()))
    d = _contract(xb, wh_ref[:], wl_ref[:], dims, precision)  # (bt, 2*npad)
    or_ref[:] = d[:, :n]
    oi_ref[:] = d[:, npad : npad + n]


def make_dense_fft_fn(
    n: int,
    direction: FftDirection,
    dtype,
    interpret: bool = False,
    precision=None,
    variant: Optional[str] = None,
    batch_tile: Optional[int] = None,
    pack: Optional[int] = None,
    aligned: bool = False,
    in_place: bool = False,
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n): unnormalized DFT via one
    dense MXU matmul per batch tile (reference semantics: algorithm/dft.rs).

    pack: transforms per lane row via block-diagonal weights (default
    _pack_group: fills the 128-lane vreg for n < 128).
    aligned: pad rows to the 128-lane multiple in XLA *outside* the kernel
    so every block spec is lane-aligned and the kernel does no in-kernel
    lane concat/slice — the compile-safe fallback if Mosaic rejects the
    whole-dim lane-block form at misaligned n (costs one extra pad copy)."""
    assert np.dtype(dtype) == np.complex64, "dense kernel is c64 only"
    g = pack or _pack_group(n)
    L = g * n  # packed row length
    npad = _n_pad(L)
    # round-4 hardware crossovers (tools/perf_dense.py, f32-grade rows):
    # the 4-mult block form wins while the packed row fits 2 vregs (n=128:
    # 966 vs gauss 765; 256: 918 vs 666 GF/s); the 3-mult gauss form wins
    # above (500: 560 vs 466, 512: 578 vs 467, 1009: 349 vs 273) — fewer
    # bf16 passes once the (2npad)^2 tables stop fitting comfortably.
    if variant is None:
        variant = (
            choose_variant(n) if pack is None
            else ("block" if npad <= 256 else "gauss")
        )
    if batch_tile is None:
        # bt=64 edges bt=128 for fat rows (1009: 349 vs 330, 1234: 316 vs
        # 282, 2003: 210 vs 196); bt=128 wins below (128: 966 vs 514)
        batch_tile = 64 if npad >= 1024 else 128
    if precision is None and config.pallas_precision in ("bf16x3", "bf16x3s"):
        # per-variant measured best at f32-grade accuracy: the block form
        # loses hard under the cat tier (128: 703 vs 966; 256: 570 vs 918
        # — the transposed cat tables break its single-GEMM layout), gauss
        # ties or wins under cat (729: 544 vs 372 at misaligned rows)
        precision = "bf16x3" if variant == "block" else "bf16x3s"
    # cat-tier tables are 1.5x the split pair; drop to the split twin when
    # they would exceed the VMEM budget (hardware OOM at n=2003 otherwise:
    # 3 single-buffered bf16 (2048, 6144) tables = 72MB + windows > 128MB)
    if (
        precision in CAT_TIERS
        and _vmem_bytes(L, batch_tile or 64, variant, precision)
        > config.pallas_vmem_limit
    ):
        precision = {"bf16x3s": "bf16x3", "bf16x2s": "bf16x2"}[precision]
    precision = resolve_precision(precision, interpret)
    Lk = npad if aligned else L  # kernel-visible row length

    w = twiddles.dft_matrix(n, direction)  # (n, n) complex, w[j, k]
    wp = np.zeros((npad, npad), np.complex128)
    for i in range(g):
        wp[i * n : (i + 1) * n, i * n : (i + 1) * n] = w

    cat_t = (lambda m: m.T) if precision in CAT_TIERS else (lambda m: m)
    if variant == "gauss":
        wr = np.ascontiguousarray(wp.real).astype(np.float32)
        wi = np.ascontiguousarray(wp.imag).astype(np.float32)
        tables = [
            t
            for m in (wr, wi, wr + wi)
            for t in w_split(cat_t(m), precision)
        ]
        kernel = functools.partial(_kernel_gauss, Lk, npad, precision)
    else:
        top = np.concatenate([wp.real, wp.imag], axis=1)
        bot = np.concatenate([-wp.imag, wp.real], axis=1)
        wb = np.concatenate([top, bot], axis=0).astype(np.float32)  # (2np, 2np)
        tables = list(w_split(cat_t(wb), precision))
        kernel = functools.partial(_kernel_block, Lk, npad, precision)

    cparams = pltpu.CompilerParams(vmem_limit_bytes=config.pallas_vmem_limit)

    def const_spec(t):
        return pl.BlockSpec(
            t.shape, i32map(lambda i: (0, 0)), memory_space=pltpu.VMEM
        )

    def run(xr, xi, bt):
        rows = xr.shape[0]
        bspec = pl.BlockSpec(
            (bt, Lk), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(rows // bt,),
            in_specs=[bspec, bspec] + [const_spec(t) for t in tables],
            out_specs=[bspec, bspec],
            out_shape=[jax.ShapeDtypeStruct((rows, Lk), jnp.float32)] * 2,
            # in/out share the (bt, Lk) block and index map, so aliasing is
            # always legal; it halves the HBM page working set (measured
            # +24% for the aliased two-stage kernel, tools/perf_dma2.py).
            # For padded/packed sizes the operand is an XLA temp (the pad
            # copy), so the alias donates for free even single-shot.
            input_output_aliases={0: 0, 1: 1} if in_place else {},
            compiler_params=cparams,
            interpret=interpret,
        )(xr, xi, *[jnp.asarray(t) for t in tables])

    def apply(x):
        xr, xi = x
        shape = xr.shape
        flat_r = xr.reshape(-1, n)
        flat_i = xi.reshape(-1, n)
        batch = flat_r.shape[0]
        bt = batch_tile
        # pack g transforms per row (free reshape: rows are contiguous),
        # then pad the packed-row count to the batch tile
        pad = (-batch) % (g * bt)
        if pad:
            flat_r = jnp.pad(flat_r, ((0, pad), (0, 0)))
            flat_i = jnp.pad(flat_i, ((0, pad), (0, 0)))
        rows = (batch + pad) // g
        flat_r = flat_r.reshape(rows, L)
        flat_i = flat_i.reshape(rows, L)
        if aligned and npad != L:
            flat_r = jnp.pad(flat_r, ((0, 0), (0, npad - L)))
            flat_i = jnp.pad(flat_i, ((0, 0), (0, npad - L)))
        out_r, out_i = run(flat_r, flat_i, bt)
        if aligned and npad != L:
            out_r = out_r[:, :L]
            out_i = out_i[:, :L]
        out_r = out_r.reshape(-1, n)
        out_i = out_i.reshape(-1, n)
        if pad:
            out_r = out_r[:batch]
            out_i = out_i[:batch]
        return out_r.reshape(shape), out_i.reshape(shape)

    return apply
