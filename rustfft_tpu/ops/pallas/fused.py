"""Fused two-stage FFT kernel: whole transform in VMEM, one HBM pass.

For n = p*q (p, q <= 512), the four-step decomposition (ops/ct.py derivation)
runs entirely inside one Pallas kernel per batch tile:

    load (TB, p, q) -> DFT_p over the sublane axis (MXU) -> twiddle (VPU)
    -> DFT_q over the lane axis (MXU) -> one VMEM transpose -> store (TB, q, p)

Complex arithmetic is carried in block form (calg.block_mid/block_last): one
real GEMM per stage with doubled contraction dims.  Stage 1 contracts the
sublane (j1) axis directly via dot_general — the MXU natively contracts the
rhs sublane dimension, so no input transpose is needed; stage 2 contracts the
lane (j2) axis as a plain right-matmul with all leading axes folded into GEMM
rows.  The single remaining transpose puts the output in natural ascending-
frequency order k = k2*p + k1.  Each transform therefore costs exactly one
HBM read + one HBM write — the memory-bound speed of light for a batched FFT
— plus MXU work of 8(p+q) flops/element.

This kernel replaces a chain of XLA einsum stages that would each round-trip
HBM (the XLA-level path remains as the fallback and the CPU path).

Reference counterpart: the AVX "butterfly-with-scratch" kernels that keep
64..512-point FFTs entirely in registers (avx32_butterflies.rs:118-244), and
the mixedradix_transpose! packed writebacks (avx_mixed_radix.rs:427-530).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...common import FftDirection
from ...config import config
from ... import twiddles
from .. import calg

from .util import i32map

#: largest fused transform: p, q <= 512 with the constant tables (two DFT
#: blocks + twiddle table) and a (TB, n) tile within the 16MB VMEM.
MAX_FUSED_N = 512 * 512

#: factor cap.  512 keeps the (2f)^2 f32 DFT blocks at 4MB; the split chooser
#: only reaches it when nothing smaller divides n.
MAX_FACTOR = 512


def fused_supported(n: int, dtype) -> bool:
    """Fused kernel applies to c64 on TPU backends for factorable sizes."""
    if np.dtype(dtype) != np.complex64:
        return False
    if n < 4 or n > MAX_FUSED_N:
        return False
    return _choose_pq(n) is not None


def _choose_pq(n: int) -> Optional[Tuple[int, int]]:
    """Split n = p*q with p, q <= MAX_FACTOR, tuned for the kernel's GEMMs.

    Stage 1 is a per-batch-row GEMM with N = q lanes, so q wants to be a
    multiple (ideally exactly a small multiple) of the 128-wide MXU; stage 2
    has N = 2q and M = rows, both fine for any q >= 64.  Preference order:
    q a multiple of 128 with the smallest |p - q| imbalance, then largest
    lane-multiple of 8, then any valid split.
    """
    best = None
    for p in range(2, MAX_FACTOR + 1):
        if n % p:
            continue
        q = n // p
        if q > MAX_FACTOR:
            continue
        # VMEM feasibility: constant tables + one tb=1 tile's ~16 live copies
        # must fit the VMEM budget (rejects e.g. 512x512 under small budgets).
        consts = 4 * (4 * p * p + 4 * q * q + 2 * p * q)
        if consts + 16 * 4 * n > int(config.pallas_vmem_limit * 0.9):
            continue
        # rank: q % 128 == 0 best, then q % 8 == 0, then rest; tie-break on
        # balance (small p+q = least MXU flops: 8(p+q) flops/elem)
        rank = 0 if q % 128 == 0 else (1 if q % 8 == 0 else 2)
        key = (rank, p + q, abs(p - q))
        if best is None or key < best[0]:
            best = (key, p, q)
    if best is None:
        return None
    _, p, q = best
    return p, q


def _pick_batch_tile(batch: int, p: int, q: int, copies: int = 16) -> int:
    """Choose TB so the kernel's working set fits the VMEM budget.

    Live f32 copies of the (TB, p, q) tile: in r/i + concat (4), stage-1 out
    (2), twiddled (2), stage-2 concat + out (4), transposed out + Mosaic
    double-buffered io (4) — ~16 copies plus the constant tables.  Cat
    precision tiers add the bf16 x_cat temp per stage (~3 f32-equivalents).
    """
    n = p * q
    consts = 4 * (4 * p * p + 4 * q * q + 2 * p * q)
    budget = int(config.pallas_vmem_limit * 0.8) - consts
    per_row = copies * 4 * n
    tb = max(1, budget // per_row)
    tb = 1 << (tb.bit_length() - 1)  # floor to a power of two
    # cap: tiles beyond 128 rows gain nothing (grid-step overhead is already
    # amortized) and very large tiles have failed Mosaic compiles
    return max(1, min(tb, 128, batch))


#: precision tiers emulated with manual bf16 splits inside Pallas kernels.
#: bf16x3 = f32-grade (3 MXU passes); bf16x2 drops the x_lo@w_hi pass
#: (~1e-4-grade, 2 passes, and the per-tile x_lo split is never computed);
#: bf16 = single pass (~1e-3-grade).  The reference's 0.1 mean-error
#: tolerance (accuracy.rs:30-37) clears all three by orders of magnitude.
BF16_TIERS = ("bf16x3", "bf16x2", "bf16")

#: single-dot ("cat") tiers: the SAME terms as the matching multi-dot tier,
#: but issued as ONE MXU dot over a concatenated contraction axis —
#: w_cat = [w_hi | w_lo | w_hi] against x_cat = [x_hi ; x_hi ; x_lo].
#: Identical accuracy to bf16x3/bf16x2 (term-for-term the same products,
#: f32 MXU accumulation), at 1 MXU instruction per stage instead of 3/2 and
#: zero f32 output adds.  For contraction widths K with 3K <= 128 (all
#: lanepack butterfly stages) the concatenated dot costs the SAME single
#: MXU K-pass as ONE of the three dots it replaces — the small-n band is
#: op-count-bound (CLAUDE.md anatomy), so this is the designed attack on it.
#: Values: maps tier name -> number of bf16 passes represented.
CAT_TIERS = {"bf16x3s": 3, "bf16x2s": 2}


def _split_bf16(w: np.ndarray):
    """Split an f32 matrix into (hi, lo) bf16 parts with w ~= hi + lo."""
    hi = w.astype(np.float32).astype(jnp.bfloat16)
    lo = (w.astype(np.float32) - np.asarray(hi).astype(np.float32)).astype(
        jnp.bfloat16
    )
    return np.asarray(hi), np.asarray(lo)


def w_split(w: np.ndarray, precision):
    """(hi, lo) weight-table pair for a kernel precision tier.

    bf16 tiers ship true splits; XLA Precision tiers ship (f32, tiny-dummy)
    — the lo half is unused but keeps kernel signatures uniform.
    """
    if precision in CAT_TIERS:
        # one concatenated-K table in the hi slot; the lo slot ships a
        # minimal VREG-shaped dummy (Mosaic rejects sub-(8, 128) blocks)
        return w_cat(w, precision), np.zeros((8, 128), np.float32)
    if precision in BF16_TIERS:
        return _split_bf16(w)
    return w, np.zeros_like(w, dtype=jnp.bfloat16)


def w_cat(w: np.ndarray, precision) -> np.ndarray:
    """Concatenated-K weight table for the single-dot cat tiers.

    w is a (out, K) matrix contracted along axis 1 (every kernel's
    convention except dense.py, which transposes for cat).  Returns
    (out, 3K) [w_hi | w_lo | w_hi] for bf16x3s, (out, 2K) for bf16x2s.
    """
    hi, lo = _split_bf16(np.ascontiguousarray(w))
    blocks = [hi, lo, hi] if CAT_TIERS[precision] == 3 else [hi, lo]
    return np.concatenate(blocks, axis=1)


def w_cat_pair(wA: np.ndarray, wB: np.ndarray, precision) -> np.ndarray:
    """Concatenated-K table merging the complex PAIR contraction too.

    For weights-as-lhs kernels that currently compute
    dot(wA, xr) + dot(wB, xi) (wA/wB the K-halves of a block DFT matrix),
    the merged table [wA_hi|wA_lo|wA_hi|wB_hi|wB_lo|wB_hi] against
    x_cat = [xr_hi;xr_hi;xr_lo;xi_hi;xi_hi;xi_lo] computes the whole
    complex bf16x3 stage in ONE dot (6 dots + 5 f32 adds otherwise).
    """
    wA_hi, wA_lo = _split_bf16(np.ascontiguousarray(wA))
    wB_hi, wB_lo = _split_bf16(np.ascontiguousarray(wB))
    if CAT_TIERS[precision] == 3:
        blocks = [wA_hi, wA_lo, wA_hi, wB_hi, wB_lo, wB_hi]
    else:
        blocks = [wA_hi, wA_lo, wB_hi, wB_lo]
    return np.concatenate(blocks, axis=1)


def _cat_single(x: jnp.ndarray, cdim: int, passes: int) -> jnp.ndarray:
    """[x_hi; x_hi; x_lo] (or [x_hi; x_hi]) along the contraction axis."""
    x_hi = x.astype(jnp.bfloat16)
    if passes == 3:
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        parts = [x_hi, x_hi, x_lo]
    else:
        parts = [x_hi, x_hi]
    return jnp.concatenate(parts, axis=cdim)


def _cat_pair(xr, xi, cdim: int, passes: int) -> jnp.ndarray:
    """Pair form: [xr_hi;xr_hi;xr_lo;xi_hi;xi_hi;xi_lo] along cdim."""
    xr_hi = xr.astype(jnp.bfloat16)
    xi_hi = xi.astype(jnp.bfloat16)
    if passes == 3:
        xr_lo = (xr - xr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        xi_lo = (xi - xi_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        parts = [xr_hi, xr_hi, xr_lo, xi_hi, xi_hi, xi_lo]
    else:
        parts = [xr_hi, xr_hi, xi_hi, xi_hi]
    return jnp.concatenate(parts, axis=cdim)


def resolve_precision(precision, interpret: bool):
    """Config default + interpret-mode substitution, shared by all kernels.

    Under the Pallas interpreter the dots lower through XLA, whose dot
    merger re-fuses the manual bf16 passes and cancels the correction terms
    (plain-bf16 accuracy on bf16-native backends) — substitute true f32
    there (interpret mode is for testing, not speed).
    """
    if precision is None:
        precision = config.pallas_precision
    if interpret and precision in BF16_TIERS:
        return jax.lax.Precision.HIGHEST
    # cat tiers survive interpret mode: the hi/lo parts are CONCATENATED
    # DATA inside one dot, so XLA's dot merger has nothing to re-fuse or
    # cancel — interpret-mode accuracy tests of cat tiers are faithful.
    return precision


def _dot3(x: jnp.ndarray, w_hi, w_lo, dims):
    """bf16x3 contraction: f32-grade accuracy from three bf16 MXU passes.

    x = x_hi + x_lo (exact bf16 split); w arrives pre-split host-side.
    x @ w ~= x_hi@w_hi + x_hi@w_lo + x_lo@w_hi — the dropped lo@lo term is
    O(2^-16) relative.  This is the manual version of XLA's HIGHEST f32
    emulation at half the passes (Mosaic rejects Precision.HIGH in-kernel).

    Mosaic-only: lowered through XLA (interpret mode / CPU) the dot merger
    re-fuses the hi/lo passes and cancels the correction terms — callers
    substitute Precision.HIGHEST there.
    """
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32)
    return (
        jax.lax.dot_general(x_hi, w_hi, dims, **kw)
        + jax.lax.dot_general(x_hi, w_lo, dims, **kw)
        + jax.lax.dot_general(x_lo, w_hi, dims, **kw)
    )


def _dot3_wlhs(w_hi, w_lo, x: jnp.ndarray, dims):
    """Weights-as-lhs twin of _dot3: out[k, ...] = sum_j w[k, j] x[..j..]."""
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32)
    return (
        jax.lax.dot_general(w_hi, x_hi, dims, **kw)
        + jax.lax.dot_general(w_lo, x_hi, dims, **kw)
        + jax.lax.dot_general(w_hi, x_lo, dims, **kw)
    )


def _dot2(x: jnp.ndarray, w_hi, w_lo, dims):
    """bf16x2: drop _dot3's x_lo@w_hi pass — the x_lo split is never
    computed, saving a VPU subtract/convert per tile as well as an MXU pass.
    Error ~2^-9 relative (x's dropped low bf16 bits)."""
    x_hi = x.astype(jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32)
    return (
        jax.lax.dot_general(x_hi, w_hi, dims, **kw)
        + jax.lax.dot_general(x_hi, w_lo, dims, **kw)
    )


def _dot2_wlhs(w_hi, w_lo, x: jnp.ndarray, dims):
    x_hi = x.astype(jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32)
    return (
        jax.lax.dot_general(w_hi, x_hi, dims, **kw)
        + jax.lax.dot_general(w_lo, x_hi, dims, **kw)
    )


def contract_rhs(x, w_hi, w_lo, dims, precision):
    """Precision-dispatching contraction with x as lhs (shared by kernels)."""
    if precision in CAT_TIERS:
        # w_hi holds the concatenated-K table (w_split); w_lo is unused
        assert dims[0][1] == (1,), (
            "cat tiers need the weight contracted along axis 1; "
            f"got dims {dims}"
        )
        x_cat = _cat_single(x, dims[0][0][0], CAT_TIERS[precision])
        return jax.lax.dot_general(
            x_cat, w_hi, dims, preferred_element_type=jnp.float32
        )
    if precision == "bf16x3":
        return _dot3(x, w_hi, w_lo, dims)
    if precision == "bf16x2":
        return _dot2(x, w_hi, w_lo, dims)
    if precision == "bf16":
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w_hi, dims,
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        x, w_hi, dims, preferred_element_type=jnp.float32, precision=precision
    )


def contract_wlhs(w_hi, w_lo, x, dims, precision):
    """Precision-dispatching contraction with the weights as lhs."""
    if precision in CAT_TIERS:
        assert dims[0][0] == (1,), (
            "cat tiers need the weight contracted along axis 1; "
            f"got dims {dims}"
        )
        x_cat = _cat_single(x, dims[0][1][0], CAT_TIERS[precision])
        return jax.lax.dot_general(
            w_hi, x_cat, dims, preferred_element_type=jnp.float32
        )
    if precision == "bf16x3":
        return _dot3_wlhs(w_hi, w_lo, x, dims)
    if precision == "bf16x2":
        return _dot2_wlhs(w_hi, w_lo, x, dims)
    if precision == "bf16":
        return jax.lax.dot_general(
            w_hi, x.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        w_hi, x, dims, preferred_element_type=jnp.float32, precision=precision
    )


def contract_pair(xr, xi, wA, wB, dims, precision):
    """Complex-pair contraction without materializing the [re; im] concat.

    Computes dot(xr, wA) + dot(xi, wB) where (wA, wB) are the two K-halves
    of a block DFT matrix — the same result as concatenating [xr; xi] along
    the contraction axis and contracting the full block, minus two whole-tile
    VMEM copies.  wA/wB arrive as (hi, lo) pairs like everywhere else.
    """
    (wA_hi, wA_lo), (wB_hi, wB_lo) = wA, wB
    return contract_rhs(xr, wA_hi, wA_lo, dims, precision) + contract_rhs(
        xi, wB_hi, wB_lo, dims, precision
    )


def contract_pair_cat_wlhs(w_pair_cat, xr, xi, cdim, precision):
    """Whole complex-pair bf16 stage as ONE weights-as-lhs MXU dot.

    w_pair_cat: host table from w_cat_pair() — (out, 6K) for bf16x3s.
    Contracts x's axis cdim (a sublane/leading axis: lane-dim concats are
    illegal in VMEM, sublane concats are cheap).
    """
    x_cat = _cat_pair(xr, xi, cdim, CAT_TIERS[precision])
    dims = (((1,), (cdim,)), ((), ()))
    return jax.lax.dot_general(
        w_pair_cat, x_cat, dims, preferred_element_type=jnp.float32
    )


def contract_pair_cat_rhs(w_pair_cat, xr, xi, cdim, precision):
    """Complex-pair bf16 stage as ONE x-as-lhs MXU dot (sublane contraction).

    The rhs twin of contract_pair_cat_wlhs: x_cat = [xr_hi;xr_hi;xr_lo;
    xi_hi;xi_hi;xi_lo] along cdim, contracted against w_cat_pair's (out, 6K)
    table.  Output appends the w out-axis as the LAST (lane) axis — the
    proven layout of the two-stage kernels' stage-1 contraction, minus the
    f32 [xr; xi] concat those kernels materialize.
    """
    x_cat = _cat_pair(xr, xi, cdim, CAT_TIERS[precision])
    dims = (((cdim,), (1,)), ((), ()))
    return jax.lax.dot_general(
        x_cat, w_pair_cat, dims, preferred_element_type=jnp.float32
    )


def _fused_kernel(p, q, tb, precision, variant, xr_ref, xi_ref, wp_hi_ref,
                  wp_lo_ref, wq_hi_ref, wq_lo_ref, twr_ref, twi_ref,
                  or_ref, oi_ref):
    """One batch tile: (tb*p, q) [j1, j2] -> (tb*q, p) [k2, k1] natural order.

    Blocks arrive 2D (measurably faster DMA than 3D blocks) and are reshaped
    along leading dims in VMEM (lane dim untouched — the Mosaic-legal cast).

    wp/wq: block_mid DFT blocks (2f, 2f), each as a (hi, lo) pair — bf16
    splits for precision='bf16x3', (f32, unused-zeros) otherwise.
    twr/twi: inter-stage twiddle w_n^(k1*j2) as (q, p) tables.
    """
    sub_dims = (((1,), (1,)), ((), ()))

    def contract(x, w_hi_ref, w_lo_ref):
        return contract_rhs(x, w_hi_ref[:], w_lo_ref[:], sub_dims, precision)

    xr = xr_ref[:].reshape(tb, p, q)
    xi = xi_ref[:].reshape(tb, p, q)

    # stage 1: DFT_p over the sublane (j1) axis.  dot_general contracts the
    # rhs sublane dim natively on the MXU: a[b, k, j2] = sum_j wp[k, j] x[b, j, j2]
    xb = jnp.concatenate([xr, xi], axis=1)  # (tb, 2p, q)
    a = contract(xb, wp_hi_ref, wp_lo_ref)  # (tb, q, 2p): [j2 sub, k1 lanes]

    ar = a[:, :, :p]
    ai = a[:, :, p:]

    # inter-stage twiddle w_n^(k1*j2); tables arrive as (q, p) = [j2, k1]
    twr = twr_ref[:]
    twi = twi_ref[:]
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr  # (tb, q, p) [j2, k1]

    # stage 2: DFT_q over the j2 axis, now in sublanes
    bb = jnp.concatenate([br, bi], axis=1)  # (tb, 2q, p)
    if variant == "wlhs":
        # weights-as-lhs keeps the lane axis (k1) untouched; output arrives
        # (2q, tb, p) [k2, b, k1] and a lane-preserving leading permute puts
        # it in natural order — no lane<->sublane transpose anywhere.
        d = contract_wlhs(wq_hi_ref[:], wq_lo_ref[:], bb, sub_dims, precision)
        d = jnp.transpose(d, (1, 0, 2))  # (tb, 2q, p) [b, k2, k1]
        or_ref[:] = d[:, :q, :].reshape(tb * q, p)
        oi_ref[:] = d[:, q:, :].reshape(tb * q, p)
        return

    d = contract(bb, wq_hi_ref, wq_lo_ref)  # (tb, p, 2q): [k1 sub, k2 lanes]
    dr = d[:, :, :q]
    di = d[:, :, q:]

    if variant == "transpose_in_kernel":
        # natural order k = k2*p + k1: emit (tb*q, p)
        or_ref[:] = jnp.swapaxes(dr, -1, -2).reshape(tb * q, p)
        oi_ref[:] = jnp.swapaxes(di, -1, -2).reshape(tb * q, p)
    else:  # "transpose_outside": emit [k1, k2]; caller transposes in XLA
        or_ref[:] = dr.reshape(tb * p, q)
        oi_ref[:] = di.reshape(tb * p, q)


def _fused_kernel_gauss(p, q, tb, precision, transpose_in, xr_ref, xi_ref,
                        wp0, wp1, wp2, wp3, wp4, wp5, wq0, wq1, wq2, wq3,
                        wq4, wq5, twr_ref, twi_ref, or_ref, oi_ref):
    """Two-stage kernel with Gauss 3-multiplication complex GEMMs.

    Same math as _fused_kernel; each stage runs 3 real dots of K = p
    (P1 = xr@Wr, P2 = xi@Wi, P3 = (xr+xi)@(Wr+Wi)) instead of one block
    dot of K = 2p — 25% less MXU work, and the probe ladder shows GEMM
    time is the visible increment while elementwise ops ride free
    (tools/perf_anatomy.py).
    """
    dims = (((1,), (1,)), ((), ()))
    xr = xr_ref[:].reshape(tb, p, q)
    xi = xi_ref[:].reshape(tb, p, q)

    # stage 1: DFT_p over the sublane j1 axis
    ar, ai = gauss_contract(
        xr, xi, (wp0, wp1, wp2, wp3, wp4, wp5), dims, precision
    )  # (tb, q, p) [j2, k1]

    twr = twr_ref[:]
    twi = twi_ref[:]
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr

    # stage 2: DFT_q over the j2 axis (sublane)
    dr, di = gauss_contract(
        br, bi, (wq0, wq1, wq2, wq3, wq4, wq5), dims, precision
    )  # (tb, p, q) [k1, k2]
    if transpose_in:
        or_ref[:] = jnp.swapaxes(dr, -1, -2).reshape(tb * q, p)
        oi_ref[:] = jnp.swapaxes(di, -1, -2).reshape(tb * q, p)
    else:
        or_ref[:] = dr.reshape(tb * p, q)
        oi_ref[:] = di.reshape(tb * p, q)


def _fused_kernel_twodot(p, q, tb, precision, transpose_in, xr_ref, xi_ref,
                         wpA_hi_ref, wpA_lo_ref, wpB_hi_ref, wpB_lo_ref,
                         wqA_hi_ref, wqA_lo_ref, wqB_hi_ref, wqB_lo_ref,
                         twr_ref, twi_ref, or_ref, oi_ref):
    """Concat-free variant: each stage is two half-K dots (contract_pair).

    Same math as _fused_kernel; saves two whole-tile VMEM copies per stage.
    """
    sub_dims = (((1,), (1,)), ((), ()))
    xr = xr_ref[:].reshape(tb, p, q)
    xi = xi_ref[:].reshape(tb, p, q)

    # stage 1: DFT_p over sublane j1 -> (tb, q, 2p) [j2, k1]
    a = contract_pair(
        xr, xi,
        (wpA_hi_ref[:], wpA_lo_ref[:]),
        (wpB_hi_ref[:], wpB_lo_ref[:]),
        sub_dims, precision,
    )
    ar = a[:, :, :p]
    ai = a[:, :, p:]
    twr = twr_ref[:]
    twi = twi_ref[:]
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr  # (tb, q, p) [j2, k1]

    # stage 2: DFT_q over sublane j2 -> (tb, p, 2q) [k1, k2]
    d = contract_pair(
        br, bi,
        (wqA_hi_ref[:], wqA_lo_ref[:]),
        (wqB_hi_ref[:], wqB_lo_ref[:]),
        sub_dims, precision,
    )
    dr = d[:, :, :q]
    di = d[:, :, q:]
    if transpose_in:
        or_ref[:] = jnp.swapaxes(dr, -1, -2).reshape(tb * q, p)
        oi_ref[:] = jnp.swapaxes(di, -1, -2).reshape(tb * q, p)
    else:
        or_ref[:] = dr.reshape(tb * p, q)
        oi_ref[:] = di.reshape(tb * p, q)


def make_fused_two_stage_fn(
    n: int,
    direction: FftDirection,
    dtype,
    split: Optional[Tuple[int, int]] = None,
    interpret: bool = False,
    precision=None,
    variant: Optional[str] = None,
    batch_tile: Optional[int] = None,
    in_place: bool = False,
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n) running the fused kernel.

    in_place=True aliases the input HBM buffers to the outputs
    (pl.pallas_call input_output_aliases) — the reference's in-place
    execution model (lib.rs:195-211).  Only legal for square splits
    (p == q, so in/out blocks share a shape) with the in-kernel transpose.
    XLA inserts a defensive copy unless the caller donates the operands
    (jit donate_argnums / a loop carry), which is exactly when it pays:
    aliased streaming measured ~0.8x of the stream bound on v5e.
    """
    assert np.dtype(dtype) == np.complex64, "fused kernel is c64/f32 only"
    pq = split or _choose_pq(n)
    assert pq is not None, f"no fused split for n={n}"
    p, q = pq
    if in_place:
        assert p == q, f"in_place fused kernel needs a square split, got {pq}"
        variant = variant or "transpose_in_kernel"
    if variant is None:
        # measured on v5e: the in-kernel lane transpose only compiles/wins
        # when the output lane dim p fills the 128-wide VPU; otherwise let
        # XLA do the final (batch, p, q) -> (batch, q, p) transpose.
        variant = "transpose_in_kernel" if p >= 128 else "transpose_outside"
    rdt = np.float32
    precision = resolve_precision(precision, interpret)

    # Both stages contract the sublane axis against a block_mid DFT block
    # ([[Wr,-Wi],[Wi,Wr]]): stage 1 for DFT_p, stage 2 for DFT_q.
    wp = calg.block_mid(twiddles.dft_matrix(p, direction), rdt)  # (2p, 2p)
    wq = calg.block_mid(twiddles.dft_matrix(q, direction), rdt)  # (2q, 2q)
    wp_hi, wp_lo = w_split(wp, precision)
    wq_hi, wq_lo = w_split(wq, precision)
    tw = twiddles.twiddle_table(p, q, direction).T  # (q, p) = [j2, k1]
    twr = np.ascontiguousarray(tw.real).astype(rdt)
    twi = np.ascontiguousarray(tw.imag).astype(rdt)

    # "twodot"/"gauss"/"wlhs"/"transpose_in_kernel" emit natural-order
    # (tb*q, p) (twodot/gauss only when p fills the VPU lanes, mirroring
    # the default rule)
    twodot = variant == "twodot"
    gauss = variant == "gauss"
    transpose_in_kernel = (
        (twodot or gauss) and p >= 128
        or variant == "transpose_in_kernel"
        or variant == "wlhs"
    )
    if gauss:
        # Gauss 3-dot tables: plain (not block) DFT matrices per stage
        consts = gauss_tables(twiddles.dft_matrix(p, direction), precision)
        consts += gauss_tables(twiddles.dft_matrix(q, direction), precision)
        consts.extend((twr, twi))
    elif twodot:
        # half-K blocks: stage contraction = dot(xr, wA) + dot(xi, wB)
        consts = []
        for w in (wp[:, :p], wp[:, p:], wq[:, :q], wq[:, q:]):
            consts.extend(w_split(np.ascontiguousarray(w), precision))
        consts.extend((twr, twi))
    else:
        consts = [wp_hi, wp_lo, wq_hi, wq_lo, twr, twi]

    def call(xr, xi, tb):
        batch = xr.shape[0]
        grid = batch // tb
        if gauss:
            kernel = functools.partial(
                _fused_kernel_gauss, p, q, tb, precision, transpose_in_kernel
            )
        elif twodot:
            kernel = functools.partial(
                _fused_kernel_twodot, p, q, tb, precision, transpose_in_kernel
            )
        else:
            kernel = functools.partial(_fused_kernel, p, q, tb, precision, variant)
        # 2D blocks: measurably faster DMA than equivalent 3D blocks
        out_block = (tb * q, p) if transpose_in_kernel else (tb * p, q)
        in_bspec = pl.BlockSpec((tb * p, q), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)
        out_bspec = pl.BlockSpec(out_block, i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)

        def const_spec(w):
            return pl.BlockSpec(w.shape, i32map(lambda i: (0, 0)), memory_space=pltpu.VMEM)

        out_r, out_i = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[in_bspec, in_bspec] + [const_spec(w) for w in consts],
            out_specs=[out_bspec, out_bspec],
            out_shape=[
                jax.ShapeDtypeStruct((grid * out_block[0], out_block[1]), jnp.float32),
                jax.ShapeDtypeStruct((grid * out_block[0], out_block[1]), jnp.float32),
            ],
            input_output_aliases={0: 0, 1: 1} if in_place else {},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=config.pallas_vmem_limit
            ),
            interpret=interpret,
        )(
            xr.reshape(batch * p, q),
            xi.reshape(batch * p, q),
            *[jnp.asarray(w) for w in consts],
        )
        if not transpose_in_kernel:
            out_r = jnp.swapaxes(out_r.reshape(batch, p, q), -1, -2)
            out_i = jnp.swapaxes(out_i.reshape(batch, p, q), -1, -2)
        return out_r.reshape(batch, n), out_i.reshape(batch, n)

    def apply(x):
        xr, xi = x
        shape = xr.shape
        flat_r = xr.reshape(-1, n)
        flat_i = xi.reshape(-1, n)
        batch = flat_r.shape[0]
        copies = 19 if precision in CAT_TIERS else 16
        tb = batch_tile or _pick_batch_tile(batch, p, q, copies)
        pad = (-batch) % tb
        if pad:
            flat_r = jnp.pad(flat_r, ((0, pad), (0, 0)))
            flat_i = jnp.pad(flat_i, ((0, pad), (0, 0)))
        out_r, out_i = call(flat_r, flat_i, tb)
        if pad:
            out_r = out_r[:batch]
            out_i = out_i[:batch]
        return out_r.reshape(shape), out_i.reshape(shape)

    return apply


# ---------------------------------------------------------------------------
# Three-stage variant: n = p * q1 * q2, all inside one VMEM kernel.
#
# Cuts the MXU work from 8(p+q) to 8(p+q1+q2) flops/point — e.g. n=65536 goes
# from 8*512 (256x256 two-stage) to 8*176 (128 x 16x32), a 2.9x flop cut —
# while keeping the single HBM read + write.  Stage 1 contracts the sublane
# j1 axis exactly like the two-stage kernel; stages 2/3 run the length-q FFT
# over the *sublane* j2 axis as two weights-as-lhs contractions (the same
# scheme as large.py's kernel B), so the lane axis is never transposed.
# Reference counterpart: the layered radix stages of radix4.rs:146-164.
# ---------------------------------------------------------------------------


def choose_pqq_fused(n: int) -> Optional[Tuple[int, int, int]]:
    """Split n = p * (q1*q2), p and q1*q2 both lane-aligned (% 128 == 0),
    minimizing total MXU flops 8(p + q1 + q2)."""
    best = None
    for p in range(128, MAX_FACTOR + 1, 128):
        if n % p:
            continue
        q = n // p
        if q % 128 or q < 128:
            continue
        inner = None
        for q1 in range(2, 257):
            if q % q1:
                continue
            q2 = q // q1
            if q2 > 256:
                continue
            key = (q1 + q2, abs(q1 - q2))
            if inner is None or key < inner[0]:
                inner = (key, q1, q2)
        if inner is None:
            continue
        _, q1, q2 = inner
        consts = 4 * (
            4 * p * p + 4 * q1 * q1 + 4 * q2 * q2 + 2 * q * p + 2 * q1 * q2
        )
        if consts + 16 * 4 * n > int(config.pallas_vmem_limit * 0.9):
            continue
        key = (p + q1 + q2, abs(p - q))
        if best is None or key < best[0]:
            best = (key, p, q1, q2)
    if best is None:
        return None
    _, p, q1, q2 = best
    return p, q1, q2


def three_stage_supported(n: int, dtype) -> bool:
    if np.dtype(dtype) != np.complex64:
        return False
    return choose_pqq_fused(n) is not None


def _fused_kernel_3s(p, q1, q2, tb, precision, xr_ref, xi_ref, wp_hi_ref,
                     wp_lo_ref, w1_hi_ref, w1_lo_ref, w2_hi_ref, w2_lo_ref,
                     t1r_ref, t1i_ref, t2r_ref, t2i_ref, or_ref, oi_ref):
    """One batch tile: (tb*p, q) [j1, j2] -> (tb*q, p) [k2, k1] natural."""
    q = q1 * q2
    sub = (((1,), (1,)), ((), ()))

    xr = xr_ref[:].reshape(tb, p, q)
    xi = xi_ref[:].reshape(tb, p, q)

    # stage 1: DFT_p over the sublane j1 axis
    xb = jnp.concatenate([xr, xi], axis=1)  # (tb, 2p, q)
    a = contract_rhs(xb, wp_hi_ref[:], wp_lo_ref[:], sub, precision)
    ar, ai = a[:, :, :p], a[:, :, p:]  # (tb, q, p) [j2, k1]

    # outer twiddle w_n^(k1*j2), table (q, p)
    t1r, t1i = t1r_ref[:], t1i_ref[:]
    br = ar * t1r - ai * t1i
    bi = ar * t1i + ai * t1r

    # stage 2: DFT_q1 over the major digit of j2 = ja*q2 + jb
    br = br.reshape(tb, q1, q2, p)
    bi = bi.reshape(tb, q1, q2, p)
    bb = jnp.concatenate([br, bi], axis=1)  # (tb, 2q1, q2, p)
    c = contract_wlhs(
        w1_hi_ref[:], w1_lo_ref[:], bb, (((1,), (1,)), ((), ())), precision
    )  # (2q1, tb, q2, p) [ka, b, jb, k1]
    cr, ci = c[:q1], c[q1:]

    # inner twiddle w_q^(ka*jb), table (q1, q2) broadcast over batch & lanes
    t2r = t2r_ref[:].reshape(q1, 1, q2, 1)
    t2i = t2i_ref[:].reshape(q1, 1, q2, 1)
    dr = cr * t2r - ci * t2i
    di = cr * t2i + ci * t2r

    # stage 3: DFT_q2 over jb
    db = jnp.concatenate([dr, di], axis=2)  # (q1, tb, 2q2, p)
    e = contract_wlhs(
        w2_hi_ref[:], w2_lo_ref[:], db, (((1,), (2,)), ((), ())), precision
    )  # (2q2, q1, tb, p) [kb, ka, b, k1]
    er, ei = e[:q2], e[q2:]

    # lane-preserving leading permute -> (tb, kb, ka, p); flat k = (kb*q1+ka)*p + k1
    er = jnp.transpose(er, (2, 0, 1, 3))
    ei = jnp.transpose(ei, (2, 0, 1, 3))
    or_ref[:] = er.reshape(tb * q, p)
    oi_ref[:] = ei.reshape(tb * q, p)


def make_fused_three_stage_fn(
    n: int,
    direction: FftDirection,
    dtype,
    split: Optional[Tuple[int, int, int]] = None,
    interpret: bool = False,
    precision=None,
    batch_tile: Optional[int] = None,
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n), the 3-stage fused kernel."""
    assert np.dtype(dtype) == np.complex64, "fused kernel is c64/f32 only"
    pqq = split or choose_pqq_fused(n)
    assert pqq is not None, f"no 3-stage fused split for n={n}"
    p, q1, q2 = pqq
    q = q1 * q2
    assert p * q == n
    rdt = np.float32
    precision = resolve_precision(precision, interpret)

    wp = calg.block_mid(twiddles.dft_matrix(p, direction), rdt)
    w1 = calg.block_mid(twiddles.dft_matrix(q1, direction), rdt)
    w2 = calg.block_mid(twiddles.dft_matrix(q2, direction), rdt)
    wp_hi, wp_lo = w_split(wp, precision)
    w1_hi, w1_lo = w_split(w1, precision)
    w2_hi, w2_lo = w_split(w2, precision)
    t1 = twiddles.twiddle_table(p, q, direction).T  # (q, p) [j2, k1]
    t2 = twiddles.twiddle_table(q1, q2, direction)  # (q1, q2) [ka, jb]
    consts = [
        wp_hi, wp_lo, w1_hi, w1_lo, w2_hi, w2_lo,
        np.ascontiguousarray(t1.real).astype(rdt),
        np.ascontiguousarray(t1.imag).astype(rdt),
        np.ascontiguousarray(t2.real).astype(rdt),
        np.ascontiguousarray(t2.imag).astype(rdt),
    ]

    def call(xr, xi, tb):
        batch = xr.shape[0]
        grid = batch // tb
        kernel = functools.partial(_fused_kernel_3s, p, q1, q2, tb, precision)
        in_bspec = pl.BlockSpec((tb * p, q), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)
        out_bspec = pl.BlockSpec((tb * q, p), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)

        def cspec(w):
            return pl.BlockSpec(w.shape, i32map(lambda i: (0, 0)), memory_space=pltpu.VMEM)

        out_r, out_i = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[in_bspec, in_bspec] + [cspec(w) for w in consts],
            out_specs=[out_bspec, out_bspec],
            out_shape=[jax.ShapeDtypeStruct((batch * q, p), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=config.pallas_vmem_limit
            ),
            interpret=interpret,
        )(
            xr.reshape(batch * p, q),
            xi.reshape(batch * p, q),
            *[jnp.asarray(w) for w in consts],
        )
        return out_r.reshape(batch, n), out_i.reshape(batch, n)

    def apply(x):
        xr, xi = x
        shape = xr.shape
        flat_r = xr.reshape(-1, n)
        flat_i = xi.reshape(-1, n)
        batch = flat_r.shape[0]
        tb = batch_tile or _pick_batch_tile(batch, p, q)
        pad = (-batch) % tb
        if pad:
            flat_r = jnp.pad(flat_r, ((0, pad), (0, 0)))
            flat_i = jnp.pad(flat_i, ((0, pad), (0, 0)))
        out_r, out_i = call(flat_r, flat_i, tb)
        if pad:
            out_r = out_r[:batch]
            out_i = out_i[:batch]
        return out_r.reshape(shape), out_i.reshape(shape)

    return apply


# ---------------------------------------------------------------------------
# Radix-r variant: n = r * p * q with the two dense DFT stages (p = q = 128)
# on the MXU and the radix-r cross-stage as a recursive radix-2 chain on the
# VPU.  The failed experiment this replaces put the small third factor on the
# MXU (choose_pqq_fused above), where a K = q1 < 128 contraction wastes the
# systolic array; butterflies over a *leading* axis are pure elementwise VPU
# work (~10 log2(r) flops/point — noise next to the MXU stages), so this cuts
# MXU flops 8(p'+q') -> 8(p+q) (e.g. 65536: 8*512 -> 8*256) with K = 128 kept
# at full width and still ONE HBM read + write.
# Reference counterpart: the layered radix-4 cross-FFT stages over a base FFT
# (radix4.rs:146-164) — here the "base" is the MXU two-stage kernel.
# ---------------------------------------------------------------------------


def choose_rpq(n: int) -> Optional[Tuple[int, int, int]]:
    """Split n = r * 128 * 128 with r a power of two in [2, 16].

    Measured on v5e (same run): beats the 2-stage kernel by 10%/36%/70% at
    r=2/4/8 and the large pipeline by 23% at r=16, but LOSES to the large
    pipeline at r=32 (528 vs 751 GF/s at 524288: the 5-level VPU chain's
    temporaries crowd VMEM down to tb=1) — hence the r <= 16 cap.
    """
    if n % (128 * 128):
        return None
    r = n // (128 * 128)
    if r < 2 or r > 16 or (r & (r - 1)):
        return None
    # VMEM: ~(24 + 3*log2(r)) live f32 single-array copies of the tile at
    # tb = 1, plus the w_n twiddle table (8n bytes) and DFT blocks
    copies = 24 + 3 * r.bit_length()
    need = copies * 4 * n + 8 * n + 4 * (4 * 128 * 128 * 2)
    if need > max(config.pallas_vmem_limit, 112 * 2**20):
        return None
    return r, 128, 128


def radix_supported(n: int, dtype) -> bool:
    if np.dtype(dtype) != np.complex64:
        return False
    return choose_rpq(n) is not None


def _vpu_fft_list(vr, vi, direction):
    """Recursive radix-2 DIT FFT over a Python list of equal-shape arrays.

    Classic Cooley-Tukey on the *leading* grid of slices: every butterfly is
    an elementwise VPU op over whole (sublane, lane) tiles; twiddles are
    scalar f32 constants baked into the kernel body.  Natural order in,
    natural order out.
    """
    r = len(vr)
    if r == 1:
        return vr, vi
    er, ei = _vpu_fft_list(vr[0::2], vi[0::2], direction)
    fr, fi = _vpu_fft_list(vr[1::2], vi[1::2], direction)
    sign = -1.0 if direction == FftDirection.FORWARD else 1.0
    out_r = [None] * r
    out_i = [None] * r
    h = r // 2
    for c in range(h):
        ang = sign * 2.0 * np.pi * c / r
        wr = float(np.cos(ang))
        wi = float(np.sin(ang))
        tr = fr[c] * wr - fi[c] * wi
        ti = fr[c] * wi + fi[c] * wr
        out_r[c] = er[c] + tr
        out_i[c] = ei[c] + ti
        out_r[c + h] = er[c] - tr
        out_i[c + h] = ei[c] - ti
    return out_r, out_i


def _fused_kernel_vpur(r, p, q, tb, precision, direction, variant, xr_ref,
                       xi_ref, wp_hi_ref, wp_lo_ref, wq_hi_ref, wq_lo_ref,
                       t1r_ref, t1i_ref, t2r_ref, t2i_ref, or_ref, oi_ref):
    """One batch tile: (tb*p, r*q) [b, a*q+j2] -> (tb*q, r*p) [k2, k1] natural.

    j1 = b*r + a (b in [0,p), a in [0,r)); k1 = c*p + d.  DFT_{rp} over j1
    decomposes as DFT_p over b (MXU), twiddle w_{rp}^{a*d}, radix-r over a
    (VPU); then the usual four-step twiddle w_n^{k1*j2} and DFT_q over j2.

    The input block is the pure reshape (tb*p, r*q) of the natural (batch, n)
    array (j = b*(r*q) + a*q + j2), so stage A is the two-stage kernel's
    proven 3D sublane contraction with lanes r*q; a 4D layout with the
    contraction on a leading axis measured ~13x slower per point (Mosaic
    inserts per-tile transposes for non-sublane contractions).
    """
    m1 = r * p
    xr = xr_ref[:].reshape(tb, p, r * q)  # [b, a*q + j2]
    xi = xi_ref[:].reshape(tb, p, r * q)

    # stage A: DFT_p over the sublane b axis (MXU, K = 2p = 256)
    xb = jnp.concatenate([xr, xi], axis=1)  # (tb, 2p, r*q)
    a = contract_rhs(
        xb, wp_hi_ref[:], wp_lo_ref[:], (((1,), (1,)), ((), ())), precision
    )  # (tb, r*q, 2p) [a*q + j2, d]
    a = a.reshape(tb, r, q, 2 * p)  # sublane split: [a, j2, d]
    sr, si = a[..., :p], a[..., p:]

    # twiddle w_{rp}^{a*d}, table (r, p)
    t1r = t1r_ref[:].reshape(1, r, 1, p)
    t1i = t1i_ref[:].reshape(1, r, 1, p)
    br = sr * t1r - si * t1i
    bi = sr * t1i + si * t1r

    # radix-r chain over the a axis (VPU): leading-axis slices
    cr_l, ci_l = _vpu_fft_list(
        [br[:, j] for j in range(r)], [bi[:, j] for j in range(r)], direction
    )
    cr = jnp.stack(cr_l, axis=1)  # (tb, r, q, p) [c, j2, d]
    ci = jnp.stack(ci_l, axis=1)

    # four-step twiddle w_n^(k1*j2), k1 = c*p + d; table (r, q, p) [c, j2, d]
    t2r = t2r_ref[:].reshape(r, q, p)
    t2i = t2i_ref[:].reshape(r, q, p)
    dr = cr * t2r - ci * t2i
    di = cr * t2i + ci * t2r

    # stage B: DFT_q over j2 (MXU, K = 2q = 256)
    db = jnp.concatenate([dr, di], axis=2)  # (tb, r, 2q, p)
    if variant == "wlhs_b":
        # weights-as-lhs: out[k2, b, c, d] — k2 lands LEADING and the lane
        # axis (d) is untouched, so the natural-order emit needs only per-c
        # leading permutes instead of r lane<->sublane transposes (the
        # measured dominant in-VMEM cost class, CLAUDE.md)
        e = contract_wlhs(
            wq_hi_ref[:], wq_lo_ref[:], db, (((1,), (2,)), ((), ())),
            precision,
        )  # (2q, tb, r, p) [k2, b, c, d]
        er, ei = e[:q], e[q:]
        outs_r = [jnp.transpose(er[:, :, c, :], (1, 0, 2)) for c in range(r)]
        outs_i = [jnp.transpose(ei[:, :, c, :], (1, 0, 2)) for c in range(r)]
    else:
        e = contract_rhs(
            db, wq_hi_ref[:], wq_lo_ref[:], (((2,), (1,)), ((), ())), precision
        )  # (tb, r, p, 2q) [c, d, k2]
        er, ei = e[..., :q], e[..., q:]

        # natural order k = k2*m1 + c*p + d: per-c lane transposes, concat
        outs_r = [jnp.swapaxes(er[:, c], -1, -2) for c in range(r)]  # (tb, q, p)
        outs_i = [jnp.swapaxes(ei[:, c], -1, -2) for c in range(r)]
    or_ref[:] = jnp.concatenate(outs_r, axis=-1).reshape(tb * q, m1)
    oi_ref[:] = jnp.concatenate(outs_i, axis=-1).reshape(tb * q, m1)


def _fused_kernel_ctw(r, p, q, tb, precision, direction, *refs):
    """Traffic-lean radix-r tile: (tb*p, r*q) -> (tb*q, r*p) natural order.

    Same math as _fused_kernel_vpur, restructured to minimize materialized
    VMEM arrays (the measured binding resource of the one-pass band —
    CLAUDE.md anatomy: ~2.9ms of in-VMEM compute spread across ~30 ops):

      - ONE merged twiddle cmul.  With j = b*rq + a*q + j2 and
        k = k2*rp + c*p + d, the exponent splits as
        w_n^{jk} = w_p^{bd} * w_n^{(a*q+j2)*d} * w_r^{ac} * w_rq^{c*j2}
        * w_q^{k2*j2}.  The (a*q+j2)*d factor is ONE n-sized table
        (= twiddle_table(rq, p): exact-integer exponents), replacing the
        old t1 (r,p) AND the d-part of the old n-sized t2.
      - The c-part of t2 (w_rq^{c*j2}) folds into r PER-C stage-B weight
        tables Wc[k2,j2] = w_q^{k2*j2} * w_rq^{c*j2} — zero elementwise
        cost, same total MXU flops (r dots of 1/r the rows each).
      - The VPU radix-r chain becomes a PURE DFT_r (scalar twiddles only)
        whose per-c output slices feed the per-c dots directly — the
        (tb, r, q, p) stack the old kernel materialized disappears.
      - Both contractions use pair-cat tables (w_cat_pair): the f32
        [re; im] concats disappear into the bf16 cat concat.
      - Stage B keeps the proven x-as-lhs sublane contraction and the
        default emit (per-c lane transposes + lane concat): the wlhs
        alternative (k2 leading, permute-only emit) measured 2.5x SLOWER
        on v5e (395 vs 977 GF/s at 65536 — leading permutes of
        (2q, tb, p) cost far more than lane transposes; /tmp/ctw_65536).

    Reference counterpart: radix4.rs:146-164's layered cross-FFT stages;
    the twiddle-folding plays the role of avx_mixed_radix.rs's fused
    twiddle-multiply butterflies (apply_butterfly! with twiddles baked
    into the butterfly constants).
    """
    (xr_ref, xi_ref), consts, (or_ref, oi_ref) = refs[:2], refs[2:-2], refs[-2:]
    wpA_hi, wpA_lo, wpB_hi, wpB_lo = consts[0:4]
    wc_refs = consts[4 : 4 + 4 * r]
    tr_ref, ti_ref = consts[4 + 4 * r :]
    dims = (((1,), (1,)), ((), ()))

    xr = xr_ref[:].reshape(tb, p, r * q)
    xi = xi_ref[:].reshape(tb, p, r * q)

    # stage A: DFT_p over the sublane b axis (MXU)
    if precision in CAT_TIERS:
        a = contract_pair_cat_rhs(wpA_hi[:], xr, xi, 1, precision)
    else:
        a = contract_pair(
            xr, xi,
            (wpA_hi[:], wpA_lo[:]), (wpB_hi[:], wpB_lo[:]),
            dims, precision,
        )  # (tb, r*q, 2p) [b, (a,j2), d]
    ar, ai = a[..., :p], a[..., p:]

    # the ONE merged twiddle: T[(a,j2), d] = w_n^{(a*q+j2)*d}
    tr, ti = tr_ref[:], ti_ref[:]
    br = ar * tr - ai * ti
    bi = ar * ti + ai * tr  # (tb, r*q, p)

    # pure DFT_r over a (VPU chain, scalar twiddles), sublane slices
    cr_l, ci_l = _vpu_fft_list(
        [br[:, j * q : (j + 1) * q, :] for j in range(r)],
        [bi[:, j * q : (j + 1) * q, :] for j in range(r)],
        direction,
    )

    # per-c stage B: contract j2 against the c-twiddled DFT_q table
    outs_r, outs_i = [], []
    for c in range(r):
        wcA_hi, wcA_lo, wcB_hi, wcB_lo = wc_refs[4 * c : 4 * c + 4]
        if precision in CAT_TIERS:
            e = contract_pair_cat_rhs(
                wcA_hi[:], cr_l[c], ci_l[c], 1, precision
            )
        else:
            e = contract_pair(
                cr_l[c], ci_l[c],
                (wcA_hi[:], wcA_lo[:]), (wcB_hi[:], wcB_lo[:]),
                dims, precision,
            )  # (tb, p, 2q) [b, d, k2]
        outs_r.append(jnp.swapaxes(e[..., :q], -1, -2))  # (tb, q, p)
        outs_i.append(jnp.swapaxes(e[..., q:], -1, -2))

    # natural order k = k2*rp + c*p + d: lane concat over c
    or_ref[:] = jnp.concatenate(outs_r, axis=-1).reshape(tb * q, r * p)
    oi_ref[:] = jnp.concatenate(outs_i, axis=-1).reshape(tb * q, r * p)


def _fused_kernel_ctwg(r, p, q, tb, precision, direction, *refs):
    """ctw kernel with Gauss 3-multiplication complex GEMMs.

    Each complex contraction runs as THREE real dots of K = p (Gauss/
    Karatsuba: P1 = xr@Wr, P2 = xi@Wi, P3 = (xr+xi)@(Wr+Wi); re = P1-P2,
    im = P3-P1-P2) instead of one block dot of K = 2p — a 25% MXU-flop
    cut.  The extra VPU adds ride free: the probe ladder measured
    elementwise ops at +0.03ms on a 5ms kernel while each GEMM stage adds
    its full MXU time (tools/perf_anatomy.py, /tmp/ctw2_65536.log).  The
    same trick is the dense tier's measured-default "gauss" variant above
    npad=256 (ops/pallas/dense.py).
    """
    (xr_ref, xi_ref), consts, (or_ref, oi_ref) = refs[:2], refs[2:-2], refs[-2:]
    wA = consts[0:6]
    wc_refs = consts[6 : 6 + 6 * r]
    tr_ref, ti_ref = consts[6 + 6 * r :]
    dims = (((1,), (1,)), ((), ()))

    def gauss(xr, xi, w6):
        return gauss_contract(xr, xi, w6, dims, precision)

    xr = xr_ref[:].reshape(tb, p, r * q)
    xi = xi_ref[:].reshape(tb, p, r * q)

    # stage A: DFT_p over the sublane b axis (3 Gauss dots, K = p each)
    ar, ai = gauss(xr, xi, wA)  # (tb, r*q, p) [b, (a,j2), d]

    # the ONE merged twiddle: T[(a,j2), d] = w_n^{(a*q+j2)*d}
    tr, ti = tr_ref[:], ti_ref[:]
    br = ar * tr - ai * ti
    bi = ar * ti + ai * tr

    # pure DFT_r over a (VPU chain, scalar twiddles)
    cr_l, ci_l = _vpu_fft_list(
        [br[:, j * q : (j + 1) * q, :] for j in range(r)],
        [bi[:, j * q : (j + 1) * q, :] for j in range(r)],
        direction,
    )

    # per-c stage B: c-twiddled DFT_q via Gauss dots
    outs_r, outs_i = [], []
    for c in range(r):
        er, ei = gauss(cr_l[c], ci_l[c], wc_refs[6 * c : 6 * c + 6])
        outs_r.append(jnp.swapaxes(er, -1, -2))  # (tb, q, p)
        outs_i.append(jnp.swapaxes(ei, -1, -2))

    or_ref[:] = jnp.concatenate(outs_r, axis=-1).reshape(tb * q, r * p)
    oi_ref[:] = jnp.concatenate(outs_i, axis=-1).reshape(tb * q, r * p)


def _fused_kernel_ctwgn(r, p, q, tb, precision, direction, *refs):
    """ctwg math on NARROW (·, q)-lane HBM views of the same bytes.

    Round-5 DMA finding (tools/perf_narrow.py, same-run v5e): a pure pair
    copy of identical HBM bytes runs ~1.5x faster when the array is
    described with a 128-wide lane axis ((batch*p*r, q)-shaped views) than
    at the ctwg kernel's (batch*p, r*q) view — and input_output_aliases on
    the narrow view reaches the full stream rate.  This kernel re-describes
    the radix kernel's I/O in that fast class: the input block arrives as
    (tb*p*r, q) [rows (tile, b, a), lanes j2 — q = 128 always], the a-digit
    chunks land exactly on lane-row boundaries, and every contraction stays
    a <=3D sublane contraction (the measured kernel-structure rule).

    Same tables/consts as _fused_kernel_ctwg; only the views change.
    """
    (xr_ref, xi_ref), consts, (or_ref, oi_ref) = refs[:2], refs[2:-2], refs[-2:]
    wA = consts[0:6]
    wc_refs = consts[6 : 6 + 6 * r]
    tr_ref, ti_ref = consts[6 + 6 * r :]
    dims = (((1,), (1,)), ((), ()))

    def gauss(xr, xi, w6):
        return gauss_contract(xr, xi, w6, dims, precision)

    # narrow block: (tb*p*r, q), rows = (tile, b, a), lanes = j2
    xr3 = xr_ref[:].reshape(tb * p, r, q)
    xi3 = xi_ref[:].reshape(tb * p, r, q)

    tr_full, ti_full = tr_ref[:], ti_ref[:]  # (r*q, p) [(a, j2), d]
    br_l, bi_l = [], []
    for a in range(r):
        xa_r = xr3[:, a, :].reshape(tb, p, q)
        xa_i = xi3[:, a, :].reshape(tb, p, q)
        # stage A: DFT_p over the sublane b axis, one a-chunk at a time
        ar, ai = gauss(xa_r, xa_i, wA)  # (tb, q, p) [j2, d]
        # merged twiddle T[(a, j2), d] = w_n^{(a*q+j2)*d}: per-a row slice
        ta_r = tr_full[a * q : (a + 1) * q, :]
        ta_i = ti_full[a * q : (a + 1) * q, :]
        br_l.append(ar * ta_r - ai * ta_i)
        bi_l.append(ar * ta_i + ai * ta_r)

    # pure DFT_r over the a-chunk list (VPU chain, scalar twiddles)
    cr_l, ci_l = _vpu_fft_list(br_l, bi_l, direction)

    # per-c stage B: c-twiddled DFT_q via Gauss dots
    outs_r, outs_i = [], []
    for c in range(r):
        er, ei = gauss(cr_l[c], ci_l[c], wc_refs[6 * c : 6 * c + 6])
        outs_r.append(jnp.swapaxes(er, -1, -2))  # (tb, q, p) [k2, d]
        outs_i.append(jnp.swapaxes(ei, -1, -2))

    # natural order k = k2*rp + c*p + d -> narrow rows (tile, k2, c), lanes d
    or_ref[:] = jnp.stack(outs_r, axis=2).reshape(tb * q * r, p)
    oi_ref[:] = jnp.stack(outs_i, axis=2).reshape(tb * q * r, p)


def _flat_in_relayout(x, tb, p, r, q):
    """(tb, n) flat block -> (tb, p, r*q) [b, (a, j2)] via lane slicing.

    The round-5 DMA sweep (tools/perf_narrow.py, same-run v5e) found ONLY
    the flat (batch, n) whole-transform-row view copies fast (330 GB/s un-
    aliased, 660 aliased = full stream); every tiled description — including
    the radix kernel's (batch*p, r*q) and narrow (batch*p*r, q) views of the
    same bytes — runs ~218.  Lane-dim reshapes are illegal in VMEM, so the
    b digit (lane stride r*q in the flat view) moves to the mid sublane axis
    with one p-way lane-slice stack.  Pure 3D: the 4D two-level pyramid
    variant crashed the Mosaic remote compiler (HTTP 500, 2026-08-19 —
    the known implicit-dimension class).
    """
    rq = r * q
    return jnp.stack(
        [x[:, b * rq : (b + 1) * rq] for b in range(p)], axis=1
    )  # (tb, p, r*q)


def _flat_out_store(o_ref, w, p, r, q):
    """Store (tb, q, r*p) [b, k2, (c, d)] into a flat (tb, n) out ref.

    Lane k = k2*rp + c*p + d: per-k2 static lane-slice STORES.  A q-way
    lane-concat producing the (tb, n) value crashes the Mosaic remote
    compiler (HTTP 500 — tools/perf_ctwgx_debug.py bisect, 2026-08-19)
    while slice-stores into the wide out ref compile; the input-side p-way
    stack is fine either way.
    """
    rp = r * p
    for k2 in range(q):
        o_ref[:, k2 * rp : (k2 + 1) * rp] = w[:, k2, :]


def _fused_kernel_ctwgx(r, p, q, tb, precision, direction, *refs):
    """ctwg math on FLAT (batch, n) HBM views — the fast DMA class.

    Identical tables and stage structure to _fused_kernel_ctwg; the I/O
    blocks are (tb, n) rows of whole transforms (330 GB/s unaliased /
    660 aliased vs 218 for the tiled views — tools/perf_narrow.py), and
    the digit relayouts run in VMEM as lane-slice/stack pyramids (~4 VPU
    passes each way, priced at ~24 us per full-data pass by the round-5
    op ladder).
    """
    (xr_ref, xi_ref), consts, (or_ref, oi_ref) = refs[:2], refs[2:-2], refs[-2:]
    wA = consts[0:6]
    wc_refs = consts[6 : 6 + 6 * r]
    tr_ref, ti_ref = consts[6 + 6 * r :]
    dims = (((1,), (1,)), ((), ()))

    def gauss(xr, xi, w6):
        return gauss_contract(xr, xi, w6, dims, precision)

    xr = _flat_in_relayout(xr_ref[:], tb, p, r, q)
    xi = _flat_in_relayout(xi_ref[:], tb, p, r, q)

    # stage A: DFT_p over the sublane b axis (3 Gauss dots, K = p each)
    ar, ai = gauss(xr, xi, wA)  # (tb, r*q, p) [b, (a,j2), d]

    # the ONE merged twiddle: T[(a,j2), d] = w_n^{(a*q+j2)*d}
    tr, ti = tr_ref[:], ti_ref[:]
    br = ar * tr - ai * ti
    bi = ar * ti + ai * tr

    # pure DFT_r over a (VPU chain, scalar twiddles)
    cr_l, ci_l = _vpu_fft_list(
        [br[:, j * q : (j + 1) * q, :] for j in range(r)],
        [bi[:, j * q : (j + 1) * q, :] for j in range(r)],
        direction,
    )

    # per-c stage B: c-twiddled DFT_q via Gauss dots
    outs_r, outs_i = [], []
    for c in range(r):
        er, ei = gauss(cr_l[c], ci_l[c], wc_refs[6 * c : 6 * c + 6])
        outs_r.append(jnp.swapaxes(er, -1, -2))  # (tb, q, p) [k2, d]
        outs_i.append(jnp.swapaxes(ei, -1, -2))

    wr = jnp.concatenate(outs_r, axis=-1)  # (tb, q, r*p) [b, k2, (c, d)]
    wi = jnp.concatenate(outs_i, axis=-1)
    _flat_out_store(or_ref, wr, p, r, q)
    _flat_out_store(oi_ref, wi, p, r, q)


def gauss_contract(xr, xi, w6, dims, precision):
    """Complex contraction via Gauss's 3 real dots (25% less MXU work).

    w6: six refs/arrays (Wr_hi, Wr_lo, Wi_hi, Wi_lo, Ws_hi, Ws_lo) from
    gauss_tables().  P1 = xr@Wr, P2 = xi@Wi, P3 = (xr+xi)@(Wr+Wi);
    re = P1-P2, im = P3-P1-P2 (exact term identity; f32 accumulation).
    """
    wr_hi, wr_lo, wi_hi, wi_lo, ws_hi, ws_lo = w6
    p1 = contract_rhs(xr, wr_hi[:], wr_lo[:], dims, precision)
    p2 = contract_rhs(xi, wi_hi[:], wi_lo[:], dims, precision)
    p3 = contract_rhs(xr + xi, ws_hi[:], ws_lo[:], dims, precision)
    return p1 - p2, p3 - p1 - p2


def gauss_tables(w: np.ndarray, precision, rdt=np.float32):
    """6-slot (Wr_hi, Wr_lo, Wi_hi, Wi_lo, Ws_hi, Ws_lo) Gauss group.

    w: complex (out, K) matrix contracted along axis 1.  Ws = Wr + Wi.
    Each real table ships through w_split (cat table or bf16 pair).
    """
    out = []
    for m in (w.real, w.imag, w.real + w.imag):
        hi, lo = w_split(np.ascontiguousarray(m).astype(rdt), precision)
        out.extend((hi, lo))
    return out


def _ctw_cfacs(r, q, direction):
    """Per-c Bluestein-exact c-twiddle rows w_rq^{c*j2} (complex, (r, q))."""
    rq = r * q
    j2 = np.arange(q, dtype=np.int64)
    rows = []
    for c in range(r):
        exps = (c * j2) % rq
        cfac = np.exp(-2j * np.pi * exps.astype(np.float64) / rq)
        if direction is FftDirection.INVERSE:
            cfac = np.conj(cfac)
        rows.append(cfac)
    return rows


def _ctwg_consts(r, p, q, direction, precision, rdt=np.float32):
    """Host tables for the ctwg (Gauss) kernel, in consts order."""
    consts = gauss_tables(twiddles.dft_matrix(p, direction), precision, rdt)
    wq = twiddles.dft_matrix(q, direction)
    for cfac in _ctw_cfacs(r, q, direction):
        consts.extend(gauss_tables(wq * cfac[None, :], precision, rdt))
    t = twiddles.twiddle_table(r * q, p, direction)
    consts.append(np.ascontiguousarray(t.real).astype(rdt))
    consts.append(np.ascontiguousarray(t.imag).astype(rdt))
    return consts


def _ctw_consts(r, p, q, direction, precision, rdt=np.float32):
    """Host tables for the ctw kernel, in the kernel's consts order."""
    rq = r * q

    def pair_tables(w_block, half):
        """4-slot (A_hi, A_lo, B_hi, B_lo) group for one block matrix."""
        wA = np.ascontiguousarray(w_block[:, :half])
        wB = np.ascontiguousarray(w_block[:, half:])
        if precision in CAT_TIERS:
            dummy = np.zeros((8, 128), np.float32)
            return [w_cat_pair(wA, wB, precision), dummy, dummy, dummy]
        out = []
        for w in (wA, wB):
            hi, lo = w_split(w, precision)
            out.extend((hi, lo))
        # w_split interleaves (A_hi, A_lo, B_hi, B_lo) — matches kernel
        return out

    wp = calg.block_mid(twiddles.dft_matrix(p, direction), rdt)  # (2p, 2p)
    consts = pair_tables(wp, p)
    # per-c tables Wc[k2, j2] = w_q^{k2*j2} * w_rq^{c*j2} (exact int mod)
    wq = twiddles.dft_matrix(q, direction)
    for cfac in _ctw_cfacs(r, q, direction):
        wc = calg.block_mid(wq * cfac[None, :], rdt)  # (2q, 2q)
        consts.extend(pair_tables(wc, q))
    t = twiddles.twiddle_table(rq, p, direction)  # (rq, p): w_n^{(aq+j2)*d}
    consts.append(np.ascontiguousarray(t.real).astype(rdt))
    consts.append(np.ascontiguousarray(t.imag).astype(rdt))
    return consts


def make_fused_radix_fn(
    n: int,
    direction: FftDirection,
    dtype,
    split: Optional[Tuple[int, int, int]] = None,
    interpret: bool = False,
    precision=None,
    batch_tile: Optional[int] = None,
    variant: str = "default",
    in_place: bool = False,
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n), the radix-r fused kernel.

    variant="wlhs_b": stage B as a weights-as-lhs contraction — natural
    order from per-c leading permutes instead of r lane<->sublane
    transposes (A/B on hardware: tools/perf_anatomy.py).

    in_place=True aliases the input HBM pair to the outputs (the
    reference's in-place execution model, lib.rs:195-211).  Legal because
    every radix split has p == q == 128, so the (batch*p, r*q) in view and
    (batch*q, r*p) out view share a shape and identical block index maps.
    In-place halves the HBM page working set; measured on v5e the aliased
    two-stage kernel ran +24% in a chained loop (tools/perf_dma2.py).  XLA
    inserts a defensive copy unless the caller donates the operands (jit
    donate_argnums / a loop carry).
    """
    assert np.dtype(dtype) == np.complex64, "fused kernel is c64/f32 only"
    rpq = split or choose_rpq(n)
    assert rpq is not None, f"no radix-r fused split for n={n}"
    r, p, q = rpq
    if in_place and variant != "ctwgx":
        # ctwgx aliases flat (batch, n) views — always shape-legal; the
        # tiled variants need matching (tb*p, r*q)/(tb*q, r*p) blocks
        assert p == q, f"in_place radix kernel needs p == q, got {rpq}"
    m1 = r * p
    assert m1 * q == n
    rdt = np.float32
    precision = resolve_precision(precision, interpret)

    if variant in ("ctwg", "ctwgn", "ctwgx"):
        consts = _ctwg_consts(r, p, q, direction, precision, rdt)
    elif variant == "ctw":
        consts = _ctw_consts(r, p, q, direction, precision, rdt)
    else:
        wp = calg.block_mid(twiddles.dft_matrix(p, direction), rdt)
        wq = calg.block_mid(twiddles.dft_matrix(q, direction), rdt)
        wp_hi, wp_lo = w_split(wp, precision)
        wq_hi, wq_lo = w_split(wq, precision)
        # t1[a, d] = w_{rp}^{a*d}; t2[c, j2, d] = w_n^{(c*p + d) * j2}.  t2
        # ships 2D as (r*q, p) so the in-kernel reshape splits the sublane
        # axis only (lane-dim splits are illegal in VMEM).
        t1 = twiddles.twiddle_table(r, p, direction)  # (r, p) [a, d]
        t2 = twiddles.twiddle_table(m1, q, direction)  # (m1, q) [c*p+d, j2]
        t2 = np.swapaxes(t2.reshape(r, p, q), 1, 2).reshape(r * q, p)
        consts = [
            wp_hi, wp_lo, wq_hi, wq_lo,
            np.ascontiguousarray(t1.real).astype(rdt),
            np.ascontiguousarray(t1.imag).astype(rdt),
            np.ascontiguousarray(t2.real).astype(rdt),
            np.ascontiguousarray(t2.imag).astype(rdt),
        ]

    def _tb(batch):
        if batch_tile:
            return batch_tile
        if variant == "ctwgx":
            # flat (tb, n) blocks need tb % 8 == 0 (sublane divisibility);
            # 8 whole transforms per block is also the VMEM sweet spot
            return 8
        copies = 24 + 3 * r.bit_length()
        budget = max(config.pallas_vmem_limit, 112 * 2**20) - 12 * n
        tb = max(1, budget // (copies * 4 * n))
        tb = 1 << (tb.bit_length() - 1)
        # measured at 32768: tb=4 (931 GF/s) > tb=16 (883) > tb=8 (861);
        # small tiles pipeline better here — cap well below the VMEM bound
        return max(1, min(tb, 8, batch))

    def call(xr, xi, tb):
        batch = xr.shape[0]
        grid = batch // tb
        if variant == "ctwgx":
            kernel = functools.partial(
                _fused_kernel_ctwgx, r, p, q, tb, precision, direction
            )
        elif variant == "ctwgn":
            kernel = functools.partial(
                _fused_kernel_ctwgn, r, p, q, tb, precision, direction
            )
        elif variant == "ctwg":
            kernel = functools.partial(
                _fused_kernel_ctwg, r, p, q, tb, precision, direction
            )
        elif variant == "ctw":
            kernel = functools.partial(
                _fused_kernel_ctw, r, p, q, tb, precision, direction
            )
        else:
            kernel = functools.partial(
                _fused_kernel_vpur, r, p, q, tb, precision, direction, variant
            )
        if variant == "ctwgx":
            # flat (batch, n) whole-transform-row views — the fast DMA class
            in_view = (batch, n)
            out_view = (batch, n)
            in_bspec = pl.BlockSpec((tb, n), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)
            out_bspec = pl.BlockSpec((tb, n), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)
        elif variant == "ctwgn":
            # narrow 128-lane I/O views of the same bytes (round-5 DMA class)
            in_view = (batch * p * r, q)
            out_view = (batch * q * r, p)
            in_bspec = pl.BlockSpec((tb * p * r, q), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)
            out_bspec = pl.BlockSpec((tb * q * r, p), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)
        else:
            in_view = (batch * p, r * q)
            out_view = (batch * q, m1)
            in_bspec = pl.BlockSpec((tb * p, r * q), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)
            out_bspec = pl.BlockSpec((tb * q, m1), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)

        def cspec(w):
            return pl.BlockSpec(w.shape, i32map(lambda i: (0, 0)), memory_space=pltpu.VMEM)

        out_r, out_i = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[in_bspec, in_bspec] + [cspec(w) for w in consts],
            out_specs=[out_bspec, out_bspec],
            out_shape=[jax.ShapeDtypeStruct(out_view, jnp.float32)] * 2,
            input_output_aliases={0: 0, 1: 1} if in_place else {},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=max(config.pallas_vmem_limit, 112 * 2**20)
            ),
            interpret=interpret,
        )(
            xr.reshape(in_view),
            xi.reshape(in_view),
            *[jnp.asarray(w) for w in consts],
        )
        return out_r.reshape(batch, n), out_i.reshape(batch, n)

    def apply(x):
        xr, xi = x
        shape = xr.shape
        flat_r = xr.reshape(-1, n)
        flat_i = xi.reshape(-1, n)
        batch = flat_r.shape[0]
        tb = _tb(batch)
        pad = (-batch) % tb
        if pad:
            flat_r = jnp.pad(flat_r, ((0, pad), (0, 0)))
            flat_i = jnp.pad(flat_i, ((0, pad), (0, 0)))
        out_r, out_i = call(flat_r, flat_i, tb)
        if pad:
            out_r = out_r[:batch]
            out_i = out_i[:batch]
        return out_r.reshape(shape), out_i.reshape(shape)

    return apply
