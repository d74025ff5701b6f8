"""Batch-in-lanes FFT kernel: transforms in sublanes, 128 batch rows in lanes.

The TPU analogue of the reference SSE/NEON `perform_parallel_fft` butterflies
that pack 2 f32 transforms per vector (sse_butterflies.rs) — here 128
transforms ride the 128-wide lane axis, and the transform index n lives
entirely on the *sublane* axis, where Mosaic allows arbitrary splits.  That
removes the fused kernel's lane-alignment constraint (q % 128), so sizes
whose factors contain no 2^7 — the reference's 3n2m class, e.g.
3888 = 2^4*3^5 (lib.rs:114, avx_planner.rs:748-865) — get a fused
single-HBM-pass kernel too, as does the small-n tier (n <= 2048) where the
lane-aligned fused kernel loses to XLA.

Per grid step (one group of L=128 transforms):

    load (L, n) natural layout -> VMEM lane<->sublane transpose -> (n, L)
    -> 2 or 3 DFT stages, each a weights-as-lhs MXU contraction over a
       sublane factor of n (factors need NO lane alignment) with twiddle
       multiplies between -> (n, L) in natural frequency order
    -> transpose back -> store (L, n)

One HBM read + one write per transform: the memory-bound speed of light.
The two VMEM transposes ride the VPU/MXU and cost no HBM traffic.

MXU work at bf16x3: 24*(r1+..+rk) flops/point — e.g. n=3888 as 48*81:
~3.1k flops/pt, n=1024 as 32*32: ~1.5k flops/pt (vs 6.1k for the
lane-aligned kernel's 128*128 split at n=16384).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...common import FftDirection
from ...config import config
from ... import twiddles
from .. import calg
from .fused import _split_bf16, contract_wlhs

from .util import i32map

#: lanes per transform group == the VPU/MXU lane width
LANES = 128

#: per-stage factor cap: keeps the (2r)^2 DFT blocks small and the
#: contraction K = 2r within a few MXU passes
MAX_STAGE = 256

#: scoped-VMEM request for this temp-heavy kernel (v5e has 128MB physical
#: VMEM/core; 112MB verified compiling at n=7776, the largest supported size)
_VMEM_REQUEST = 112 * 2**20


def choose_radices(n: int) -> Optional[Tuple[int, ...]]:
    """Split n into 2..3 factors <= MAX_STAGE, big radix first.

    Measured on v5e: two stages with a small trailing radix near 16 beat
    both balanced splits and 3-stage min-sum splits ((243,16) > (48,81) >
    (12,18,18) at n=3888; (64,16) ~ (32,32) > (256,4) at n=1024) — fewer,
    fatter MXU passes win over minimum flops.  Rule: r2 = the divisor in
    [8, 32] nearest 16 with r1 = n/r2 <= MAX_STAGE; fall back to the
    min-sum 2-stage then 3-stage split.

    Returns None when n has no such factorization (e.g. a prime > MAX_STAGE).
    """
    best_tail = None
    for r2 in range(8, 33):
        if n % r2:
            continue
        r1 = n // r2
        if r1 < 2 or r1 > MAX_STAGE:
            continue
        key = abs(r2 - 16)
        if best_tail is None or key < best_tail[0]:
            best_tail = (key, (r1, r2))
    if best_tail is not None:
        return best_tail[1]
    best2 = None
    for r1 in range(2, MAX_STAGE + 1):
        if n % r1:
            continue
        r2 = n // r1
        if 2 <= r2 <= MAX_STAGE:
            key = (r1 + r2, abs(r1 - r2))
            if best2 is None or key < best2[0]:
                best2 = (key, (max(r1, r2), min(r1, r2)))
    if best2 is not None:
        return best2[1]
    best3 = None
    for r1 in range(2, MAX_STAGE + 1):
        if n % r1:
            continue
        rest = n // r1
        for r2 in range(2, MAX_STAGE + 1):
            if rest % r2:
                continue
            r3 = rest // r2
            if 2 <= r3 <= MAX_STAGE:
                key = (r1 + r2 + r3, max(r1, r2, r3))
                rs = tuple(sorted((r1, r2, r3), reverse=True))
                if best3 is None or key < best3[0]:
                    best3 = (key, rs)
    return best3[1] if best3 is not None else None


def lanepack_supported(n: int, dtype) -> bool:
    if np.dtype(dtype) != np.complex64:
        return False
    if n < 4:
        return False
    radices = choose_radices(n)
    if radices is None:
        return False
    # VMEM: Mosaic's measured stack allocation is ~13 live f32 copies of the
    # (n, LANES) pair (n=7776 compiled at 100.55MB = 12.6 pairs; the 10-pair
    # estimate used before let it through a 100MB limit and OOMed the
    # compile), plus DFT blocks/twiddles, against the same effective budget
    # the kernel compiles with (see make_lanepack_fn)
    effective = max(config.pallas_vmem_limit, _VMEM_REQUEST)
    consts = sum(4 * (2 * r) ** 2 for r in radices) + 8 * n * 4
    # pad-to-VREG copies count against the stack too (n=8748 -> 8832 failed
    # at 13 pairs of the unpadded width); budget 14 pairs of the padded width
    n_pad = -(-n // LANES) * LANES
    tile = 14 * 2 * 4 * n_pad * LANES
    return consts + tile <= effective


def _kernel(n, radices, g, precision, xr_ref, xi_ref, *refs):
    """One group: (g*LANES, n) natural [b, j] -> same shape, FFT over j.

    Stages are concat-free: each contracts the [re | im] halves with the two
    K-halves of the block DFT matrix (wA = W[:, :r], wB = W[:, r:]), dodging
    two whole-tile VMEM copies per stage — Mosaic stack-allocates every
    temporary in the block, so peak VMEM, not HBM traffic, is the binding
    constraint here.
    """
    k = len(radices)
    w_refs = refs[: 4 * k]  # per stage: wA_hi, wA_lo, wB_hi, wB_lo
    tw_refs = refs[4 * k : 4 * k + 2 * (k - 1)]
    or_ref, oi_ref = refs[-2:]

    def stage(s, vr, vi):
        """out[k_s, ...] = sum_j W[k_s, j] v[..., j at dim 1, ...]."""
        dims = (((1,), (1,)), ((), ()))
        wA_hi, wA_lo, wB_hi, wB_lo = (w_refs[4 * s + t][:] for t in range(4))
        return contract_wlhs(wA_hi, wA_lo, vr, dims, precision) + contract_wlhs(
            wB_hi, wB_lo, vi, dims, precision
        )

    # transposes of lane-misaligned widths (n % 128) lower to a slow Mosaic
    # path; pad the lane axis to the VREG boundary first, slice sublanes after
    n_pad = -(-n // LANES) * LANES

    outs_r = []
    outs_i = []
    for gi in range(g):
        xr = xr_ref[gi * LANES : (gi + 1) * LANES, :]  # (L, n)
        xi = xi_ref[gi * LANES : (gi + 1) * LANES, :]
        if n_pad != n:
            pad = jnp.zeros((LANES, n_pad - n), jnp.float32)
            xr = jnp.concatenate([xr, pad], axis=1)
            xi = jnp.concatenate([xi, pad], axis=1)
        # lane<->sublane transpose: n -> sublanes, batch -> lanes
        tr = jnp.swapaxes(xr, 0, 1)[:n, :]  # (n, L)
        ti = jnp.swapaxes(xi, 0, 1)[:n, :]

        # DIT over j = j1*(r2*r3..) + j2*(r3..) + ...: stage s contracts r_s
        # (the most significant remaining digit of j).  Invariant: data is
        # (lead, rest*..., L) where lead holds the already-produced k digits,
        # most recent leading; flattening (k_s, lead) each stage yields the
        # final flat index k = k_last*(r_{last-1}..r_1) + .. + k_2*r_1 + k_1,
        # which is exactly natural ascending frequency order.
        rest = n
        vr = tr.reshape(1, n, LANES)
        vi = ti.reshape(1, n, LANES)
        for s, r in enumerate(radices):
            rest //= r
            lead = vr.shape[0]
            vr = vr.reshape(lead, r, rest, LANES)
            vi = vi.reshape(lead, r, rest, LANES)
            a = stage(s, vr, vi)  # (2r, lead, rest, L) [k_s, lead, j', L]
            ar, ai = a[:r], a[r:]
            if s < k - 1:
                # twiddle w_{r*rest}^(k_s * j') over the remaining digits,
                # broadcast over lead and lanes
                twr = tw_refs[2 * s][:].reshape(r, 1, rest, 1)
                twi = tw_refs[2 * s + 1][:].reshape(r, 1, rest, 1)
                br = ar * twr - ai * twi
                bi = ar * twi + ai * twr
            else:
                br, bi = ar, ai
            vr = br.reshape(r * lead, rest, LANES)
            vi = bi.reshape(r * lead, rest, LANES)
        vr = vr.reshape(n, LANES)
        vi = vi.reshape(n, LANES)
        if n_pad != n:
            pad = jnp.zeros((n_pad - n, LANES), jnp.float32)
            vr = jnp.concatenate([vr, pad], axis=0)
            vi = jnp.concatenate([vi, pad], axis=0)
        outr = jnp.swapaxes(vr, 0, 1)[:, :n]  # (L, n)
        outi = jnp.swapaxes(vi, 0, 1)[:, :n]
        outs_r.append(outr)
        outs_i.append(outi)
    or_ref[:] = jnp.concatenate(outs_r, axis=0) if g > 1 else outs_r[0]
    oi_ref[:] = jnp.concatenate(outs_i, axis=0) if g > 1 else outs_i[0]


def make_lanepack_fn(
    n: int,
    direction: FftDirection,
    dtype,
    radices: Optional[Sequence[int]] = None,
    interpret: bool = False,
    precision=None,
    group: Optional[int] = None,
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n), batch-in-lanes kernel.

    `group` = how many 128-transform groups one grid step processes;
    default 2 for n >= 3000 (measured +9% at 3888: fewer grid steps amortize
    the per-step transpose/dot latency), else 1.
    """
    assert np.dtype(dtype) == np.complex64, "lanepack kernel is c64/f32 only"
    if group is None:
        # g=2 when the doubled working set still fits (measured +9% at 3888;
        # ~26 live pairs at g=2 — double the calibrated g=1 footprint)
        effective = max(config.pallas_vmem_limit, _VMEM_REQUEST)
        group = 2 if n >= 3000 and 26 * 2 * 4 * n * LANES <= effective else 1
    radices = tuple(radices or choose_radices(n))
    assert int(np.prod(radices)) == n, (radices, n)
    k = len(radices)
    if precision is None:
        precision = config.pallas_precision
    if interpret and precision == "bf16x3":
        # interpreter lowers dots through XLA, whose dot merger re-fuses the
        # bf16x3 passes and destroys the correction terms; use true f32
        precision = jax.lax.Precision.HIGHEST
    rdt = np.float32

    consts = []
    for r in radices:
        w = calg.block_mid(twiddles.dft_matrix(r, direction), rdt)  # (2r, 2r)
        # K-halves for the concat-free stages: wA against re, wB against im
        for half in (w[:, :r], w[:, r:]):
            half = np.ascontiguousarray(half)
            if precision == "bf16x3":
                consts.extend(_split_bf16(half))
            else:
                consts.extend((half, np.zeros_like(half, dtype=jnp.bfloat16)))
    # inter-stage twiddles: after contracting r_s, twiddle w_{r_s*rest}^(k_s*j)
    rest = n
    for r in radices[:-1]:
        rest //= r
        tw = twiddles.twiddle_table(r, rest, direction)  # (r, rest) [k_s, j]
        consts.append(np.ascontiguousarray(tw.real).astype(rdt))
        consts.append(np.ascontiguousarray(tw.imag).astype(rdt))

    def call(xr, xi, g):
        batch = xr.shape[0]
        rows = g * LANES
        grid = batch // rows
        kernel = functools.partial(_kernel, n, radices, g, precision)
        bspec = pl.BlockSpec((rows, n), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)

        def cspec(w):
            return pl.BlockSpec(w.shape, i32map(lambda i: (0, 0)), memory_space=pltpu.VMEM)

        out_r, out_i = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[bspec, bspec] + [cspec(w) for w in consts],
            out_specs=[bspec, bspec],
            out_shape=[jax.ShapeDtypeStruct((batch, n), jnp.float32)] * 2,
            # Mosaic stack-allocates every block temporary AND double-buffers
            # the IO blocks across grid steps; the transposes make this
            # kernel temp-heavy, so give it headroom beyond the default
            # budget (v5e has 128MB physical VMEM/core).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=max(config.pallas_vmem_limit, _VMEM_REQUEST)
            ),
            interpret=interpret,
        )(xr, xi, *[jnp.asarray(w) for w in consts])
        return out_r, out_i

    def apply(x):
        xr, xi = x
        shape = xr.shape
        flat_r = xr.reshape(-1, n)
        flat_i = xi.reshape(-1, n)
        batch = flat_r.shape[0]
        rows = group * LANES
        pad = (-batch) % rows
        if pad:
            flat_r = jnp.pad(flat_r, ((0, pad), (0, 0)))
            flat_i = jnp.pad(flat_i, ((0, pad), (0, 0)))
        out_r, out_i = call(flat_r, flat_i, group)
        if pad:
            out_r = out_r[:batch]
            out_i = out_i[:batch]
        return out_r.reshape(shape), out_i.reshape(shape)

    return apply
