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
from .fused import (CAT_TIERS, contract_pair_cat_wlhs, contract_wlhs,
                    resolve_precision, w_cat_pair, w_split)

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


def _fft_sublane(vr, vi, n, radices, w_refs, tw_refs, precision, lanes):
    """DIT FFT over the sublane axis of (n, lanes) arrays, natural order.

    Stage s contracts the most significant remaining digit of j against the
    K-halved block DFT matrix (w_refs holds wA_hi, wA_lo, wB_hi, wB_lo per
    stage); tw_refs holds the inter-stage twiddle tables.  Invariant: data is
    (lead, rest*..., lanes) with already-produced digits leading, most recent
    first, so the final flat index is natural ascending frequency order.
    """
    k = len(radices)

    if precision in CAT_TIERS:
        # merged single-dot stage: one table per stage (see _stage_consts)
        def stage(s, vr, vi, cdim):
            return contract_pair_cat_wlhs(w_refs[s][:], vr, vi, cdim, precision)
    else:
        def stage(s, vr, vi, cdim):
            dims = (((1,), (cdim,)), ((), ()))
            wA_hi, wA_lo, wB_hi, wB_lo = (w_refs[4 * s + t][:] for t in range(4))
            return contract_wlhs(wA_hi, wA_lo, vr, dims, precision) + contract_wlhs(
                wB_hi, wB_lo, vi, dims, precision
            )

    # Stage 1 runs on a 3D (r, rest, lanes) view contracting dim 0 — the
    # rank-4 (1, r, rest, lanes) form used previously makes Mosaic assign a
    # "layout with implicit dimension" to dot-chain inputs and the compile
    # fails when two FFTs chain inside one kernel (the conv core).  The two
    # forms are the same memory layout; only the rank differs.
    rest = n // radices[0]
    r0 = radices[0]
    a = stage(0, vr.reshape(r0, rest, lanes), vi.reshape(r0, rest, lanes), 0)
    ar, ai = a[:r0], a[r0:]  # (r0, rest, lanes) [k_1, j', L]
    if k > 1:
        twr = tw_refs[0][:].reshape(r0, rest, 1)
        twi = tw_refs[1][:].reshape(r0, rest, 1)
        vr = ar * twr - ai * twi
        vi = ar * twi + ai * twr
    else:
        vr, vi = ar, ai

    for s in range(1, k):
        r = radices[s]
        lead = vr.shape[0]
        rest //= r
        vr = vr.reshape(lead, r, rest, lanes)
        vi = vi.reshape(lead, r, rest, lanes)
        a = stage(s, vr, vi, 1)  # (2r, lead, rest, lanes) [k_s, lead, j', L]
        ar, ai = a[:r], a[r:]
        if s < k - 1:
            twr = tw_refs[2 * s][:].reshape(r, 1, rest, 1)
            twi = tw_refs[2 * s + 1][:].reshape(r, 1, rest, 1)
            br = ar * twr - ai * twi
            bi = ar * twi + ai * twr
        else:
            br, bi = ar, ai
        vr = br.reshape(r * lead, rest, lanes)
        vi = bi.reshape(r * lead, rest, lanes)
    return vr.reshape(n, lanes), vi.reshape(n, lanes)


def _stage_consts(n, radices, direction, precision):
    """Constant tables for _fft_sublane: per-stage K-halved block DFT
    matrices (4 arrays each) followed by the inter-stage twiddle tables."""
    rdt = np.float32
    consts = []
    for r in radices:
        w = calg.block_mid(twiddles.dft_matrix(r, direction), rdt)  # (2r, 2r)
        if precision in CAT_TIERS:
            # merged single-dot table: whole complex stage in one (2r, 6r)
            consts.append(w_cat_pair(w[:, :r], w[:, r:], precision))
        else:
            # K-halves for the concat-free stages: wA on re, wB on im
            for half in (w[:, :r], w[:, r:]):
                consts.extend(w_split(np.ascontiguousarray(half), precision))
    # inter-stage twiddles: after contracting r_s, twiddle w_{r_s*rest}^(k_s*j)
    rest = n
    for r in radices[:-1]:
        rest //= r
        tw = twiddles.twiddle_table(r, rest, direction)  # (r, rest) [k_s, j]
        consts.append(np.ascontiguousarray(tw.real).astype(rdt))
        consts.append(np.ascontiguousarray(tw.imag).astype(rdt))
    return consts


def _flat_group_load(x_ref, gi, sw, n):
    """Load group gi's 128 transforms from a flat (tb, pack*n) ref.

    The round-5 DMA rule (CLAUDE.md): only wide whole-row HBM views copy
    fast.  A group = all tb block rows x a window of sw = 128/tb slots;
    slot offsets are lane-aligned (n % 128 == 0), so the sw-way lane-slice
    stack moves the slot digit to a sublane axis — and, crucially, this
    stack REPLACES the block-mode ref read feeding the lane<->sublane
    transpose (a first whole-block unpack pass measured -31% at 1024:
    604.8 -> 417.7 GF/s, tools/perf_lpx.py 2026-08-19).
    Returns (tb*sw, n) rows; local row t*sw + u = signal t*pack + gi*sw + u.
    """
    base = gi * sw
    return jnp.stack(
        [x_ref[:, (base + u) * n : (base + u + 1) * n] for u in range(sw)],
        axis=1,
    ).reshape(-1, n)


def _flat_group_store(o_ref, v, gi, sw, n):
    """Store a group's (tb*sw, n) output into the flat (tb, pack*n) ref.

    Per-slot lane-slice STORES: a wide lane concat producing the whole-row
    value crashes the Mosaic remote compiler (the ctwgx bisect,
    tools/perf_ctwgx_debug.py); slice-stores compile.
    """
    v3 = v.reshape(-1, sw, n)
    base = gi * sw
    for u in range(sw):
        o_ref[:, (base + u) * n : (base + u + 1) * n] = v3[:, u, :]


def _kernel(n, radices, g, precision, stack, pack, xr_ref, xi_ref, *refs):
    """One group: (g*LANES, n) natural [b, j] -> same shape, FFT over j.

    Stages are concat-free: each contracts the [re | im] halves with the two
    K-halves of the block DFT matrix (wA = W[:, :r], wB = W[:, r:]), dodging
    two whole-tile VMEM copies per stage — Mosaic stack-allocates every
    temporary in the block, so peak VMEM, not HBM traffic, is the binding
    constraint here.

    stack=True processes all g groups as ONE g*LANES-wide lane axis: a single
    transpose pair per block and one dot per stack with g*128 lanes of N,
    instead of g separate transpose/dot chains.

    pack>0 = flat I/O mode: the block is (tb, pack*n) whole rows of pack
    transforms each (the fast DMA class); unpack/repack via lane-slice
    stacks/stores, then the g = tb*pack/128 groups run exactly as in block
    mode.
    """
    k = len(radices)
    # per stage: one merged cat table, or wA_hi, wA_lo, wB_hi, wB_lo
    tps = 1 if precision in CAT_TIERS else 4
    w_refs = refs[: tps * k]
    tw_refs = refs[tps * k : tps * k + 2 * (k - 1)]
    or_ref, oi_ref = refs[-2:]
    lanes = g * LANES if stack else LANES
    n_groups = 1 if stack else g

    # transposes of lane-misaligned widths (n % 128) lower to a slow Mosaic
    # path; pad the lane axis to the VREG boundary first, slice sublanes after
    n_pad = -(-n // LANES) * LANES

    # flat mode: a group = all tb block rows x sw slots (128 transforms)
    sw = LANES // xr_ref.shape[0] if pack else 0

    outs_r = []
    outs_i = []
    for gi in range(n_groups):
        if pack:
            xr = _flat_group_load(xr_ref, gi, sw, n)  # (L, n)
            xi = _flat_group_load(xi_ref, gi, sw, n)
        else:
            xr = xr_ref[gi * lanes : (gi + 1) * lanes, :]  # (L, n)
            xi = xi_ref[gi * lanes : (gi + 1) * lanes, :]
        if n_pad != n:
            pad = jnp.zeros((lanes, n_pad - n), jnp.float32)
            xr = jnp.concatenate([xr, pad], axis=1)
            xi = jnp.concatenate([xi, pad], axis=1)
        # lane<->sublane transpose: n -> sublanes, batch -> lanes
        tr = jnp.swapaxes(xr, 0, 1)[:n, :]  # (n, L)
        ti = jnp.swapaxes(xi, 0, 1)[:n, :]

        vr, vi = _fft_sublane(tr, ti, n, radices, w_refs, tw_refs, precision, lanes)
        if n_pad != n:
            pad = jnp.zeros((n_pad - n, lanes), jnp.float32)
            vr = jnp.concatenate([vr, pad], axis=0)
            vi = jnp.concatenate([vi, pad], axis=0)
        outr = jnp.swapaxes(vr, 0, 1)[:, :n]  # (L, n)
        outi = jnp.swapaxes(vi, 0, 1)[:, :n]
        if pack:
            # store this group's slots straight into the flat out ref —
            # no whole-block accumulation/concat pass
            _flat_group_store(or_ref, outr, gi, sw, n)
            _flat_group_store(oi_ref, outi, gi, sw, n)
        else:
            outs_r.append(outr)
            outs_i.append(outi)
    if pack:
        return
    or_ref[:] = jnp.concatenate(outs_r, axis=0) if n_groups > 1 else outs_r[0]
    oi_ref[:] = jnp.concatenate(outs_i, axis=0) if n_groups > 1 else outs_i[0]


#: flat-variant row width: the uniquely-fast whole-row DMA width (round-5
#: rule, tools/perf_narrow.py: 65536-wide aliased copies run at stream rate;
#: 131072+ DEGRADE and sub-65536 pure copies stay in the ~218 GB/s class)
_FLAT_W = 65536


def flat_pack(n: int) -> Optional[int]:
    """Transforms per flat row for the flat lanepack variant, or None.

    Needs contiguous packing of whole signals into a 65536-wide row with
    every slot offset lane-aligned: n a power-of-two multiple of 128.
    """
    if n < LANES or n > _FLAT_W // 2 or _FLAT_W % n or n % LANES:
        return None
    return _FLAT_W // n


def make_lanepack_fn(
    n: int,
    direction: FftDirection,
    dtype,
    radices: Optional[Sequence[int]] = None,
    interpret: bool = False,
    precision=None,
    group: Optional[int] = None,
    stack: bool = False,
    variant: Optional[str] = None,
    in_place: bool = False,
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n), batch-in-lanes kernel.

    `group` = how many 128-transform groups one grid step processes;
    default 2 for n >= 3000 (measured +9% at 3888: fewer grid steps amortize
    the per-step transpose/dot latency), else 1.

    `stack=True` fuses the g groups into one g*128-wide lane axis (one
    transpose pair and one dot per stage for the whole block).

    `variant="flat"` (config.lanepack_variant): describe I/O as whole
    (tb, 65536) rows packing 65536/n transforms each — the round-5 fast
    DMA class — with the slot relayout done in VMEM (lane-slice stacks in,
    per-slot slice stores out).  Falls back to block form when flat_pack(n)
    is None.  in_place aliases the (always shape-equal) flat views.
    """
    assert np.dtype(dtype) == np.complex64, "lanepack kernel is c64/f32 only"
    if variant is None:
        variant = config.lanepack_variant
    pack = flat_pack(n) if variant == "flat" else None
    if group is None:
        # round-4 ladder (tools/perf_lpgroup.py, differential timer,
        # same-run): taller grid steps amortize the per-step transpose/dot
        # latency at small n — 512: g8 587 vs g1 517; 1024: g4 617 vs 579;
        # but LOSE from 2048 up (2048: g1 630 vs g4 575; 3888: g1 478 vs
        # g2 442 — the old "g=2 at n>=3000" default was a pre-differential
        # timing artifact).  Halve g until the working set (~26 live pairs
        # per group) fits the VMEM budget.
        effective = max(config.pallas_vmem_limit, _VMEM_REQUEST)
        group = 8 if n <= 512 else (4 if n <= 1024 else 1)
        while group > 1 and 26 * group * 4 * n * LANES > effective:
            group //= 2
    radices = tuple(radices or choose_radices(n))
    assert int(np.prod(radices)) == n, (radices, n)
    k = len(radices)
    precision = resolve_precision(precision, interpret)
    rdt = np.float32

    consts = _stage_consts(n, radices, direction, precision)

    tb = 0
    if pack:
        # flat blocks need tb % 8 == 0 (sublane divisibility) and whole
        # 128-transform groups per block
        tb = 8
        while (tb * pack) % LANES:
            tb += 8

    def call(xr, xi, g):
        batch = xr.shape[0]
        rows = g * LANES
        grid = batch // rows
        kernel = functools.partial(
            _kernel, n, radices, g, precision, stack, pack or 0
        )
        if pack:
            w = pack * n  # == _FLAT_W
            bspec = pl.BlockSpec((tb, w), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)
            xr = xr.reshape(batch // pack, w)
            xi = xi.reshape(batch // pack, w)
            out_view = (batch // pack, w)
        else:
            bspec = pl.BlockSpec((rows, n), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)
            out_view = (batch, n)

        def cspec(w):
            return pl.BlockSpec(w.shape, i32map(lambda i: (0, 0)), memory_space=pltpu.VMEM)

        out_r, out_i = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[bspec, bspec] + [cspec(w) for w in consts],
            out_specs=[bspec, bspec],
            out_shape=[jax.ShapeDtypeStruct(out_view, jnp.float32)] * 2,
            input_output_aliases={0: 0, 1: 1} if (pack and in_place) else {},
            # Mosaic stack-allocates every block temporary AND double-buffers
            # the IO blocks across grid steps; the transposes make this
            # kernel temp-heavy, so give it headroom beyond the default
            # budget (v5e has 128MB physical VMEM/core).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=max(config.pallas_vmem_limit, _VMEM_REQUEST)
            ),
            interpret=interpret,
        )(xr, xi, *[jnp.asarray(w) for w in consts])
        return out_r.reshape(batch, n), out_i.reshape(batch, n)

    def apply(x):
        xr, xi = x
        shape = xr.shape
        flat_r = xr.reshape(-1, n)
        flat_i = xi.reshape(-1, n)
        batch = flat_r.shape[0]
        # flat mode: one grid step spans tb*pack transforms (g groups)
        rows = tb * pack if pack else group * LANES
        pad = (-batch) % rows
        if pad:
            flat_r = jnp.pad(flat_r, ((0, pad), (0, 0)))
            flat_i = jnp.pad(flat_i, ((0, pad), (0, 0)))
        g = (tb * pack) // LANES if pack else group
        out_r, out_i = call(flat_r, flat_i, g)
        if pad:
            out_r = out_r[:batch]
            out_i = out_i[:batch]
        return out_r.reshape(shape), out_i.reshape(shape)

    return apply


# ---------------------------------------------------------------------------
# Lanepack conv kernel: the Bluestein/Rader double-FFT convolution core
# (ops/pallas/conv.py docstring) with the inner length m on the SUBLANE axis.
# Lifts conv.py's lane-alignment constraint (m needs a q % 128 == 0 split):
# any m that choose_radices() can factor qualifies, so Rader can run its
# natural inner size m = p - 1 (e.g. 1008 for p = 1009) instead of padding to
# a Bluestein inner of ~2n — half the convolution points.
# Reference counterpart: RadersAlgorithm/BluesteinsAlgorithm inner FFTs of
# arbitrary composite sizes (raders_algorithm.rs:41-330).
# ---------------------------------------------------------------------------


def _conv_working_set(m: int, radices, g: int = 1) -> int:
    """VMEM bytes for the conv kernel: two sequential sublane FFTs (~2x the
    single-FFT live-pair calibration of lanepack_supported), the stage
    tables, and the six lane-replicated (8-padded m, LANES) column tables
    (H/pre/post re+im — ~3 KB/row, NOT 3 floats; concatenated again
    in-kernel when g > 1)."""
    m_pad = -(-m // LANES) * LANES
    stage_consts = sum(4 * (2 * r) ** 2 for r in radices) + 8 * m * 4
    col_rows = -(-m // 8) * 8
    col_tables = 6 * 4 * col_rows * LANES * g  # replicated to g*LANES wide
    tile = 28 * 2 * 4 * m_pad * LANES * g
    return stage_consts + col_tables + tile


def lanepack_conv_supported(m: int, dtype) -> bool:
    if np.dtype(dtype) != np.complex64:
        return False
    if m < 4:
        return False
    radices = choose_radices(m)
    if radices is None:
        return False
    # DFT blocks are (2r, 2r): r < 4 ships blocks with < 8 sublane rows,
    # the same sub-VREG class the col() padding exists to avoid — gate it
    # (e.g. m = p-1 = 40 -> (2, 20)); such sizes keep the XLA inner path
    if min(radices) < 4:
        return False
    effective = max(config.pallas_vmem_limit, _VMEM_REQUEST)
    return _conv_working_set(m, radices) <= effective


def _conv_kernel(m, n_in, n_out, radices, g, precision, conj_out, has_pre,
                 has_post, xr_ref, xi_ref, *refs):
    """(g*L, n_in) [b, j] -> (g*L, n_out): pre, FFT_m, conj(.*H), FFT_m,
    maybe-conj, post — all with m on the sublane axis (one transpose pair)."""
    k = len(radices)
    tps = 1 if precision in CAT_TIERS else 4
    w_refs = refs[: tps * k]
    tw_refs = refs[tps * k : tps * k + 2 * (k - 1)]
    hr_ref, hi_ref, prer_ref, prei_ref, postr_ref, posti_ref = refs[
        tps * k + 2 * (k - 1) : tps * k + 2 * (k - 1) + 6
    ]
    or_ref, oi_ref = refs[-2:]
    lanes = g * LANES

    def tab(ref, rows):
        # column tables ship lane-replicated to the group's full lane width
        # and 8-row-padded (see col() in the factory); slice the live rows
        return ref[:][:rows]

    m_pad = -(-m // LANES) * LANES
    xr = xr_ref[:]  # (lanes, n_in)
    xi = xi_ref[:]
    # lane pad to m_pad: columns n_in..m are the conv zero-padding, m..m_pad
    # transpose scratch (sliced off below)
    if m_pad != n_in:
        pad = jnp.zeros((lanes, m_pad - n_in), jnp.float32)
        xr = jnp.concatenate([xr, pad], axis=1)
        xi = jnp.concatenate([xi, pad], axis=1)
    tr = jnp.swapaxes(xr, 0, 1)[:m, :]  # (m, lanes)
    ti = jnp.swapaxes(xi, 0, 1)[:m, :]

    if has_pre:
        pr = tab(prer_ref, m)  # (m, lanes), zero beyond n_in
        pi = tab(prei_ref, m)
        vr = tr * pr - ti * pi
        vi = tr * pi + ti * pr
    else:
        vr, vi = tr, ti

    yr, yi = _fft_sublane(vr, vi, m, radices, w_refs, tw_refs, precision, lanes)

    # pointwise z = conj(Y * H), H natural-order lane-replicated (m, lanes)
    hr = tab(hr_ref, m)
    hi = tab(hi_ref, m)
    zr = yr * hr - yi * hi
    zi = -(yr * hi + yi * hr)

    er, ei = _fft_sublane(zr, zi, m, radices, w_refs, tw_refs, precision, lanes)
    if conj_out:
        ei = -ei

    er = er[:n_out, :]
    ei = ei[:n_out, :]
    if has_post:
        postr = tab(postr_ref, n_out)  # (n_out, lanes)
        posti = tab(posti_ref, n_out)
        outr = er * postr - ei * posti
        outi = er * posti + ei * postr
    else:
        outr, outi = er, ei
    no_pad = -(-n_out // LANES) * LANES
    if no_pad != n_out:
        pad = jnp.zeros((no_pad - n_out, lanes), jnp.float32)
        outr = jnp.concatenate([outr, pad], axis=0)
        outi = jnp.concatenate([outi, pad], axis=0)
    or_ref[:] = jnp.swapaxes(outr, 0, 1)[:, :n_out]
    oi_ref[:] = jnp.swapaxes(outi, 0, 1)[:, :n_out]


def make_lanepack_conv_fn(
    m: int,
    direction: FftDirection,
    dtype,
    h: np.ndarray,
    pre: Optional[np.ndarray] = None,
    post: Optional[np.ndarray] = None,
    conj_out: bool = False,
    n_in: Optional[int] = None,
    n_out: Optional[int] = None,
    interpret: bool = False,
    precision=None,
    group: Optional[int] = None,
) -> Callable:
    """Build fn: Cplx (..., n_in) -> Cplx (..., n_out) computing

        out = [post *] maybe_conj( FFT_m( conj( FFT_m([pre *] zeropad(x)) * H ) ) )

    with the same contract as conv.make_conv_fn, but m on the sublane axis —
    m needs only a choose_radices() factorization, no lane alignment.
    """
    assert np.dtype(dtype) == np.complex64, "lanepack conv kernel is c64 only"
    radices = choose_radices(m)
    assert radices is not None, f"no lanepack radices for m={m}"
    n_in = n_in or m
    n_out = n_out or m
    precision = resolve_precision(precision, interpret)
    rdt = np.float32

    if group is None:
        effective = max(config.pallas_vmem_limit, _VMEM_REQUEST)
        group = 2 if _conv_working_set(m, radices, g=2) <= effective else 1

    # the in-kernel lane pad supplies the conv zero-padding, so (unlike
    # conv.py) a pre table is only needed when a chirp actually multiplies
    # the live prefix
    has_pre = pre is not None
    pre_full = np.zeros(m if has_pre else 1, dtype=np.complex128)
    if pre is not None:
        pre_full[: len(pre)] = pre
    has_post = post is not None
    post_full = np.zeros(n_out if has_post else 1, dtype=np.complex128)
    if post is not None:
        post_full[: min(len(post), n_out)] = post[:n_out]

    consts = _stage_consts(m, radices, direction, precision)

    # lane-replicated column tables: (m', 1) blocks fail Mosaic ("Layout
    # with implicit dimension"), as do blocks with < 8 sublane rows (the
    # dummy tables) — ship (8-padded m', group*LANES) and slice rows
    # in-kernel (replicating to the full lane width host-side saves the
    # per-grid-step widening concat the kernel would otherwise pay)
    def col(a):
        v = np.asarray(a, np.float64).reshape(-1)
        rows = max(8, -(-len(v) // 8) * 8)
        out = np.zeros((rows, group * LANES), rdt)
        out[: len(v), :] = v[:, None]
        return out
    consts.extend((
        col(np.asarray(h).real), col(np.asarray(h).imag),
        col(pre_full.real), col(pre_full.imag),
        col(post_full.real), col(post_full.imag),
    ))

    def call(xr, xi, g):
        batch = xr.shape[0]
        rows = g * LANES
        grid = batch // rows
        kernel = functools.partial(
            _conv_kernel, m, n_in, n_out, radices, g, precision, conj_out,
            has_pre, has_post,
        )
        in_bspec = pl.BlockSpec((rows, n_in), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)
        out_bspec = pl.BlockSpec((rows, n_out), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)

        def cspec(w):
            return pl.BlockSpec(w.shape, i32map(lambda i: (0, 0)), memory_space=pltpu.VMEM)

        out_r, out_i = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[in_bspec, in_bspec] + [cspec(w) for w in consts],
            out_specs=[out_bspec, out_bspec],
            out_shape=[jax.ShapeDtypeStruct((batch, n_out), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=max(config.pallas_vmem_limit, _VMEM_REQUEST)
            ),
            interpret=interpret,
        )(xr, xi, *[jnp.asarray(w) for w in consts])
        return out_r, out_i

    def apply(x):
        xr, xi = x
        shape = xr.shape
        flat_r = xr.reshape(-1, shape[-1])
        flat_i = xi.reshape(-1, shape[-1])
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
        return (
            out_r.reshape(shape[:-1] + (n_out,)),
            out_i.reshape(shape[:-1] + (n_out,)),
        )

    return apply
