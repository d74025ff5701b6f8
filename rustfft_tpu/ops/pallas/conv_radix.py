"""Radix-structured convolution core: the Bluestein/Rader pipeline for big
inner lengths m = r * 128 * 128 (r a power of two in [2, 16]).

The single-kernel conv pipeline (ops/pallas/conv.py) runs both inner FFTs
as dense two-stage MXU contractions — 2 * 24*(p+q) bf16-flops/point, which
at m = 65536 (256x256 split) is 24.6k flops/point and MXU-bound (~4ms of
the 15.5ms total at 65537 x 512).  The radix-r fused kernel
(fused._fused_kernel_vpur) computes the same FFT at 24*(128+128)
flops/point + a cheap VPU radix chain — but two vpur FFTs cannot chain
inside one kernel: FFT #1 ends on a (tb, q, r*p) natural layout whose
reinterpretation as the (tb, p, r*q) stage-A input is a lane-dim split,
illegal in VMEM.  So the pipeline runs as TWO kernels over natural-order
HBM buffers:

  kernel 1: [pre .] vpur-FFT_m -> conj( . H )      (H in natural order!)
  kernel 2: vpur-FFT_m -> [conj] [. post]

at the cost of one extra HBM round-trip (4 traversals vs 2) — ~0.027
ns/point at stream rate, far below the 12.3k-flops/point MXU saving at
m >= 65536.  Both FFTs land natural order, so H/pre/post tables ship as
plain (q, r*p) / (p_in, r*q) reshapes — no layout shuffling (vs conv.py's
[k1, k2]-transposed H).

Input trimming mirrors conv.py's boundary-stage trim: only the live
p_in = ceil(n_in / (r*q)) sublane row-groups are streamed and contracted
(stage A's DFT block column-sliced to K = 2*p_in).

Reference counterpart: RadersAlgorithm/BluesteinsAlgorithm inner FFTs
(raders_algorithm.rs:174-233, bluesteins_algorithm.rs:100-136) with the
AVX backends' radix-chain inner drivers (avx_mixed_radix.rs).
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
from . import permute
from .fused import (_vpu_fft_list, choose_rpq, contract_rhs, gauss_contract,
                    gauss_tables, resolve_precision, w_split)

from .util import i32map


# rows-per-store group for the flat Benes out-perm write.  Bisected on
# hardware (tools/perf_outperm_bisect.py, 2026-08-19): every grouped-concat
# width tried (4/8/16 rows -> 512/1024/2048-lane concat stores) crashes the
# Mosaic remote compiler (HTTP 500) at m=65536; only the direct per-row
# 128-lane slice-stores (gsz=1, w_rows of them) compile — and still beat
# the tiled (tb*w_rows, 128) out blocks: bothperm core 9.36 -> 7.72 ms
# same-run at 65536 x 511.
_OUTPERM_GSZ = 1


def radix_conv_supported(m: int, dtype) -> bool:
    if np.dtype(dtype) != np.complex64:
        return False
    return choose_rpq(m) is not None


def _kernel(r, p, q, tb, p_in, precision, direction, has_pre, has_h,
            conj_out, has_post, has_inperm, has_outperm, has_sum, has_addc,
            flat_in, flat_out, full_out, gauss_mode, in_shift, dc_from_sum,
            xr_ref, xi_ref, x0r_ref, x0i_ref, s0r_ref, s0i_ref, *rest):
    """One batch tile: (tb*p_in, r*q) natural -> (tb*q, r*p) natural, with
    optional elementwise prologue (pre) and epilogues (conj(.H) / conj /
    post) around the vpur FFT body (fused._fused_kernel_vpur derivation).

    has_inperm / has_outperm fuse arbitrary m-point permutations (the Rader
    root-order gathers) into the pass as in-VMEM Benes phases
    (permute._apply_phases) — zero extra HBM traffic vs ~2 traversals +
    random-access penalty for the XLA gathers they replace.  Requires
    q == 128 (input Z digit on lanes) resp. p == 128 (output), and
    p_in == p (no input trim).  The permuted input arrives as (tb*W, 128)
    blocks (W = m/128); stage A then runs as r per-slice contractions
    (the (j1, a) digits land interleaved on sublanes — merging them back
    to the natural (p_in, r*q) lane layout would be a lane merge, illegal
    in VMEM).

    has_sum (pass 1): emit the per-signal EXACT f32 sum of the raw input
    block as an extra (tb, 128) output — rides the pass's existing HBM
    read so the Rader DC bin (out[0] = x0 + sum(x[1:]), raders_algorithm.rs
    :202) costs no separate XLA reduction pass over the m-point signal.
    The sum is over raw f32 inputs BEFORE any bf16 split (unlike the
    rejected DC-from-core trim, which summed the kernel's bf16-path
    output and amplified its error ~30x).

    has_addc (pass 2): fuse `out += const` (per-signal complex broadcast,
    the Rader "+x0 to every bin" fixup) into the pass — the add commutes
    with the output permutation, so it lands after conj and before the
    Benes phases.

    full_out (pass 2): emit the COMPLETE (tb, m+1) Rader output — the
    final XLA epilogue concat (measured ~1.5 ms of the 9.4 ms plan at
    65537 x 512) vanishes into the pass.  The "+1 position shift" of the
    DC-first output layout is folded into the out_perm TABLE itself
    (np.roll of the gather indices — an arbitrary permutation costs the
    Benes network nothing), which parks the one element destined for
    position m at grid slot 0; the kernel then issues two extra ALIGNED
    single-lane stores: slot m gets the parked value, slot 0 gets the DC
    bin x0 + sum(x[1:]) from the s0 input (pass 1's emit_sum output).
    """
    # ref layout: nw stage-DFT tables (4 block-form / 12 Gauss), then the
    # fixed 20 twiddle/pre/h/post/perm consts, the 2 out refs, and the
    # optional 2 sum out refs
    nw = 12 if gauss_mode else 4
    w_refs = rest[:nw]
    (t1r_ref, t1i_ref, t2r_ref, t2i_ref,
     prer_ref, prei_ref, hr_ref, hi_ref, postr_ref, posti_ref,
     i1_ref, i2_ref, i3_ref, i4_ref, i5_ref,
     o1_ref, o2_ref, o3_ref, o4_ref, o5_ref,
     or_ref, oi_ref) = rest[nw:nw + 22]
    sum_refs = rest[nw + 22:]
    gdims = (((1,), (1,)), ((), ()))
    m1 = r * p
    if has_sum:
        osr_ref, osi_ref = sum_refs
        if flat_in:
            # flat (tb, n_in) block: one lane-axis reduce per signal row
            sr_sum = jnp.sum(xr_ref[:], axis=1, keepdims=True)
            si_sum = jnp.sum(xi_ref[:], axis=1, keepdims=True)
        else:
            in_rows = (r * p) if has_inperm else p_in
            # staged reduction: sum the middle (row-grid) axis to a
            # (tb, lanes) tile, then the lane axis.  The one-shot
            # axis=(1, 2) reduce SIGABRTs the Mosaic compile helper on
            # v5e (isolated in a minimal probe, 2026-08-18).
            sr_sum = jnp.sum(
                jnp.sum(xr_ref[:].reshape(tb, in_rows, -1), axis=1),
                axis=1, keepdims=True,
            )
            si_sum = jnp.sum(
                jnp.sum(xi_ref[:].reshape(tb, in_rows, -1), axis=1),
                axis=1, keepdims=True,
            )
        osr_ref[:] = jnp.broadcast_to(sr_sum, (tb, 128))
        osi_ref[:] = jnp.broadcast_to(si_sum, (tb, 128))
    if has_inperm:
        w_rows = r * p  # m // q, q == 128
        iz1, iy1, iy2, iz2 = i1_ref[:], i2_ref[:], i4_ref[:], i5_ref[:]
        sel_a = i3_ref[:]
        sel = [[sel_a[xd, xs] for xs in range(r)] for xd in range(r)]
        if flat_in:
            # flat (tb, m) block -> per-signal (W, Z) views via a W-way
            # lane-slice stack (the round-5 fast-DMA relayout).  in_shift:
            # the block is the RAW (tb, p)-wide Rader input (lane 0 = x0,
            # signal at lanes [1, m+1)) — one static lane roll aligns it,
            # replacing the ~0.8 ms XLA x[1:] slice traversal the plan
            # otherwise pays (and keeping the pass's in/out widths equal
            # so aliasing stays legal)
            rowr, rowi = xr_ref[:], xi_ref[:]
            if in_shift:
                rowr = jnp.roll(rowr, -1, axis=1)
                rowi = jnp.roll(rowi, -1, axis=1)
            fr = jnp.stack(
                [rowr[:, w * q : (w + 1) * q] for w in range(w_rows)],
                axis=1,
            )  # (tb, W, q)
            fi = jnp.stack(
                [rowi[:, w * q : (w + 1) * q] for w in range(w_rows)],
                axis=1,
            )
        sig_r, sig_i = [], []
        for s in range(tb):
            xr_s = fr[s] if flat_in else xr_ref[s * w_rows:(s + 1) * w_rows, :]
            xi_s = fi[s] if flat_in else xi_ref[s * w_rows:(s + 1) * w_rows, :]
            sig_r.append(permute._apply_phases(
                xr_s, r, iz1, iy1, sel, iy2, iz2))
            sig_i.append(permute._apply_phases(
                xi_s, r, iz1, iy1, sel, iy2, iz2))
        # (tb, p, r, q) [j1, a, j2]: row (j1*r + a) of the (W, Z) view
        vr = jnp.stack(sig_r, axis=0).reshape(tb, p, r, q)
        vi = jnp.stack(sig_i, axis=0).reshape(tb, p, r, q)
        if gauss_mode:
            ar_l, ai_l = [], []
            for a_i in range(r):
                gr, gi = gauss_contract(
                    vr[:, :, a_i, :], vi[:, :, a_i, :], w_refs[0:6],
                    gdims, precision,
                )  # (tb, q, p) [j2, d]
                ar_l.append(gr)
                ai_l.append(gi)
            sr = jnp.stack(ar_l, axis=1)  # (tb, r, q, p)
            si = jnp.stack(ai_l, axis=1)
        else:
            a_l = []
            for a_i in range(r):
                xb = jnp.concatenate(
                    [vr[:, :, a_i, :], vi[:, :, a_i, :]], axis=1
                )  # (tb, 2p, q)
                a_l.append(contract_rhs(
                    xb, w_refs[0][:], w_refs[1][:], gdims,
                    precision,
                ))  # (tb, q, 2p) [j2, d]
            a = jnp.stack(a_l, axis=1)  # (tb, r, q, 2p)
            sr, si = a[..., :p], a[..., p:]
    else:
        if flat_in:
            rq = r * q
            xr = jnp.stack(
                [xr_ref[:, b * rq : (b + 1) * rq] for b in range(p_in)],
                axis=1,
            )  # (tb, p_in, r*q)
            xi = jnp.stack(
                [xi_ref[:, b * rq : (b + 1) * rq] for b in range(p_in)],
                axis=1,
            )
        else:
            xr = xr_ref[:].reshape(tb, p_in, r * q)
            xi = xi_ref[:].reshape(tb, p_in, r * q)

        if has_pre:
            pr = prer_ref[:]  # (p_in, r*q) natural [j1, a*q + j2]
            pi = prei_ref[:]
            vr = xr * pr - xi * pi
            vi = xr * pi + xi * pr
        else:
            vr, vi = xr, xi

        # stage A: DFT_p over the sublane b axis; tables column-sliced to
        # the live rows — K = 2*p_in block form / p_in Gauss (conv.py's
        # boundary-stage trim)
        if gauss_mode:
            gr, gi = gauss_contract(
                vr, vi, w_refs[0:6], gdims, precision
            )  # (tb, r*q, p) [a*q + j2, d]
            sr = gr.reshape(tb, r, q, p)
            si = gi.reshape(tb, r, q, p)
        else:
            xb = jnp.concatenate([vr, vi], axis=1)  # (tb, 2p_in, r*q)
            a = contract_rhs(
                xb, w_refs[0][:], w_refs[1][:], gdims, precision
            )  # (tb, r*q, 2p) [a*q + j2, d]
            a = a.reshape(tb, r, q, 2 * p)
            sr, si = a[..., :p], a[..., p:]

    # twiddle w_{rp}^{a*d}, table (r, p)
    t1r = t1r_ref[:].reshape(1, r, 1, p)
    t1i = t1i_ref[:].reshape(1, r, 1, p)
    br = sr * t1r - si * t1i
    bi = sr * t1i + si * t1r

    # radix-r chain over the a axis (VPU)
    cr_l, ci_l = _vpu_fft_list(
        [br[:, j] for j in range(r)], [bi[:, j] for j in range(r)], direction
    )
    cr = jnp.stack(cr_l, axis=1)  # (tb, r, q, p) [c, j2, d]
    ci = jnp.stack(ci_l, axis=1)

    # four-step twiddle w_m^(k1*j2), k1 = c*p + d; table (r*q, p)
    t2r = t2r_ref[:].reshape(r, q, p)
    t2i = t2i_ref[:].reshape(r, q, p)
    dr = cr * t2r - ci * t2i
    di = cr * t2i + ci * t2r

    # stage B: DFT_q over j2
    if gauss_mode:
        er, ei = gauss_contract(
            dr, di, w_refs[6:12], (((2,), (1,)), ((), ())), precision
        )  # (tb, r, p, q) [c, d, k2]
    else:
        db = jnp.concatenate([dr, di], axis=2)  # (tb, r, 2q, p)
        e = contract_rhs(
            db, w_refs[2][:], w_refs[3][:], (((2,), (1,)), ((), ())), precision
        )  # (tb, r, p, 2q) [c, d, k2]
        er, ei = e[..., :q], e[..., q:]

    # natural order k = k2*m1 + c*p + d: per-c lane transposes, lane concat
    outs_r = [jnp.swapaxes(er[:, c], -1, -2) for c in range(r)]  # (tb, q, p)
    outs_i = [jnp.swapaxes(ei[:, c], -1, -2) for c in range(r)]

    if has_outperm:
        # (W, Z) view of natural order: row k//128 = k2*r + c, lane k%128
        # = d (p == 128) — a pure sublane interleave of the per-c slices
        w_rows = r * q
        zr4 = jnp.stack(outs_r, axis=2)  # (tb, q, r, p) [k2, c, d]
        zi4 = jnp.stack(outs_i, axis=2)
        if conj_out:
            zi4 = -zi4
        if has_addc:
            zr4 = zr4 + x0r_ref[:, :1].reshape(tb, 1, 1, 1)
            zi4 = zi4 + x0i_ref[:, :1].reshape(tb, 1, 1, 1)
        iz1, iy1, iy2, iz2 = o1_ref[:], o2_ref[:], o4_ref[:], o5_ref[:]
        sel_a = o3_ref[:]
        sel = [[sel_a[xd, xs] for xs in range(r)] for xd in range(r)]
        perm_r, perm_i = [], []
        for s in range(tb):
            perm_r.append(permute._apply_phases(
                zr4[s].reshape(w_rows, p), r, iz1, iy1, sel, iy2, iz2))
            perm_i.append(permute._apply_phases(
                zi4[s].reshape(w_rows, p), r, iz1, iy1, sel, iy2, iz2))
        if flat_out:
            # flat (tb, m) out ref (the fast DMA class): the permuted
            # (W, Z) rows ARE the flat natural index (row w = k // 128),
            # so emit groups of G rows as one <=2048-lane concat + one
            # static lane-slice store (wide concats > 2048 crash Mosaic).
            g_sz = min(_OUTPERM_GSZ, w_rows)
            st_r = jnp.stack(perm_r, axis=0)  # (tb, w_rows, p)
            st_i = jnp.stack(perm_i, axis=0)
            for g in range(w_rows // g_sz):
                lo = g * g_sz * p
                if g_sz == 1:
                    or_ref[:, lo : lo + p] = st_r[:, g, :]
                    oi_ref[:, lo : lo + p] = st_i[:, g, :]
                    continue
                or_ref[:, lo : lo + g_sz * p] = jnp.concatenate(
                    [st_r[:, g * g_sz + u, :] for u in range(g_sz)], axis=1)
                oi_ref[:, lo : lo + g_sz * p] = jnp.concatenate(
                    [st_i[:, g * g_sz + u, :] for u in range(g_sz)], axis=1)
            if full_out:
                # the rolled out_perm parked position-m's value at grid
                # slot 0 (stored above by the g == 0 row store); move it to
                # its aligned home and drop the DC bin into slot 0 — both
                # single-lane 128-aligned stores (m % 128 == 0)
                or_ref[:, w_rows * p : w_rows * p + 1] = st_r[:, 0, :1]
                oi_ref[:, w_rows * p : w_rows * p + 1] = st_i[:, 0, :1]
                if dc_from_sum:
                    # in_shift sums span the WHOLE raw row = x0 + sum(x[1:])
                    # — the DC bin directly (raders_algorithm.rs:202)
                    or_ref[:, :1] = s0r_ref[:, :1]
                    oi_ref[:, :1] = s0i_ref[:, :1]
                else:
                    or_ref[:, :1] = x0r_ref[:, :1] + s0r_ref[:, :1]
                    oi_ref[:, :1] = x0i_ref[:, :1] + s0i_ref[:, :1]
        else:
            for s in range(tb):
                or_ref[s * w_rows:(s + 1) * w_rows, :] = perm_r[s]
                oi_ref[s * w_rows:(s + 1) * w_rows, :] = perm_i[s]
        return

    yr = jnp.concatenate(outs_r, axis=-1)  # (tb, q, r*p) natural [k2, k1]
    yi = jnp.concatenate(outs_i, axis=-1)

    if has_h:
        # z = conj(Y * H), H natural-order (q, r*p)
        hr = hr_ref[:]
        hi = hi_ref[:]
        zr = yr * hr - yi * hi
        zi = -(yr * hi + yi * hr)
    else:
        zr, zi = yr, yi
        if conj_out:
            zi = -zi
    if has_post:
        postr = postr_ref[:]  # (q, r*p) natural (zero beyond n_out)
        posti = posti_ref[:]
        outr = zr * postr - zi * posti
        outi = zr * posti + zi * postr
    else:
        outr, outi = zr, zi
    if has_addc:
        outr = outr + x0r_ref[:, :1].reshape(tb, 1, 1)
        outi = outi + x0i_ref[:, :1].reshape(tb, 1, 1)
    if flat_out:
        # flat (tb, m) out ref: per-k2 static lane-slice stores (a wide
        # lane-concat here crashes the Mosaic remote compiler)
        for k2 in range(q):
            or_ref[:, k2 * m1 : (k2 + 1) * m1] = outr[:, k2, :]
            oi_ref[:, k2 * m1 : (k2 + 1) * m1] = outi[:, k2, :]
    else:
        or_ref[:] = outr.reshape(tb * q, m1)
        oi_ref[:] = outi.reshape(tb * q, m1)


def _make_pass(
    m, r, p, q, direction, precision, interpret, p_in, pre, h, conj_out, post,
    batch_tile=None, in_perm=None, out_perm=None, emit_sum=False,
    add_const=False, full_out=False, gauss_mode=False,
    in_extra=0, out_extra=0, in_shift=False, dc_from_sum=False,
):
    """Build one vpur conv pass: fn(xr, xi) on (batch, p_in*r*q) 2D input,
    returning (batch, m) natural-order arrays.

    in_perm / out_perm: optional m-point permutations (gather convention)
    fused into the pass as in-VMEM Benes phases (ops/pallas/permute.py) —
    the Rader root-order gathers ride the kernel's existing HBM traversals
    instead of paying XLA's random-access gather penalty.  The (X, 128, 128)
    digit grid is exactly this kernel's (r, p, q) split, and with q == 128
    the natural flat index j1*(r*q) + a*q + j2 IS the (W, Z) row-major
    index (row j1*r + a), so the decomposition applies unchanged.
    """
    rdt = np.float32
    m1 = r * p
    has_inperm = in_perm is not None
    has_outperm = out_perm is not None
    has_sum = bool(emit_sum)
    has_addc = bool(add_const)
    if has_inperm:
        assert q == 128 and p_in == p and pre is None
    if has_outperm:
        assert p == 128 and h is None and post is None
    if full_out:
        assert has_outperm and has_addc and q == 128
    # Round-5 flat I/O: describe the pass's in/out as (batch, n) whole-
    # signal rows (the fast DMA class — CLAUDE.md round-5 rule) and do the
    # digit relayouts in VMEM (lane-slice stacks in, per-k2 slice-stores
    # out; grouped <=2048-lane concat stores for the Benes out-perm).
    flat_in = q == 128
    flat_out = q == 128
    if in_shift:
        assert flat_in and in_perm is not None and p_in == p
        in_extra = 1
    # aliasing is shape-legal when in and out are flat views of EQUAL
    # width (no input trim).  Plain passes: m == m.  The in_shift Rader
    # chain keeps every width at m+1 (raw p-wide input, wide pass-1
    # output, full_out pass-2 output) precisely so both passes stay
    # aliasable — full_out alone (m -> m+1) is not.
    in_w_total = m + in_extra
    out_w_total = m + (1 if full_out else 0) + out_extra
    in_place = (flat_in and flat_out and p_in == p
                and in_w_total == out_w_total
                and config.pallas_in_place)
    idt = np.int32
    dummy_i = np.zeros((1, 1), idt)
    dummy_f = np.zeros((1, 1), rdt)
    in_tabs = (dummy_i, dummy_i, dummy_f, dummy_i, dummy_i)
    out_tabs = (dummy_i, dummy_i, dummy_f, dummy_i, dummy_i)
    if has_inperm:
        in_tabs = permute.decompose(
            np.asarray(in_perm, dtype=np.int64), r
        )
    if has_outperm:
        out_tabs = permute.decompose(
            np.asarray(out_perm, dtype=np.int64), r
        )

    if gauss_mode:
        # Gauss 3-dot stage tables (fused.gauss_contract): 25% less MXU
        # work per stage than the (2p, 2p) block form — measured +2-17% in
        # the standalone two_stage/radix kernels (commit 1543b83); the
        # stage-A tables column-sliced to the p_in live input digits
        wdp = np.ascontiguousarray(
            twiddles.dft_matrix(p, direction)[:, :p_in]
        )
        stage_tabs = gauss_tables(wdp, precision, rdt) + gauss_tables(
            twiddles.dft_matrix(q, direction), precision, rdt
        )
    else:
        wp = calg.block_mid(twiddles.dft_matrix(p, direction), rdt)
        live = list(range(p_in)) + list(range(p, p + p_in))
        wpa = np.ascontiguousarray(wp[:, live])  # (2p, 2p_in)
        wq = calg.block_mid(twiddles.dft_matrix(q, direction), rdt)
        wp_hi, wp_lo = w_split(wpa, precision)
        wq_hi, wq_lo = w_split(wq, precision)
        stage_tabs = [wp_hi, wp_lo, wq_hi, wq_lo]
    t1 = twiddles.twiddle_table(r, p, direction)  # (r, p)
    t2 = twiddles.twiddle_table(m1, q, direction)  # (m1, q)
    t2 = np.swapaxes(t2.reshape(r, p, q), 1, 2).reshape(r * q, p)

    def tab(a, rows, cols):
        """Natural-order complex table as f32 (rows, cols) r/i pair."""
        full = np.zeros(rows * cols, np.complex128)
        if a is not None:
            full[: min(len(a), rows * cols)] = np.asarray(a)[: rows * cols]
        t = full.reshape(rows, cols)
        return (
            np.ascontiguousarray(t.real).astype(rdt),
            np.ascontiguousarray(t.imag).astype(rdt),
        )

    has_pre = pre is not None
    has_h = h is not None
    has_post = post is not None
    dummy = (np.zeros((1, 1), rdt), np.zeros((1, 1), rdt))
    pre_t = tab(pre, p_in, r * q) if has_pre else dummy
    h_t = tab(h, q, m1) if has_h else dummy
    post_t = tab(post, q, m1) if has_post else dummy

    consts = [
        *stage_tabs,
        np.ascontiguousarray(t1.real).astype(rdt),
        np.ascontiguousarray(t1.imag).astype(rdt),
        np.ascontiguousarray(t2.real).astype(rdt),
        np.ascontiguousarray(t2.imag).astype(rdt),
        *pre_t, *h_t, *post_t, *in_tabs, *out_tabs,
    ]

    def _tb(batch):
        if batch_tile:
            return min(batch_tile, batch)
        # fused.make_fused_radix_fn's measured rule (small tiles pipeline
        # best), with the extra natural-order tables charged to the budget
        copies = 24 + 3 * r.bit_length()
        # Benes phases hold ~6 extra (W, Z) copies per component per signal
        copies += 12 * (has_inperm + has_outperm)
        budget = max(config.pallas_vmem_limit, 112 * 2**20) - 12 * m
        budget -= sum(4 * c.size for c in consts[len(stage_tabs) + 4:])
        tb = max(1, budget // (copies * 4 * m))
        tb = 1 << (tb.bit_length() - 1)
        # measured at m=65536 (same run): tb=16 (3.94ms) > 8 (4.05) > 4 > 2
        tb = max(1, min(tb, 16, batch))
        if flat_in or flat_out:
            # flat (tb, n) blocks need tb % 8 == 0 (sublane divisibility)
            tb = 8 if tb < 16 else 16
        return tb

    w_rows = r * p  # (W, Z) rows of one signal, q == Z == 128

    def call(xr, xi, x0=None, sums=None):
        batch = xr.shape[0]
        tb = _tb(batch)
        pad_b = (-batch) % tb
        if pad_b:
            xr = jnp.pad(xr, ((0, pad_b), (0, 0)))
            xi = jnp.pad(xi, ((0, pad_b), (0, 0)))
        bpad = batch + pad_b
        k = functools.partial(
            _kernel, r, p, q, tb, p_in, precision, direction, has_pre,
            has_h, conj_out, has_post, has_inperm, has_outperm, has_sum,
            has_addc, flat_in, flat_out, full_out, gauss_mode, in_shift,
            dc_from_sum,
        )

        def bcast128(v):
            b = jnp.broadcast_to(
                v.reshape(batch, 1).astype(jnp.float32), (batch, 128)
            )
            if pad_b:
                b = jnp.pad(b, ((0, pad_b), (0, 0)))
            return b

        bspec128 = pl.BlockSpec(
            (tb, 128), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM
        )
        if has_addc:
            assert x0 is not None
            x0_arrs = [bcast128(x0[0]), bcast128(x0[1])]
            x0_specs = [bspec128] * 2
        else:
            x0_arrs = [jnp.zeros((1, 1), jnp.float32)] * 2
            x0_specs = None  # filled below once cspec exists
        if full_out:
            assert sums is not None
            s0_arrs = [bcast128(sums[0]), bcast128(sums[1])]
            s0_specs = [bspec128] * 2
        else:
            s0_arrs = [jnp.zeros((1, 1), jnp.float32)] * 2
            s0_specs = None
        if flat_in:
            in_w = (w_rows * q if has_inperm else p_in * r * q) + in_extra
            in_bspec = pl.BlockSpec(
                (tb, in_w), i32map(lambda i: (i, 0)),
                memory_space=pltpu.VMEM,
            )
            xr2 = xr.reshape(bpad, in_w)
            xi2 = xi.reshape(bpad, in_w)
        elif has_inperm:
            in_bspec = pl.BlockSpec(
                (tb * w_rows, q), i32map(lambda i: (i, 0)),
                memory_space=pltpu.VMEM,
            )
            xr2 = xr.reshape(bpad * w_rows, q)
            xi2 = xi.reshape(bpad * w_rows, q)
        else:
            in_bspec = pl.BlockSpec(
                (tb * p_in, r * q), i32map(lambda i: (i, 0)),
                memory_space=pltpu.VMEM,
            )
            xr2 = xr.reshape(bpad * p_in, r * q)
            xi2 = xi.reshape(bpad * p_in, r * q)
        if flat_out:
            out_w = out_w_total
            out_bspec = pl.BlockSpec(
                (tb, out_w), i32map(lambda i: (i, 0)),
                memory_space=pltpu.VMEM,
            )
            out_shape = [
                jax.ShapeDtypeStruct((bpad, out_w), jnp.float32)
            ] * 2
        elif has_outperm:
            out_bspec = pl.BlockSpec(
                (tb * r * q, p), i32map(lambda i: (i, 0)),
                memory_space=pltpu.VMEM,
            )
            out_shape = [
                jax.ShapeDtypeStruct((bpad * r * q, p), jnp.float32)
            ] * 2
        else:
            out_bspec = pl.BlockSpec(
                (tb * q, m1), i32map(lambda i: (i, 0)),
                memory_space=pltpu.VMEM,
            )
            out_shape = [
                jax.ShapeDtypeStruct((bpad * q, m1), jnp.float32)
            ] * 2

        def cspec(w):
            nd = w.ndim
            return pl.BlockSpec(
                w.shape, i32map(lambda i: (0,) * nd), memory_space=pltpu.VMEM
            )

        if x0_specs is None:
            x0_specs = [cspec(w) for w in x0_arrs]
        if s0_specs is None:
            s0_specs = [cspec(w) for w in s0_arrs]
        out_specs = [out_bspec, out_bspec]
        if has_sum:
            sum_bspec = pl.BlockSpec(
                (tb, 128), i32map(lambda i: (i, 0)),
                memory_space=pltpu.VMEM,
            )
            out_specs += [sum_bspec, sum_bspec]
            out_shape = list(out_shape) + [
                jax.ShapeDtypeStruct((bpad, 128), jnp.float32)
            ] * 2

        outs = pl.pallas_call(
            k,
            grid=(bpad // tb,),
            in_specs=[in_bspec, in_bspec] + x0_specs + s0_specs
            + [cspec(w) for w in consts],
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases={0: 0, 1: 1} if in_place else {},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=max(config.pallas_vmem_limit, 112 * 2**20)
            ),
            interpret=interpret,
        )(xr2, xi2, *x0_arrs, *s0_arrs, *[jnp.asarray(w) for w in consts])
        out_r, out_i = outs[0], outs[1]
        res_w = out_w_total
        res = (
            out_r.reshape(bpad, res_w)[:batch],
            out_i.reshape(bpad, res_w)[:batch],
        )
        if has_sum:
            return res, (outs[2][:batch, :1], outs[3][:batch, :1])
        return res

    return call


def make_radix_conv_fn(
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
    batch_tile=None,
    in_perm: Optional[np.ndarray] = None,
    out_perm: Optional[np.ndarray] = None,
    x0_add: bool = False,
    emit_sum: bool = False,
    full_out: bool = False,
    gauss: Optional[bool] = None,
    in_shift: bool = False,
) -> Callable:
    """Build fn: Cplx (..., n_in) -> Cplx (..., n_out) computing

        out = [post *] maybe_conj( FFT_m( conj( FFT_m([pre *] zeropad(x)) * H ) ) )

    with the same contract as conv.make_conv_fn, for m = r*128*128.

    in_perm / out_perm (m-point gather permutations): fused into pass 1's
    read resp. pass 2's write as in-VMEM Benes phases — the TPU analogue of
    RadersAvx2's in-register gathers (avx_raders.rs:243-307).  Requires
    n_in == m and pre is None (in) / post is None (out).

    Rader epilogue fusion (raders_algorithm.rs:202,219-233 fixups):
    * x0_add: apply becomes fn(x, const=(cr, ci)) and pass 2 adds the
      per-signal complex const to EVERY output bin in-kernel (the hoisted
      "+x0" fixup) — saves one XLA read+write round trip of the m-point
      pair.
    * emit_sum: apply returns ((out_r, out_i), (sum_r, sum_i)) where the
      sums are exact f32 per-signal input sums (shape (..., 1)) computed
      from pass 1's raw block — the Rader DC bin rides the kernel's HBM
      read instead of a separate XLA reduction pass.
    * full_out (requires x0_add, emit_sum, out_perm): pass 2 emits the
      COMPLETE (..., m+1) DC-first Rader output — the out_perm table is
      rolled by one position so the Benes network performs the layout
      shift for free, and the DC bin (x0 + sum) is stored in-kernel.
      apply returns the (..., m+1) pair directly (no sums tuple).
    """
    assert np.dtype(dtype) == np.complex64
    rpq = choose_rpq(m)
    assert rpq is not None, f"no radix conv split for m={m}"
    r, p, q = rpq
    n_in = n_in or m
    n_out = n_out or m
    if in_perm is not None:
        assert n_in == m and pre is None
    if out_perm is not None:
        assert post is None
    if full_out:
        assert x0_add and emit_sum and out_perm is not None and n_out == m
        n_out = m + 1
        # fold the DC-first "+1 position shift" into the permutation: the
        # element destined for flat position m parks at grid slot 0 (the
        # kernel moves it with one aligned single-lane store)
        out_perm = np.roll(np.asarray(out_perm), 1)
    precision = resolve_precision(precision, interpret)

    # live input row-groups: j < n_in covers b < ceil(n_in / (r*q)),
    # rounded up to a multiple of 8 so the (tb*p_in, r*q) input block keeps
    # a legal sublane extent for every tb (Mosaic rejected p_in = 33 at
    # m = 262144 on v5e)
    p_in = -(-n_in // (r * q))
    p_in = min(p, -(-p_in // 8) * 8)
    # zero-pad mask folded into the pre table when the trim is partial
    eff_pre = pre
    if eff_pre is None and n_in < p_in * (r * q):
        eff_pre = np.ones(n_in, np.complex128)

    gauss_mode = config.conv_radix_gauss if gauss is None else gauss
    if in_shift:
        # Rader whole-input mode: the caller hands the RAW (batch, m+1)
        # prime-length signal; pass 1 lane-rolls it in-VMEM (killing the
        # XLA x[1:] slice traversal) and every array in the chain stays
        # (batch, m+1) wide so BOTH passes alias their flat views.
        assert full_out and in_perm is not None and emit_sum and x0_add
    pass1 = _make_pass(
        m, r, p, q, direction, precision, interpret,
        p_in=p_in, pre=eff_pre, h=h, conj_out=False, post=None,
        batch_tile=batch_tile, in_perm=in_perm, emit_sum=emit_sum,
        gauss_mode=gauss_mode, in_shift=in_shift,
        out_extra=1 if in_shift else 0,
    )
    pass2 = _make_pass(
        m, r, p, q, direction, precision, interpret,
        p_in=p, pre=None, h=None, conj_out=conj_out, post=post,
        batch_tile=batch_tile, out_perm=out_perm, add_const=x0_add,
        full_out=full_out, gauss_mode=gauss_mode,
        in_extra=1 if in_shift else 0, dc_from_sum=in_shift,
    )

    def apply(x, const=None):
        xr, xi = x
        shape = xr.shape
        flat_r = xr.reshape(-1, shape[-1])
        flat_i = xi.reshape(-1, shape[-1])
        if shape[-1] < p_in * r * q:
            pad = p_in * r * q - shape[-1]
            flat_r = jnp.pad(flat_r, ((0, 0), (0, pad)))
            flat_i = jnp.pad(flat_i, ((0, 0), (0, pad)))
        p1 = pass1(flat_r, flat_i)
        sums = None
        if emit_sum:
            (zr, zi), sums = p1
        else:
            zr, zi = p1
        x0 = None
        if x0_add:
            assert const is not None
            x0 = (const[0].reshape(-1, 1), const[1].reshape(-1, 1))
        out_r, out_i = pass2(zr, zi, x0=x0, sums=sums if full_out else None)
        res = (
            out_r[:, :n_out].reshape(shape[:-1] + (n_out,)),
            out_i[:, :n_out].reshape(shape[:-1] + (n_out,)),
        )
        if emit_sum and not full_out:
            return res, (
                sums[0].reshape(shape[:-1] + (1,)),
                sums[1].reshape(shape[:-1] + (1,)),
            )
        return res

    return apply
