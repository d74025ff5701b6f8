"""Fused double-FFT convolution kernel — the Bluestein/Rader hot path.

Both prime-size algorithms share one core (reference:
bluesteins_algorithm.rs:100-135, raders_algorithm.rs:174-233):

    out = [post .] conj-or-not( FFT_m( conj( FFT_m([pre .] x) . H ) ) )

i.e. a cyclic convolution of length m by a precomputed spectrum H, using the
conjugation-as-inverse trick so both transforms share one direction.  At the
XLA level this costs ~10 HBM passes (chirp multiplies, padding, pointwise,
and two multi-stage FFTs); here the whole pipeline runs inside one Pallas
kernel per batch tile — one HBM read + one write.

Layout scheme (m = p*q, all data 2D blocks (tb*p, q)):

  FFT #1 (j = j1*q + j2):  stage A contracts the sublane j1 axis against
  the block DFT_p (dot_general output order makes [j2, k1] free), twiddle
  w_m^(k1 j2), stage B contracts j2 -> natural-transposed [k1, k2] layout.

  The pointwise spectrum multiply uses H pre-reshaped to that exact [k1, k2]
  layout (host-side transpose of H.reshape(q, p)).

  FFT #2 re-decomposes the frequency index k = k2*p + k1 as m = q*p — its
  input [j1'=k2, j2'=k1] is *already* the current layout read column-wise, so
  stage A' contracts the lane axis (block_last DFT_q right-matmul), twiddle,
  and stage B' contracts sublanes weights-as-lhs, landing the result flat in
  natural order after one lane-preserving leading permute.

Zero transposes of the lane dimension anywhere.

Kernel MXU work: 4 GEMM stages = 24*2*(p+q) bf16-flops/element at bf16x3.
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
from .fused import (_choose_pq, contract_rhs, contract_wlhs,
                    resolve_precision, w_split)

from .util import i32map


def conv_supported(m: int, dtype) -> bool:
    """The lane-aligned kernel needs an MXU-shaped split of m and c64 data."""
    if np.dtype(dtype) != np.complex64:
        return False
    split = _choose_pq(m)
    if split is None or split[1] % 128 != 0:
        return False
    p, q = split
    # ~24 live f32 copies of the (tb>=1, p, q) tile + two table sets
    consts = 4 * (4 * p * p + 4 * q * q + 8 * p * q)
    return consts + 24 * 4 * m <= int(config.pallas_vmem_limit * 0.9)


def _conv_core_fn(m, direction, dtype, **kw):
    """Pick the convolution core for inner length m: the radix-structured
    two-kernel core for big r*128*128 inners (half/third the MXU flops of
    the dense single kernel — crossover measured at m >= 65536, where the
    dense 2*24*(p+q) flops/point dominate the one extra HBM round-trip),
    else the single-kernel dense core."""
    from . import conv_radix

    if (
        m >= config.conv_radix_min_m
        and conv_radix.radix_conv_supported(m, dtype)
    ):
        return conv_radix.make_radix_conv_fn(m, direction, dtype, **kw)
    return make_conv_fn(m, direction, dtype, **kw)


def conv_any_supported(m: int, dtype) -> bool:
    """Some fused conv kernel applies: the lane-aligned one above, or the
    lanepack (m-on-sublanes) one for lane-misaligned m (lanepack.py)."""
    from . import lanepack

    return conv_supported(m, dtype) or lanepack.lanepack_conv_supported(m, dtype)


def _pick_batch_tile(
    batch: int, m: int, p: int, q: int, p_in: Optional[int] = None,
    p_out: Optional[int] = None,
) -> int:
    # subtract the constant tables (DFT blocks + twiddles + H + pre/post)
    # from the budget, as fused._pick_batch_tile does — near the feasibility
    # boundary the combined working set must still fit vmem_limit_bytes.
    # The boundary-stage trim slices the stage-A/B' DFT blocks and the
    # in/out tiles to the live row-groups (p_in/p_out); mid-pipeline stages
    # still span the full (p, q) conv width.
    p_in = p if p_in is None else p_in
    p_out = p if p_out is None else p_out
    consts = 6 * (4 * p * p_in + 4 * p * p_out + 4 * q * q) + 4 * (
        4 * m + p_in * q + p_out * q
    )
    budget = int(config.pallas_vmem_limit * 0.7) - consts
    # ~4 live f32 copies at the input tile width, ~16 at the full conv
    # width, ~4 at the output tile width
    per_row = 4 * (4 * p_in * q + 16 * m + 4 * p_out * q)
    tb = max(1, budget // per_row)
    tb = 1 << (tb.bit_length() - 1)
    # cap raised 128 -> 256 after the r3 clean-run sweep: at 1009 (m=2048)
    # tb=256 measured +10% over 128 (2.60 vs 2.87 ms); 512 fails the
    # compile (VMEM) and the budget bound rejects it anyway
    return max(1, min(tb, 256, batch))


def _kernel(p, q, tb, p_in, p_out, precision, conj_out, has_pre, has_post,
            xr_ref, xi_ref, wp_hi_ref, wp_lo_ref, wpo_hi_ref, wpo_lo_ref,
            wq_hi_ref, wq_lo_ref, t1r_ref, t1i_ref, t2r_ref, t2i_ref,
            hr_ref, hi_ref, prer_ref, prei_ref, postr_ref, posti_ref,
            or_ref, oi_ref):
    """(tb*p_in, q) [j1, j2] -> (tb*p_out, q) [k2'', k1''] flat natural order.

    Only the first p_in row-groups carry input — the zero tail of the
    length-m buffer is never streamed, synthesized, or contracted (stage A's
    DFT matrix is column-sliced to the live rows) — and only the first p_out
    row-groups of the result are computed and written back (stage B' is
    row-sliced likewise).
    """

    def dot3(x, w_hi, w_lo, dims):
        return contract_rhs(x, w_hi, w_lo, dims, precision)

    def dot3_wlhs(w_hi, w_lo, x, dims):
        return contract_wlhs(w_hi, w_lo, x, dims, precision)

    sub = (((1,), (1,)), ((), ()))
    # contracting wq's dim 1 right-multiplies by block_mid^T == block_last
    # (DFT matrices are symmetric), the correct form for [re | im] lane packs
    lane = (((2,), (1,)), ((), ()))

    xr = xr_ref[:].reshape(tb, p_in, q)
    xi = xi_ref[:].reshape(tb, p_in, q)

    if has_pre:
        # pre-multiply (Bluestein chirp; zero beyond n => padding)
        pr = prer_ref[:]  # (p_in, q) [j1, j2]
        pi = prei_ref[:]
        vr = xr * pr - xi * pi
        vi = xr * pi + xi * pr
    else:
        vr, vi = xr, xi

    # ---- FFT #1, stage A: DFT_p over sublane j1 ----
    # wpA arrives column-sliced to the LIVE rows (2p, 2p_in): the zero tail
    # of the length-m buffer (j1 >= p_in) contributes nothing, so it is
    # neither synthesized nor contracted — K = 2*p_in instead of 2p.
    xb = jnp.concatenate([vr, vi], axis=1)  # (tb, 2p_in, q)
    a = dot3(xb, wp_hi_ref[:], wp_lo_ref[:], sub)  # (tb, q, 2p) [j2, k1]
    ar, ai = a[:, :, :p], a[:, :, p:]
    t1r = t1r_ref[:]  # (q, p) [j2, k1]
    t1i = t1i_ref[:]
    br = ar * t1r - ai * t1i
    bi = ar * t1i + ai * t1r

    # ---- FFT #1, stage B: DFT_q over sublane j2 -> [k1, k2] ----
    bb = jnp.concatenate([br, bi], axis=1)  # (tb, 2q, p)
    y = dot3(bb, wq_hi_ref[:], wq_lo_ref[:], sub)  # (tb, p, 2q) [k1, k2]
    yr, yi = y[:, :, :q], y[:, :, q:]

    # ---- pointwise: z = conj(Y * H), H arrives [k1, k2]-shaped (p, q) ----
    hr = hr_ref[:]
    hi = hi_ref[:]
    zr = yr * hr - yi * hi
    zi = -(yr * hi + yi * hr)  # conj

    # ---- FFT #2 over k = k2*p + k1, decomposed m = q*p ----
    # input [j1'=k2 (lanes), j2'=k1 (sublanes)] is the current layout.
    # stage A': DFT_q over the lane axis (right-matmul, block_last form)
    zb = jnp.concatenate([zr, zi], axis=2)  # (tb, p, 2q)
    c = dot3(zb, wq_hi_ref[:], wq_lo_ref[:], lane)
    # block_mid(W)^T = block_last(W) for symmetric DFT matrices, so wq serves
    # both: contracting its rows (lane form) right-multiplies correctly.
    cr, ci = c[:, :, :q], c[:, :, q:]  # (tb, p, q) [j2'=k1, k1''] -- k1'' lanes
    t2r = t2r_ref[:]  # (p, q) [j2', k1'']
    t2i = t2i_ref[:]
    dr_ = cr * t2r - ci * t2i
    di_ = cr * t2i + ci * t2r

    # stage B': DFT_p over sublane j2', weights-as-lhs -> leading k2''.
    # wpo arrives row-sliced to the WANTED outputs (2p_out, 2p): frequencies
    # k2'' >= p_out are sliced off post-kernel anyway, so M = 2*p_out.
    db = jnp.concatenate([dr_, di_], axis=1)  # (tb, 2p, q)
    e = dot3_wlhs(wpo_hi_ref[:], wpo_lo_ref[:], db, sub)  # (2p_out, tb, q)
    e = jnp.transpose(e, (1, 0, 2))  # (tb, 2p_out, q) — lane-preserving
    er, ei = e[:, :p_out, :], e[:, p_out:, :]  # [k2'', k1''] = flat natural
    if conj_out:
        ei = -ei
    if has_post:
        postr = postr_ref[:]  # (p_out, q) in the same flat layout
        posti = posti_ref[:]
        outr = er * postr - ei * posti
        outi = er * posti + ei * postr
    else:
        outr, outi = er, ei
    or_ref[:] = outr.reshape(tb * p_out, q)
    oi_ref[:] = outi.reshape(tb * p_out, q)


def make_bluestein_fn(
    n: int,
    m: int,
    direction: FftDirection,
    dtype,
    interpret: bool = False,
    batch_tile: Optional[int] = None,
) -> Callable:
    """Whole Bluestein transform of length n (inner length m) as one kernel.

    Same plan-time precomputation as ops/bluestein.py (reference:
    bluesteins_algorithm.rs:62-87): chirp as pre/post tables, inner-FFT
    spectrum of the symmetric-wrapped scaled conjugate chirp as H.
    """
    from ..bluestein import bluestein_tables

    chirp, h_fft = bluestein_tables(n, m, direction)
    return _conv_core_fn(
        m,
        direction,
        dtype,
        h=h_fft,
        pre=chirp,
        post=chirp,
        conj_out=True,
        n_in=n,
        n_out=n,
        interpret=interpret,
        batch_tile=batch_tile,
    )


def make_raders_fn(
    p_prime: int,
    direction: FftDirection,
    dtype,
    interpret: bool = False,
    batch_tile: Optional[int] = None,
) -> Callable:
    """Whole Rader transform of prime length p as gathers + one conv kernel.

    Same plan-time precomputation as ops/raders.py (reference:
    raders_algorithm.rs:86-109).  The reference's "+x[0] to the DC bin before
    the second transform" (raders_algorithm.rs:219-221) is algebraically
    hoisted out of the kernel: FFT(c + conj(x0)*e0) = FFT(c) + conj(x0), so
    the fixup becomes one fused elementwise add after the kernel.
    """
    from ..raders import raders_tables

    from . import conv_radix

    m = p_prime - 1
    perm_in, inv_gather, b_fft = raders_tables(p_prime, direction)
    perm_in32 = perm_in.astype(np.int32)
    inv_gather32 = inv_gather.astype(np.int32)

    # In-kernel permutations when the (X<=16, 128, 128) grid exists — the
    # TPU analogue of RadersAvx2's in-register gathers.  The input gather
    # reads from the p-length signal at indices in [1, p-1]; as a true
    # m-permutation it is x[..., 1:][perm_in - 1].  Preferred form: FUSED
    # into the radix conv core's two passes (zero extra HBM traffic, in_perm
    # rides pass 1's read and out_perm pass 2's write — conj_out=True folds
    # the epilogue conj so the core emits conj(D)[inv] directly).  Fallback:
    # standalone Benes kernels around the dense core (one extra HBM
    # round-trip each, still no random-access penalty).
    in_perm_fn = out_perm_fn = None
    fused_perms = False
    use_radix = (
        m >= config.conv_radix_min_m
        and conv_radix.radix_conv_supported(m, dtype)
    )
    kernel_perms = (
        config.rader_gather == "kernel" and permute.permute_supported(m, dtype)
    )
    full_out = False
    if use_radix and kernel_perms:
        # x0_add/emit_sum fuse the Rader epilogue fixups into the two
        # passes; full_out additionally folds the DC-first concat into
        # pass 2's rolled out-perm (measured ~1.5 ms of XLA concat at
        # (512, 65537)) — with it on, the core IS the whole transform.
        full_out = bool(config.rader_full_out)
        # in_shift additionally feeds the RAW (batch, p) signal to pass 1
        # (one in-VMEM lane roll replaces the XLA x[1:] slice traversal)
        # and keeps every chain array (batch, p) wide so both passes alias
        in_shift = full_out and bool(config.rader_in_shift)
        core = conv_radix.make_radix_conv_fn(
            m, direction, dtype, h=b_fft, conj_out=True,
            interpret=interpret, batch_tile=batch_tile,
            in_perm=perm_in - 1, out_perm=inv_gather,
            x0_add=True, emit_sum=True, full_out=full_out,
            in_shift=in_shift,
        )
        fused_perms = True
    else:
        core = _conv_core_fn(m, direction, dtype, h=b_fft,
                             interpret=interpret, batch_tile=batch_tile)
        if kernel_perms:
            in_perm_fn = permute.make_permute_fn(
                perm_in - 1, interpret=interpret
            )
            out_perm_fn = permute.make_permute_fn(
                inv_gather, interpret=interpret
            )

    def gather_last(v, idx):
        """Pair gather v[..., idx] with a strategy switch (config.rader_gather).

        'kernel' (default) = the Benes Pallas kernel above, falling back to
        'lane' when no (X, 128, 128) grid exists.  'packed' (see calg.take)
        = one complex64 gather moving 8-byte elements (needs backend complex
        support).  'lane' = plain last-axis takes.  'row' = transpose so the
        gather rides the MAJOR axis (each gathered row is a contiguous
        batch-length run) and transpose back — measured NO better (XLA
        canonicalizes the transpose pair away; documented negative).
        """
        if config.rader_gather == "row" and v[0].ndim == 2:
            return (jnp.take(v[0].T, idx, axis=0).T,
                    jnp.take(v[1].T, idx, axis=0).T)
        return calg.take(v, idx, axis=-1)

    def apply(x):
        xr, xi = x
        # rest[t] = conj(D[inv] + conj(x0)) = conj(D[inv]) + x0
        if fused_perms:
            # core applies both permutations, the conj, AND the Rader
            # fixups in-kernel: pass 2 adds x0 to every bin, pass 1 emits
            # the exact f32 sum of x[1:] for the DC bin (out[0] = x[0] +
            # A[0] = x[0] + sum(x[1:]), raders_algorithm.rs:202; A[0] is
            # permutation-invariant)
            x0 = (xr[..., :1], xi[..., :1])
            if full_out:
                # pass 2 emits the complete DC-first (..., p) output
                if in_shift:
                    # pass 1 consumes the raw p-wide signal directly
                    return core((xr, xi), const=x0)
                return core((xr[..., 1:], xi[..., 1:]), const=x0)
            rest, sums = core((xr[..., 1:], xi[..., 1:]), const=x0)
            out0 = (x0[0] + sums[0], x0[1] + sums[1])
            return calg.concat_last(out0, rest)
        # out[0] = x[0] + A[0] = sum(x)  (A[0] = sum over permuted inputs)
        out0 = (
            jnp.sum(xr, axis=-1, keepdims=True),
            jnp.sum(xi, axis=-1, keepdims=True),
        )
        if in_perm_fn is not None:
            a = in_perm_fn((xr[..., 1:], xi[..., 1:]))
        else:
            a = gather_last(x, jnp.asarray(perm_in32))
        d = core(a)
        if out_perm_fn is not None:
            gr, gi = out_perm_fn(d)
        else:
            gr, gi = gather_last(d, jnp.asarray(inv_gather32))
        rest = (gr + xr[..., :1], -gi + xi[..., :1])
        return calg.concat_last(out0, rest)

    return apply


def make_conv_fn(
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
    batch_tile: Optional[int] = None,
) -> Callable:
    """Build fn: Cplx (..., n_in) -> Cplx (..., n_out) computing

        out = [post *] maybe_conj( FFT_m( conj( FFT_m([pre *] zeropad(x)) * H ) ) )

    `h`, `pre`, `post` are complex128 host arrays of length m (pre/post may
    be length <= m; they are zero-extended, which implements the Bluestein
    zero-padding for free).  n_in/n_out default to m.
    """
    assert np.dtype(dtype) == np.complex64
    if not conv_supported(m, dtype):
        # lane-misaligned m: the lanepack (m-on-sublanes) conv core
        from . import lanepack

        return lanepack.make_lanepack_conv_fn(
            m, direction, dtype, h=h, pre=pre, post=post, conj_out=conj_out,
            n_in=n_in, n_out=n_out, interpret=interpret, precision=precision,
        )
    split = _choose_pq(m)
    assert split is not None, f"no conv split for m={m}"
    p, q = split
    n_in = n_in or m
    n_out = n_out or m
    precision = resolve_precision(precision, interpret)
    rdt = np.float32

    # only ceil(n/q) row-groups of the length-m buffer carry real input /
    # wanted output; the dead rows are never streamed, computed, or written
    # (the kernel's boundary-stage DFT matrices are sliced to match)
    p_in = -(-n_in // q)
    p_out = -(-n_out // q)

    # pre table doubles as the zero-padding mask for the partial last row.
    # When there is no pre table and no sub-row padding (Rader: n_in == m),
    # the kernel skips the multiply entirely (has_pre=False -> dummy table).
    has_pre = pre is not None or n_in < p_in * q
    pre_full = np.zeros(p_in * q if has_pre else 1, dtype=np.complex128)
    if pre is not None:
        pre_full[: len(pre)] = pre
    elif has_pre:
        pre_full[:n_in] = 1.0
    has_post = post is not None
    post_full = np.zeros(p_out * q if has_post else 1, dtype=np.complex128)
    if post is not None:
        post_full[: min(len(post), p_out * q)] = post[: p_out * q]

    # tables in the layouts the kernel consumes (dummies stay (1, 1))
    pre2 = pre_full.reshape(p_in, q) if has_pre else pre_full.reshape(1, 1)
    h2 = np.ascontiguousarray(h.reshape(q, p).T)  # [k1, k2]
    post2 = post_full.reshape(p_out, q) if has_post else post_full.reshape(1, 1)

    wp = calg.block_mid(twiddles.dft_matrix(p, direction), rdt)
    wq = calg.block_mid(twiddles.dft_matrix(q, direction), rdt)
    # stage A contracts only the live input row-groups (K = 2*p_in), and
    # stage B' emits only the wanted output row-groups (M = 2*p_out) — the
    # dead rows/cols of the block DFT matrix are sliced off host-side
    live = list(range(p_in)) + list(range(p, p + p_in))
    want = list(range(p_out)) + list(range(p, p + p_out))
    wpa = np.ascontiguousarray(wp[:, live])  # (2p, 2p_in)
    wpo = np.ascontiguousarray(wp[want, :])  # (2p_out, 2p)
    t1 = twiddles.twiddle_table(p, q, direction).T  # (q, p) [j2, k1]
    t2 = twiddles.twiddle_table(q, p, direction).T  # (p, q) [j2', k1'']

    wp_hi, wp_lo = w_split(wpa, precision)
    wpo_hi, wpo_lo = w_split(wpo, precision)
    wq_hi, wq_lo = w_split(wq, precision)

    consts = [
        wp_hi, wp_lo, wpo_hi, wpo_lo, wq_hi, wq_lo,
        np.ascontiguousarray(t1.real).astype(rdt),
        np.ascontiguousarray(t1.imag).astype(rdt),
        np.ascontiguousarray(t2.real).astype(rdt),
        np.ascontiguousarray(t2.imag).astype(rdt),
        np.ascontiguousarray(h2.real).astype(rdt),
        np.ascontiguousarray(h2.imag).astype(rdt),
        pre2.real.astype(rdt), pre2.imag.astype(rdt),
        post2.real.astype(rdt), post2.imag.astype(rdt),
    ]

    def call(xr, xi):
        batch = xr.shape[0]
        tb = batch_tile or _pick_batch_tile(batch, m, p, q, p_in, p_out)
        tb = min(tb, batch)
        pad_b = (-batch) % tb
        if pad_b:
            xr = jnp.pad(xr, ((0, pad_b), (0, 0)))
            xi = jnp.pad(xi, ((0, pad_b), (0, 0)))
        bpad = batch + pad_b
        kernel = functools.partial(
            _kernel, p, q, tb, p_in, p_out, precision, conj_out, has_pre,
            has_post,
        )
        in_bspec = pl.BlockSpec((tb * p_in, q), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)
        out_bspec = pl.BlockSpec((tb * p_out, q), i32map(lambda i: (i, 0)), memory_space=pltpu.VMEM)

        def cspec(w):
            return pl.BlockSpec(w.shape, i32map(lambda i: (0, 0)), memory_space=pltpu.VMEM)

        out_r, out_i = pl.pallas_call(
            kernel,
            grid=(bpad // tb,),
            in_specs=[in_bspec, in_bspec] + [cspec(w) for w in consts],
            out_specs=[out_bspec, out_bspec],
            out_shape=[jax.ShapeDtypeStruct((bpad * p_out, q), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=config.pallas_vmem_limit
            ),
            interpret=interpret,
        )(
            xr.reshape(bpad * p_in, q),
            xi.reshape(bpad * p_in, q),
            *[jnp.asarray(w) for w in consts],
        )
        out_r = out_r.reshape(bpad, p_out * q)[:batch, :n_out]
        out_i = out_i.reshape(bpad, p_out * q)[:batch, :n_out]
        return out_r, out_i

    def apply(x):
        xr, xi = x
        shape = xr.shape
        flat_r = xr.reshape(-1, shape[-1])
        flat_i = xi.reshape(-1, shape[-1])
        if shape[-1] < p_in * q:  # pad only to the trimmed row-group boundary
            flat_r = jnp.pad(flat_r, ((0, 0), (0, p_in * q - shape[-1])))
            flat_i = jnp.pad(flat_i, ((0, 0), (0, p_in * q - shape[-1])))
        out_r, out_i = call(flat_r, flat_i)
        return (
            out_r.reshape(shape[:-1] + (n_out,)),
            out_i.reshape(shape[:-1] + (n_out,)),
        )

    return apply
