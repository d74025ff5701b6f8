"""Arbitrary permutations as a single Pallas kernel (lane gathers only).

Rader and Good-Thomas plans gather their inputs/outputs through index maps
(ops/raders.py, ops/good_thomas.py).  XLA lowers those to HBM random-access
gathers that measure ~12x below stream on v5e (~6.7 ms for an f32 pair at
(512, 65536) — the dominant cost of the 65537 Rader plan).  The reference's
answer on AVX was in-register index shuffles (avx_raders.rs:243-307); this
module is the TPU analogue: move the permutation into VMEM.

Mosaic's vector ISA offers exactly one arbitrary-rearrangement primitive:
`tpu.dynamic_gather` along the LANE axis within ONE vreg — i.e.
jnp.take_along_axis(x, idx, axis=-1) with the gathered axis <= 128
("Multiple source vregs along gather dimension" otherwise, measured), plus
cheap 128x128 lane/sublane transposes.  Any permutation of an
(X, Y=128, Z=128) grid factors into FIVE such phases (a generalized Benes
network over the digit grid, phases Z-Y-X-Y-Z):

    1. Z-phase   lane gather within each (x, y) row
    2. Y-phase   lane gather in the per-x (Z, Y)-transposed view
    3. X-phase   exact select tree over the X slices (X^2 masked
                 multiply-adds of (128, 128) tiles; 0/1 f32 masks make
                 each output element a single exact f32 pick)
    4. Y-phase   as 2
    5. Z-phase   as 1

The phase schedules exist by Konig's edge-coloring theorem applied twice:
once on the bipartite multigraph source-row -> target-row (row = (x, y),
color = the intermediate Z column each element rides), then per Z-column
on source-x -> target-x (color = intermediate Y lane).  For power-of-two
degrees the coloring is computed by Euler splitting (split a 2k-regular
multigraph into two k-regular halves along Euler circuits, recurse) —
O(E log C) exact, no matching solver.  Host work at plan build, cached.

The kernel is one HBM pass (in + out, 2 traversals of the f32 pair) vs the
XLA gather's same traffic PLUS its ~3x random-access penalty; measured v5e
numbers in tools/perf_permute.py.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import config
from .util import i32map, take_lane

_Y = 128  # sublane-digit extent (lane width of the transposed Y-gathers)
_Z = 128  # lane-digit extent (native gather window)


def _euler_split(edges: np.ndarray, n_nodes: int) -> Tuple[np.ndarray, np.ndarray]:
    """Split a 2k-regular bipartite multigraph into two k-regular halves.

    edges: (E, 2) int array of (left, right) node ids.  Returns
    (mask0, mask1) index arrays partitioning range(E).  Walks Euler
    circuits (every node has even degree; bipartite circuits have even
    length) assigning alternate edges to alternate halves, which balances
    the split at every node.
    """
    e = len(edges)
    adj_heads = [[] for _ in range(2 * n_nodes)]
    for i in range(e):
        adj_heads[edges[i, 0]].append(i)
        adj_heads[n_nodes + edges[i, 1]].append(i)
    ptr = [0] * (2 * n_nodes)
    used = np.zeros(e, dtype=bool)
    side = np.zeros(e, dtype=np.int8)
    for start in range(2 * n_nodes):
        while ptr[start] < len(adj_heads[start]):
            if used[adj_heads[start][ptr[start]]]:
                ptr[start] += 1
                continue
            node, parity = start, 0
            while True:
                lst = adj_heads[node]
                while ptr[node] < len(lst) and used[lst[ptr[node]]]:
                    ptr[node] += 1
                if ptr[node] >= len(lst):
                    break  # circuit closed back at a saturated node
                eid = lst[ptr[node]]
                used[eid] = True
                side[eid] = parity
                parity ^= 1
                left, right = edges[eid, 0], n_nodes + edges[eid, 1]
                node = right if node == left else left
    (idx0,) = np.nonzero(side == 0)
    (idx1,) = np.nonzero(side == 1)
    return idx0, idx1


def edge_color(src: np.ndarray, dst: np.ndarray, colors: int,
               n_nodes: int) -> np.ndarray:
    """Color E edges of a `colors`-regular bipartite multigraph so no two
    edges sharing a node get the same color.  colors must be a power of
    two (Euler-split recursion).  Returns (E,) int32 color ids."""
    assert colors & (colors - 1) == 0, colors
    out = np.zeros(len(src), dtype=np.int32)
    edges = np.stack([src, dst], axis=1)

    def rec(eids: np.ndarray, lo: int, span: int):
        if span == 1:
            out[eids] = lo
            return
        i0, i1 = _euler_split(edges[eids], n_nodes)
        rec(eids[i0], lo, span // 2)
        rec(eids[i1], lo + span // 2, span // 2)

    rec(np.arange(len(src)), 0, colors)
    return out


@functools.lru_cache(maxsize=64)
def _decompose_cached(perm_bytes: bytes, x_ext: int):
    perm = np.frombuffer(perm_bytes, dtype=np.int64)
    return _decompose(perm, x_ext)


def decompose(perm: np.ndarray, x_ext: int):
    """Cached 5-phase decomposition of `perm` (gather convention:
    out[t] = x[perm[t]]) on the (x_ext, 128, 128) grid.  Returns int32/f32
    tables (idx_z1 (W, Z), idx_y1 (X, Z, Y), sel (X, X, Z, Y),
    idx_y2 (X, Z, Y), idx_z2 (W, Z)) with W = X*Y, consumed by _kernel."""
    perm = np.ascontiguousarray(perm, dtype=np.int64)
    assert perm.shape == (x_ext * _Y * _Z,)
    return _decompose_cached(perm.tobytes(), x_ext)


def _decompose(perm: np.ndarray, x_ext: int):
    y, z = _Y, _Z
    m = x_ext * y * z
    w = x_ext * y
    t = np.arange(m, dtype=np.int64)
    xt, yt, zt = t // (y * z), (t // z) % y, t % z
    s = perm
    xs, ys, zs = s // (y * z), (s // z) % y, s % z

    # outer coloring: rows (x, y) x lanes z — the element's phase-2..4
    # journey happens inside Z-column cz
    ws = (xs * y + ys).astype(np.int64)
    wt = (xt * y + yt).astype(np.int64)
    cz = edge_color(ws, wt, z, w).astype(np.int64)

    idx_z1 = np.zeros((w, z), dtype=np.int32)
    idx_z1[ws, cz] = zs
    idx_z2 = np.zeros((w, z), dtype=np.int32)
    idx_z2[wt, zt] = cz

    # inner coloring per Z-column: rows x x lanes y — the element crosses
    # from slice xs to slice xt inside Y-lane cy
    idx_y1 = np.zeros((x_ext, z, y), dtype=np.int32)
    idx_y2 = np.zeros((x_ext, z, y), dtype=np.int32)
    src_x = np.zeros((x_ext, z, y), dtype=np.int32)
    order = np.argsort(cz, kind="stable")
    for ci in range(z):
        eids = order[ci * w : (ci + 1) * w]
        exs, eys = xs[eids], ys[eids]
        ext_, eyt = xt[eids], yt[eids]
        cy = edge_color(exs, ext_, y, x_ext)
        idx_y1[exs, ci, cy] = eys
        src_x[ext_, ci, cy] = exs
        idx_y2[ext_, ci, eyt] = cy

    # X-phase select masks: sel[xd, xs'] = 1 where slice xd takes its
    # (z, y) element from slice xs'
    sel = (
        src_x[:, None, :, :] == np.arange(x_ext, dtype=np.int32)[None, :, None, None]
    ).astype(np.float32)
    return idx_z1, idx_y1, sel, idx_y2, idx_z2


def _tree_pick(bools, vals):
    """Select among X (Z, Y) tiles via a binary tournament of X-1 vector
    selects.  bools[xs] is the 0/1 membership mask "this element sources
    from slice xs" (exactly one true per element).  The group-membership
    or-combines are pure functions of the constant sel tables, so XLA CSE
    hoists them out of the per-signal loop — the per-signal cost is X-1
    selects vs the fma path's X multiplies + X-1 adds (~2x fewer
    element-ops in the dominant X-phase)."""
    cur_v = list(vals)
    cur_b = list(bools)
    while len(cur_v) > 1:
        nv, nb = [], []
        for i in range(0, len(cur_v), 2):
            if i + 1 == len(cur_v):
                nv.append(cur_v[i])
                nb.append(cur_b[i])
                continue
            nv.append(jnp.where(cur_b[i + 1], cur_v[i + 1], cur_v[i]))
            nb.append(jnp.logical_or(cur_b[i], cur_b[i + 1]))
        cur_v, cur_b = nv, nb
    return cur_v[0]


def _apply_phases(v, x_ext, iz1, iy1, sel, iy2, iz2):
    """The five phases on one (W, Z) signal; sel is the unpacked (X, X)
    list-of-lists of (Z, Y) masks.  Every gather and transpose is kept
    strictly 2D per X-slice: Mosaic's dynamic_gather lowers 2D only
    ("Only 2D gather is supported", measured), and the gathered axis must
    be a single vreg (<= 128 lanes, "Multiple source vregs along gather
    dimension")."""
    y, z = _Y, _Z
    tree = config.permute_select == "tree"
    a = take_lane(v, iz1)  # (W, Z), 2D gather (x64-safe int32 indices)
    a3 = a.reshape(x_ext, y, z)
    b_l = []
    for x in range(x_ext):
        at = jnp.swapaxes(a3[x], 0, 1)  # (Z, Y) 128x128 transpose
        b_l.append(take_lane(at, iy1[x]))
    d_l = []
    for xd in range(x_ext):
        if tree:
            acc = _tree_pick([s >= 0.5 for s in sel[xd]], b_l)
        else:
            acc = None
            for xs_ in range(x_ext):
                term = sel[xd][xs_] * b_l[xs_]
                acc = term if acc is None else acc + term
        d = take_lane(acc, iy2[xd])
        d_l.append(jnp.swapaxes(d, 0, 1))  # back to (Y, Z)
    dt = jnp.stack(d_l, axis=0).reshape(x_ext * y, z)
    return take_lane(dt, iz2)


def _kernel(tb, x_ext, xr_ref, xi_ref, iz1_ref, iy1_ref, sel_ref, iy2_ref,
            iz2_ref, or_ref, oi_ref):
    iz1, iy1, iy2, iz2 = iz1_ref[:], iy1_ref[:], iy2_ref[:], iz2_ref[:]
    sel_a = sel_ref[:]
    sel = [[sel_a[xd, xs_] for xs_ in range(x_ext)] for xd in range(x_ext)]
    for s in range(tb):
        or_ref[s] = _apply_phases(xr_ref[s], x_ext, iz1, iy1, sel, iy2, iz2)
        oi_ref[s] = _apply_phases(xi_ref[s], x_ext, iz1, iy1, sel, iy2, iz2)


def choose_x(m: int) -> Optional[int]:
    """Digit extent X for length m on the (X, 128, 128) grid.  Any X works
    (the Euler-split colorings always use 128 colors; X only sets the node
    count and the select-tree size) but X is capped at 16: the select tree
    costs X^2 (128, 128) multiply-adds per signal and X = 16 already
    quadruples the VPU work of the gathers."""
    if m % (_Y * _Z):
        return None
    x_ext = m // (_Y * _Z)
    if x_ext < 1 or x_ext > 16:
        return None
    return x_ext


def permute_supported(m: int, dtype) -> bool:
    if np.dtype(dtype) != np.complex64:
        return False
    return choose_x(m) is not None


def _pick_tb(m: int) -> int:
    """Batch tile: ~10 live (W, Z) f32 copies per component under the VMEM
    budget."""
    budget = int(max(config.pallas_vmem_limit, 64 * 2**20) * 0.6)
    per_signal = 10 * 2 * 4 * m
    return int(max(1, min(16, budget // max(per_signal, 1))))


def make_permute_fn(
    perm: np.ndarray,
    dtype=np.complex64,
    interpret: bool = False,
    tb: Optional[int] = None,
) -> Callable:
    """Return fn: (re, im) (..., m) -> (..., m) computing x[..., perm] as
    one Pallas kernel (five in-VMEM phases, one HBM pass)."""
    perm = np.asarray(perm)
    m = perm.shape[0]
    x_ext = choose_x(m)
    assert x_ext is not None, f"no (X, 128, 128) grid for m={m}"
    idx_z1, idx_y1, sel, idx_y2, idx_z2 = decompose(perm, x_ext)
    if tb is None:
        tb = _pick_tb(m)

    kernel = functools.partial(_kernel, tb, x_ext)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=config.pallas_vmem_limit)
    w = x_ext * _Y

    def cspec(arr):
        nd = arr.ndim
        return pl.BlockSpec(
            arr.shape, i32map(lambda b: (0,) * nd), memory_space=pltpu.VMEM
        )

    def call(xr, xi):
        batch = xr.shape[0]
        pad = (-batch) % tb
        if pad:
            xr = jnp.pad(xr, ((0, pad), (0, 0)))
            xi = jnp.pad(xi, ((0, pad), (0, 0)))
        bspec = pl.BlockSpec(
            (tb, w, _Z), i32map(lambda b: (b, 0, 0)), memory_space=pltpu.VMEM
        )
        out_r, out_i = pl.pallas_call(
            kernel,
            grid=((batch + pad) // tb,),
            in_specs=[bspec, bspec, cspec(idx_z1), cspec(idx_y1),
                      cspec(sel), cspec(idx_y2), cspec(idx_z2)],
            out_specs=[bspec, bspec],
            out_shape=[
                jax.ShapeDtypeStruct((batch + pad, w, _Z), jnp.float32)
            ] * 2,
            compiler_params=cparams,
            interpret=interpret,
        )(
            xr.reshape(batch + pad, w, _Z), xi.reshape(batch + pad, w, _Z),
            jnp.asarray(idx_z1), jnp.asarray(idx_y1), jnp.asarray(sel),
            jnp.asarray(idx_y2), jnp.asarray(idx_z2),
        )
        out_r = out_r.reshape(batch + pad, m)
        out_i = out_i.reshape(batch + pad, m)
        if pad:
            out_r, out_i = out_r[:batch], out_i[:batch]
        return out_r, out_i

    def apply(x):
        xr, xi = x
        shape = xr.shape
        out_r, out_i = call(xr.reshape(-1, m), xi.reshape(-1, m))
        return out_r.reshape(shape), out_i.reshape(shape)

    return apply
