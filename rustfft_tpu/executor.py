"""Recipe -> JAX function compiler.

The reference builds a recipe into a tree of `Arc<dyn Fft<T>>` trait objects
with virtual dispatch at every level (plan.rs:326-410); here a recipe lowers
into one nested pure function that XLA traces and compiles as a single
program, so every stage boundary is fused by the compiler instead of crossed
by virtual dispatch.  All constant tables (DFT matrices, twiddles,
permutation indices, Rader/Bluestein spectra) are precomputed host-side in
f64 at build time — the analogue of the reference constructors' twiddle
precomputation (plan.rs:338-410) — and become XLA constants.

Built functions are memoized per (recipe, direction, dtype): the functional
analogue of the reference's per-planner FftCache (fft_cache.rs:5-39), except
that equal recipes share work across planners too because recipes are pure
hashable data.
"""
from __future__ import annotations

import functools

from collections import OrderedDict
from typing import Callable, Optional, Tuple

import numpy as np

from . import recipes
from .common import FftDirection
from .config import config
from .ops import bluestein as op_bluestein
from .ops import ct as op_ct
from .ops import dft as op_dft
from .ops import good_thomas as op_gt
from .ops import raders as op_raders

# Sizes whose DFT matrix is small enough that a middle-axis contraction beats
# transposing for a last-axis FFT.  Everything in the reference butterfly set
# qualifies (max 32); the TPU planner's dense-DFT recipes up to
# config.dense_dft_max qualify too.
_MATRIX_LEAF_MAX = 512

#: built-function memo, LRU-bounded: plans hold their own fn reference, so
#: eviction only drops the shared memo entry, never a live plan's function
_CACHE: "OrderedDict[Tuple, Callable]" = OrderedDict()
_CACHE_MAX = 512


def _pallas_mode() -> str:
    """Resolve config.use_pallas to 'tpu', 'interpret', or 'off'.

    'auto' enables the fused kernels only when the default JAX backend is a
    real TPU (the analogue of the reference planners' runtime CPU-feature
    detection, plan.rs:72-94); 'on' forces them, using the Pallas interpreter
    off-TPU (slow — testing only).
    """
    mode = config.use_pallas
    if mode == "off":
        return "off"
    import jax

    # TPU runtimes may present under plugin platform names (e.g. the tunneled
    # 'axon' platform), so sniff the device kind rather than the backend name.
    try:
        dev = jax.devices()[0]
        on_tpu = jax.default_backend() == "tpu" or "TPU" in (dev.device_kind or "")
    except RuntimeError:
        on_tpu = False
    if mode == "on":
        return "tpu" if on_tpu else "interpret"
    return "tpu" if on_tpu else "off"


def pallas_route(n: int, dtype, mode: Optional[str] = None) -> Optional[str]:
    """Name the whole-transform Pallas tier serving length n, or None (the
    recipe tree / XLA path).

    Tiers (all thresholds measured on v5e, see config):
      'dense'       whole-DFT MXU matmul (ops/pallas/dense.py): any length,
                    one HBM traversal — the small-n / small-prime tier
                    (gated by config.dense_max_n / dense_fallback_max_n).
      'lanepack'    batch-in-lanes (ops/pallas/lanepack.py): the small-n band
                    and every lane-misaligned composite (2^a*3^b etc.) its
                    VMEM bound admits — sublane stages need no 128-alignment.
      'radix'       radix-r fused (MXU 128x128 stages + VPU radix chain):
                    the 32k..262k band.
      'large'       two-kernel pipeline (ops/pallas/large.py): beyond VMEM.
      'large2f'     FUSED two-kernel pipeline (ops/pallas/large2f.py): the
                    top pow2 band 2^22..2^25 — 4 HBM traversals with
                    large3's digit plan (pass 2 fused into the column
                    stage, factorized twiddle tables).
      'large3'      three-kernel pipeline (ops/pallas/large3.py): fallback
                    for the top band when large2f is disabled/unsupported.
      'three_stage' / 'two_stage'  single-pass fused kernels (fused.py) for
                    lane-aligned mid sizes.

    The single source of truth for _maybe_fused's dispatch — also consumed
    by tools/inspect_plan.py and the routing tests.
    """
    if mode is None:
        mode = _pallas_mode()
    if mode == "off":
        return None
    from .ops.pallas import (
        dense, fused, lanepack, large, large2f, large3, largepad,
    )

    # tier 0: dense whole-DFT matmul — one MXU GEMM, any length; outranks
    # the factored tiers below config.dense_max_n (and backstops sizes no
    # other tier serves, below — primes / misaligned smalls).  pad_worth_it
    # keeps high-pad smooth sizes (144/160/192-class) on the XLA path,
    # which beats a 1.3x+-padded GEMM there (round-4 boundary sweep).
    if (
        config.dense_min_n <= n <= config.dense_max_n
        and dense.dense_supported(n, dtype)
        and dense.pad_worth_it(n)
    ):
        return "dense"

    if mode == "tpu" and n < config.pallas_min_n:
        if (
            config.dense_min_n <= n <= config.dense_fallback_max_n
            and dense.dense_supported(n, dtype)
            and dense.pad_worth_it(n)
        ):
            return "dense"
        return None

    aligned = None
    if fused.fused_supported(n, dtype):
        split = fused._choose_pq(n)
        aligned = split is not None and split[1] % 128 == 0

    # tier 1: lanepack for the small band, and for misaligned sizes (where
    # the lane-aligned kernels would waste most of each MXU/DMA row)
    if lanepack.lanepack_supported(n, dtype):
        if n <= config.lanepack_max_n or not aligned:
            return "lanepack"

    # tier 2.5: radix-r fused owns the 32k..262k band
    if config.use_radix_fused and fused.radix_supported(n, dtype):
        return "radix"

    # tier 4 outranks a feasible-but-slower single-kernel split at the top
    # of the fused range.  config.large_min_n assumes the radix tier is on;
    # with it off, the old 262144 threshold applies (measured: at 262144 the
    # large pipeline beats the two-stage kernel 609 vs 390 GF/s).
    large_min = config.large_min_n if config.use_radix_fused else min(
        config.large_min_n, 262144
    )
    # tier 5: the fused two-kernel pipeline owns the top band — 4 HBM
    # traversals beat large3's 6 at every supported size (see
    # config.large2f_min_n); large3 stays as the fallback
    if n >= max(
        large_min, config.large2f_min_n
    ) and large2f.large2f_supported(n, dtype):
        return "large2f"
    # tier 5.5: past large2f's VMEM edge (2^26: the only split's pass-1
    # block exhausts VMEM) the factored-twiddle 3-kernel pipeline takes
    # over — large3's structure with large2f's tiny tables, so the P2 <= 16
    # table cap doesn't apply
    if n >= max(large_min, config.large3f_min_n) and large3.large3f_supported(
        n, dtype
    ):
        return "large3f"
    if n >= max(large_min, config.large3_min_n) and large3.large3_supported(
        n, dtype
    ):
        return "large3"
    if n >= large_min and large.large_supported(n, dtype):
        return "large"

    if aligned:
        if n >= config.three_stage_min_n and fused.three_stage_supported(n, dtype):
            return "three_stage"
        return "two_stage"
    if fused.fused_supported(n, dtype) and mode != "tpu":
        # interpret mode keeps exercising the plain fused kernel off-TPU
        return "two_stage"
    # backstop for the (MAX_FUSED_N, large_min) gap: sizes too big for the
    # single-pass kernels but below the large tier's threshold, with no
    # radix-r split (e.g. 393216 = 3*2^17 — radix needs r = n/16384 a pow2).
    # large_supported's own bounds keep misaligned composites out (their
    # q1*q2 rest is never a 128-multiple, so kernel-B tiling fails), so this
    # never shadows the large_pad / dense tiers below.  Deliberately ignores
    # large_min: the alternative here is the XLA six-step, not a faster tier.
    if large.large_supported(n, dtype):
        return "large"
    # tier 6: lane-misaligned big composites (pow5/3^k, ...) run the
    # padded-lane pipeline instead of the XLA six-step
    if n >= config.largepad_min_n and largepad.largepad_supported(n, dtype):
        return "large_pad"
    # dense backstop: no factored tier serves n (primes, misaligned smalls)
    if (
        config.dense_min_n <= n <= config.dense_fallback_max_n
        and dense.dense_supported(n, dtype)
    ):
        return "dense"
    return None


def _maybe_fused(n: int, direction: FftDirection, dtype, mode: str) -> Optional[Callable]:
    """Build the fused whole-transform kernel pallas_route names, if any."""
    route = pallas_route(n, dtype, mode)
    if route is None:
        return None
    from .ops.pallas import (
        dense, fused, lanepack, large, large2f, large3, largepad,
    )

    interpret = mode == "interpret"
    builder = {
        "dense": dense.make_dense_fft_fn,
        "lanepack": lanepack.make_lanepack_fn,
        "radix": fused.make_fused_radix_fn,
        "large": large.make_large_fft_fn,
        "large2f": large2f.make_large2f_fft_fn,
        "large3": large3.make_large3_fft_fn,
        "large3f": functools.partial(large3.make_large3_fft_fn, factored=True),
        "large_pad": largepad.make_largepad_fft_fn,
        "three_stage": fused.make_fused_three_stage_fn,
        "two_stage": fused.make_fused_two_stage_fn,
    }[route]
    kwargs = {}
    if route == "radix":
        kwargs["variant"] = config.radix_variant
    elif route == "two_stage":
        kwargs["variant"] = config.two_stage_variant
    elif route == "lanepack":
        kwargs["variant"] = config.lanepack_variant
    if config.pallas_in_place:
        # in-place is legal where the in/out views share a shape and block
        # index map: dense always, radix always (p == q == 128 by
        # construction), two-stage only for square splits with the
        # in-kernel transpose (p >= 128), lanepack only in flat mode
        # (identical (tb, 65536) views)
        if route == "dense":
            kwargs["in_place"] = True
        elif route == "radix":
            kwargs["in_place"] = True
        elif route == "two_stage":
            pq = fused._choose_pq(n)
            if pq is not None and pq[0] == pq[1] and pq[0] >= 128:
                kwargs["in_place"] = True
        elif route == "lanepack":
            if (config.lanepack_variant == "flat"
                    and lanepack.flat_pack(n) is not None):
                kwargs["in_place"] = True
    return builder(n, direction, dtype, interpret=interpret, **kwargs)


def _is_matrix_leaf(recipe: recipes.Recipe) -> bool:
    return (
        isinstance(recipe, (recipes.Dft, recipes.Butterfly))
        and recipe.length <= _MATRIX_LEAF_MAX
    )


def build(
    recipe: recipes.Recipe,
    direction: FftDirection,
    dtype,
    allow_fused: bool = True,
) -> Callable:
    """Return fn: Cplx (..., n) -> Cplx (..., n) computing the unnormalized DFT.

    Functions operate on complex-pair tuples (re, im) of real arrays — the
    TPU runtime has no complex dtypes (see ops/calg.py).

    allow_fused=False pins the literal recipe decomposition (no whole-subtree
    Pallas-kernel substitution anywhere in the tree) — used by the hand-built
    algorithm.py constructors, whose contract is the *specific* requested
    algorithm (the reference's directly-constructible types,
    src/algorithm/mod.rs:1-21), e.g. `Dft` as an independent accuracy oracle.
    """
    dtype = np.dtype(dtype)
    mode = _pallas_mode()
    # every config field that is baked into built functions must key the
    # cache, or mutating config (config.py documents this) returns stale fns
    key = (
        recipe, direction, dtype, mode, allow_fused,
        config.pallas_min_n, config.lanepack_max_n, config.three_stage_min_n,
        config.large_min_n, config.use_radix_fused, config.pallas_precision,
        config.pallas_vmem_limit, config.matmul_precision,
        config.conv_radix_min_m, config.rader_gather, config.large3_min_n,
        config.largepad_min_n, config.large2f_min_n, config.dense_max_n,
        config.dense_fallback_max_n, config.use_bconv_fused,
        config.large3f_min_n, config.dense_min_n, config.pallas_in_place,
        config.radix_variant, config.two_stage_variant, config.large_gauss,
        config.permute_select, config.rader_full_out, config.lanepack_variant,
        config.conv_radix_gauss, config.rader_in_shift,
    )
    fn = _CACHE.get(key)
    if fn is None:
        if allow_fused:
            fn = _maybe_fused(recipe.length, direction, dtype, mode)
        if fn is None:
            fn = _build(recipe, direction, dtype, allow_fused)
        _CACHE[key] = fn
        if len(_CACHE) > _CACHE_MAX:
            _CACHE.popitem(last=False)
    else:
        _CACHE.move_to_end(key)
    return fn


def _build(
    recipe: recipes.Recipe,
    direction: FftDirection,
    dtype,
    allow_fused: bool = True,
) -> Callable:
    if isinstance(recipe, (recipes.Dft, recipes.Butterfly)):
        return op_dft.make_dft_fn(recipe.length, direction, dtype)

    if isinstance(recipe, recipes.Radix4):
        base_fn = build(recipe.base, direction, dtype, allow_fused)
        return op_ct.make_ct_chain_fn(
            (4,) * recipe.k, recipe.base.length, base_fn, direction, dtype
        )

    if isinstance(recipe, recipes.RadixN):
        base_fn = build(recipe.base, direction, dtype, allow_fused)
        return op_ct.make_ct_chain_fn(
            recipe.factors, recipe.base.length, base_fn, direction, dtype
        )

    if isinstance(recipe, (recipes.MixedRadix, recipes.MixedRadixSmall)):
        p = recipe.left.length
        q = recipe.right.length
        right_fn = build(recipe.right, direction, dtype, allow_fused)
        if _is_matrix_leaf(recipe.left):
            return op_ct.make_ct_stage_fn(p, q, right_fn, direction, dtype)
        left_fn = build(recipe.left, direction, dtype, allow_fused)
        return op_ct.make_ct_stage_general_fn(
            p, q, left_fn, right_fn, direction, dtype
        )

    if isinstance(recipe, (recipes.GoodThomas, recipes.GoodThomasSmall)):
        p = recipe.left.length
        q = recipe.right.length
        left_fn = build(recipe.left, direction, dtype, allow_fused)
        right_fn = build(recipe.right, direction, dtype, allow_fused)
        return op_gt.make_good_thomas_fn(
            p, q, left_fn, right_fn, dtype, pallas_mode=_pallas_mode()
        )

    if isinstance(recipe, recipes.Raders):
        # hot path: the cyclic-convolution core as one Pallas kernel, with
        # the root-permutation gathers and DC fixups staying in XLA
        mode = _pallas_mode()
        m = recipe.inner.length
        if mode != "off" and allow_fused:
            from .ops.pallas import conv

            if conv.conv_any_supported(m, dtype):
                return conv.make_raders_fn(
                    recipe.length, direction, dtype,
                    interpret=(mode == "interpret"),
                )
        inner_fn = build(recipe.inner, direction, dtype, allow_fused)
        return op_raders.make_raders_fn(recipe.length, inner_fn, direction, dtype)

    if isinstance(recipe, recipes.Bluesteins):
        # hot path: the whole chirp-multiply / double-FFT / chirp-multiply
        # pipeline as one Pallas kernel (one HBM pass instead of ~10)
        mode = _pallas_mode()
        m = recipe.inner.length
        # no pallas_min_n gate: the conv kernel replaces ~10 XLA passes, so
        # it wins at much smaller sizes than the plain fused kernel
        if mode != "off" and allow_fused:
            from .ops.pallas import conv, convlarge

            if conv.conv_any_supported(m, dtype):
                return conv.make_bluestein_fn(
                    recipe.length, m, direction, dtype,
                    interpret=(mode == "interpret"),
                )
            if (
                config.use_bconv_fused
                and convlarge.bconv_supported(m, dtype)
                and pallas_route(m, dtype, mode) == "large"
            ):
                # huge inner on the large tier: the 3-kernel fused
                # convolution (~11 traversals of m vs ~16 glued).  Radix-
                # tier inners (m < large_min_n) keep the glued route: the
                # single-kernel radix FFT already runs at 2 traversals, so
                # the fusion win there is marginal and unmeasured.
                return convlarge.make_bluestein_large_fn(
                    recipe.length, m, direction, dtype,
                    interpret=(mode == "interpret"),
                )
        inner_fn = build(recipe.inner, direction, dtype, allow_fused)
        return op_bluestein.make_bluestein_fn(
            recipe.length, recipe.inner.length, inner_fn, direction, dtype
        )

    raise TypeError(f"Unknown recipe node: {recipe!r}")
