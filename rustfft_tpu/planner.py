"""Planners: recipe design + plan construction with caching.

`FftPlannerScalar` reproduces the reference scalar planner's decision tree
exactly (src/plan.rs:270-665) so its recipe unit tests port 1:1; it is the
capability-parity baseline.  `FftPlannerTpu` is the hardware-tuned planner —
the analogue of the reference's per-ISA planners (avx_planner.rs etc.), but
driven by a TPU cost model (dense DFT-matmul up to config.dense_dft_max,
MXU-friendly radix chains) instead of benchmark-derived AVX constants.
`FftPlanner` auto-dispatches, mirroring plan.rs:67-126.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import numpy as np

from . import recipes
from .common import FftDirection, canonical_complex_dtype
from .config import config
from .math_utils import PrimeFactors
from .plan import FftPlan

#: reference: plan.rs:127-129
MAX_RADIXN_FACTOR = 7
MAX_RADER_PRIME_FACTOR = 23

#: reference: plan.rs:610-634
BUTTERFLY_SIZES = frozenset(
    {2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 13, 16, 17, 19, 23, 24, 27, 29, 31, 32}
)

#: reference: plan.rs:433-435 (note: excludes 12, includes 13)
_BUTTERFLY_PRODUCT_SIZES = (
    2, 3, 4, 5, 6, 7, 8, 9, 11, 13, 16, 17, 19, 23, 24, 27, 29, 31, 32,
)


class FftCache:
    """(len, direction) -> FftPlan, separate forward/inverse maps.

    reference: src/fft_cache.rs:5-39.
    """

    def __init__(self) -> None:
        self._forward: Dict[int, FftPlan] = {}
        self._inverse: Dict[int, FftPlan] = {}

    def _map(self, direction: FftDirection) -> Dict[int, FftPlan]:
        return self._forward if direction is FftDirection.FORWARD else self._inverse

    def get(self, length: int, direction: FftDirection) -> Optional[FftPlan]:
        return self._map(direction).get(length)

    def insert(self, plan: FftPlan) -> None:
        self._map(plan.fft_direction())[len(plan)] = plan

    def contains_fft(self, length: int, direction: FftDirection) -> bool:
        return length in self._map(direction)


class _PlannerBase:
    """Shared recipe-cache / plan-cache plumbing (plan.rs:270-335)."""

    def __init__(self, dtype=np.complex64) -> None:
        self.dtype = canonical_complex_dtype(dtype)
        # one FftCache per config state (see _recipe_cache_key): a plan built
        # under one pallas mode / VMEM limit must not be served under another
        self._algorithm_caches: Dict[Tuple, FftCache] = {}
        self.recipe_cache: Dict[Tuple, recipes.Recipe] = {}

    @property
    def algorithm_cache(self) -> FftCache:
        """The plan cache for the *current* config state."""
        key = self._recipe_cache_key()
        cache = self._algorithm_caches.get(key)
        if cache is None:
            cache = self._algorithm_caches[key] = FftCache()
        return cache

    # -- public API (plan.rs:289-309) --
    def plan_fft(self, length: int, direction: FftDirection) -> FftPlan:
        recipe = self.design_fft_for_len(length)
        cache = self.algorithm_cache
        cached = cache.get(length, direction)
        if cached is not None:
            return cached
        plan = FftPlan(recipe, direction, self.dtype)
        cache.insert(plan)
        return plan

    def plan_fft_forward(self, length: int) -> FftPlan:
        return self.plan_fft(length, FftDirection.FORWARD)

    def plan_fft_inverse(self, length: int) -> FftPlan:
        return self.plan_fft(length, FftDirection.INVERSE)

    #: subclasses with a native (C++ plancore) recipe designer set this
    _native_design = False

    def _recipe_cache_key(self) -> Tuple:
        """Config state the recipe design depends on; () when independent.

        The TPU planner branches on the pallas mode / VMEM limit / dense-DFT
        threshold, all mutable config — recipes designed under one setting
        must not be served under another (the executor cache, which had the
        same class of bug, keys on its config inputs the same way).

        Planners with a native designer (`_native_design`) key on
        `config.use_native`: the C++ plancore and the Python tree are
        parity-pinned (tests/test_native.py), so mixing them is benign in
        practice, but the key keeps the hygiene uniform.
        """
        if self._native_design:
            return (bool(config.use_native),)
        return ()

    # -- recipe design entry (plan.rs:312-323) --
    def design_fft_for_len(self, length: int) -> recipes.Recipe:
        if length < 0:
            # unrepresentable in the reference (usize); explicit error here
            raise ValueError(f"FFT length must be >= 0, got {length}")
        if length < 2:
            return recipes.Dft(length)
        key = (length,) + self._recipe_cache_key()
        cached = self.recipe_cache.get(key)
        if cached is not None:
            return cached
        recipe = None
        if self._native_design and config.use_native:
            from . import native

            recipe = native.design_recipe(length)
        if recipe is None:
            factors = PrimeFactors.compute(length)
            recipe = self.design_fft_with_factors(length, factors)
        self.recipe_cache[key] = recipe
        return recipe

    def design_fft_with_factors(
        self, length: int, factors: PrimeFactors
    ) -> recipes.Recipe:
        raise NotImplementedError

    def _reference_prime_recipe(
        self, length: int, raders_factors: PrimeFactors
    ) -> recipes.Recipe:
        """The reference Rader's-vs-Bluestein's rule (plan.rs:636-665).

        Rader's if n-1 has no prime factor > MAX_RADER_PRIME_FACTOR, else
        Bluestein's with inner size = next-pow2(2n-1), or 3*2^(k-2) when
        that still clears the bound.
        """
        if any(
            f.value > MAX_RADER_PRIME_FACTOR
            for f in raders_factors.get_other_factors()
        ):
            inner_len = min(_bluestein_inner_candidates(length))
            return recipes.Bluesteins(length, self.design_fft_for_len(inner_len))
        inner_fft = self.design_fft_with_factors(length - 1, raders_factors)
        return recipes.Raders(inner_fft)


def _bluestein_inner_candidates(length: int) -> Tuple[int, ...]:
    """Valid Bluestein inner sizes >= 2n-1: next pow2, and 3*2^(k-2) when it
    still clears the bound (plan.rs:645-657)."""
    min_inner = 2 * length - 1
    pow2 = 1 << (min_inner - 1).bit_length()
    three = pow2 // 4 * 3
    return (pow2, three) if three >= min_inner else (pow2,)


class FftPlannerScalar(_PlannerBase):
    """Exact port of the reference scalar planner's decision tree.

    reference: src/plan.rs:270-665.  Selection order
    (design_fft_with_factors, plan.rs:412-425): butterfly -> prime
    (Rader's/Bluestein's) -> butterfly product -> RadixN -> partitioned
    MixedRadix.

    Recipe design runs in the native C++ plancore when available
    (native/plancore.cc, exact behavioral parity pinned by
    tests/test_native.py); this Python tree is the always-available fallback
    and the readable specification.
    """

    _native_design = True

    def design_fft_with_factors(
        self, length: int, factors: PrimeFactors
    ) -> recipes.Recipe:
        butterfly = self._design_butterfly_algorithm(length)
        if butterfly is not None:
            return butterfly
        if factors.is_prime():
            return self._design_prime(length)
        product = self._design_butterfly_product(length)
        if product is not None:
            return product
        if factors.has_factors_leq(MAX_RADIXN_FACTOR):
            return self._design_radixn(factors)
        left_factors, right_factors = factors.partition_factors()
        return self._design_mixed_radix(left_factors, right_factors)

    def _design_butterfly_algorithm(self, length: int) -> Optional[recipes.Recipe]:
        """reference: plan.rs:610-634."""
        if length in BUTTERFLY_SIZES:
            return recipes.Butterfly(length)
        return None

    def _design_butterfly_product(self, length: int) -> Optional[recipes.Recipe]:
        """n = b1*b2 with both butterflies, min-sum pair (plan.rs:427-472)."""
        if length > 992 or (length & (length - 1)) == 0:
            return None
        limit = math.ceil(math.sqrt(length)) + 1
        min_sum = None
        found: Optional[Tuple[int, int]] = None
        for left in _BUTTERFLY_PRODUCT_SIZES:
            if left >= limit:
                break
            right = length // left
            if left * right == length and right in _BUTTERFLY_PRODUCT_SIZES:
                s = left + right
                if min_sum is None or s < min_sum:
                    min_sum = s
                    found = (left, right)
        if found is None:
            return None
        left_len, right_len = found
        left_fft = self.design_fft_for_len(left_len)
        right_fft = self.design_fft_for_len(right_len)
        if math.gcd(left_len, right_len) == 1:
            return recipes.GoodThomasSmall(left_fft, right_fft)
        return recipes.MixedRadixSmall(left_fft, right_fft)

    def _design_mixed_radix(
        self, left_factors: PrimeFactors, right_factors: PrimeFactors
    ) -> recipes.Recipe:
        """reference: plan.rs:474-506."""
        left_len = left_factors.get_product()
        right_len = right_factors.get_product()
        left_fft = self.design_fft_with_factors(left_len, left_factors)
        right_fft = self.design_fft_with_factors(right_len, right_factors)
        if left_len < 31 and right_len < 31:
            if math.gcd(left_len, right_len) == 1:
                return recipes.GoodThomasSmall(left_fft, right_fft)
            return recipes.MixedRadixSmall(left_fft, right_fft)
        return recipes.MixedRadix(left_fft, right_fft)

    def _design_radixn(self, factors: PrimeFactors) -> recipes.Recipe:
        """Base-butterfly choice + Radix4/RadixN chain (plan.rs:508-607)."""
        p2 = factors.get_power_of_two()
        p3 = factors.get_power_of_three()
        p5 = next(
            (f.count for f in factors.get_other_factors() if f.value == 5), 0
        )
        p7 = next(
            (f.count for f in factors.get_other_factors() if f.value == 7), 0
        )

        if factors.has_factors_gt(MAX_RADIXN_FACTOR):
            base_len = factors.product_above(MAX_RADIXN_FACTOR)
        elif p7 == 0 and p5 == 0 and p3 < 2:
            if p3 == 0:
                assert p2 > 5  # butterflies catch smaller powers of two
                base_len = 8 if p2 % 2 == 1 else 16
            else:
                assert p2 > 3
                base_len = 24 if p2 % 2 == 1 else 12
        elif p2 > 0 and p3 > 0:
            excess_p2 = max(p2 - p3, 0)
            base_len = {0: 6, 1: 12}.get(excess_p2, 24)
        elif p3 > 2:
            base_len = 27
        elif p3 > 1:
            base_len = 9
        elif p7 > 0:
            base_len = 7
        else:
            assert p5 > 0
            base_len = 5

        base_fft = self.design_fft_for_len(base_len)
        cross_len = factors.get_product() // base_len

        # Radix4 when the cross is 4^k (plan.rs:568-573)
        if cross_len & (cross_len - 1) == 0:
            cross_bits = cross_len.bit_length() - 1
            if cross_bits % 2 == 0:
                return recipes.Radix4(cross_bits // 2, base_fft)

        # RadixN factor list ordered 7,6,5,3,2,4s-last (plan.rs:575-606)
        factor_list = []
        for f in (7, 6, 5, 3):
            while cross_len % f == 0:
                cross_len //= f
                factor_list.append(f)
        assert cross_len & (cross_len - 1) == 0
        cross_bits = cross_len.bit_length() - 1
        if cross_bits % 2 == 1:
            factor_list.append(2)
        factor_list.extend([4] * (cross_bits // 2))
        return recipes.RadixN(tuple(factor_list), base_fft)

    def _design_prime(self, length: int) -> recipes.Recipe:
        """Rader's vs Bluestein's for prime n (plan.rs:636-665)."""
        return self._reference_prime_recipe(
            length, PrimeFactors.compute(length - 1)
        )


class FftPlannerTpu(_PlannerBase):
    """TPU cost-model planner.

    Replaces the reference's benchmark-derived per-ISA planners
    (avx_planner.rs:113-1012) with decisions shaped by the TPU memory
    hierarchy: minimize passes over HBM and keep every DFT stage a large
    MXU-friendly contraction.

    * n <= config.dense_dft_max: one dense DFT-matrix matmul (single fused
      pass; the MXU makes O(n^2) cheaper than multi-stage O(n log n) at these
      sizes).
    * composite n: near-balanced split n = p*q (largest divisor <= sqrt(n)),
      recursing on both halves — each level is one matmul/fused-kernel stage
      + twiddle + transpose, and on TPU backends the executor swaps any
      subtree whose length fits VMEM for the single-pass fused Pallas kernel
      (ops/pallas/fused.py).
    * prime n: same Rader's-vs-Bluestein's rule as the reference (the
      number theory doesn't change), but Bluestein inner sizes prefer
      2^a or 3*2^a, which stay on the fast pow2 path.
    """

    def _recipe_cache_key(self) -> Tuple:
        # every mutable-config input of the TPU recipe design (pallas mode
        # via _on_tpu(), VMEM limit via conv_supported, dense-DFT threshold)
        from . import executor

        return (
            executor._pallas_mode(),
            config.pallas_vmem_limit,
            config.dense_dft_max,
            config.bconv_misaligned,
            config.bconv_misaligned_min_n,
            config.bconv_misaligned_max_pad,
            config.conv_radix_min_m,
        )

    def design_fft_with_factors(
        self, length: int, factors: PrimeFactors
    ) -> recipes.Recipe:
        if length <= config.dense_dft_max:
            return recipes.Dft(length)
        if factors.is_prime():
            return self._design_prime(length)
        # Awkward composites (a prime factor too big for a dense leaf, e.g.
        # 1234 = 2*617) decompose into Rader/Bluestein subtrees with poor
        # kernel shapes; measured on v5e, one whole-n fused Bluestein
        # convolution wins (+20%) whenever its inner size is MXU-aligned.
        if self._on_tpu() and factors.has_factors_gt(config.dense_dft_max):
            m = self._aligned_conv_inner(length)
            if m is not None:
                return recipes.Bluesteins(length, self.design_fft_for_len(m))
        # Lane-misaligned hole band (~8k..64k: largepad loses below 65536,
        # q < 8 splits fail Mosaic): ODD composites with no whole-n Pallas
        # tier ride a fused Bluestein onto the radix conv core — the same
        # trick that won at 746497, at ~2-3.5x the points.  Measured wins
        # 15625/19683/59049 (+12..+32% over XLA); even sizes and pad > 3.5
        # are recorded negatives (see config.bconv_misaligned*).
        if (
            self._on_tpu()
            and config.bconv_misaligned
            and length % 2 == 1
            and length >= config.bconv_misaligned_min_n
        ):
            from . import executor

            if executor.pallas_route(length, self.dtype) is None:
                m = self._radix_conv_inner(length)
                if m is not None:
                    return recipes.Bluesteins(length, self.design_fft_for_len(m))
        return self._design_composite(length, factors)

    def _radix_conv_inner(self, length: int) -> Optional[int]:
        """Smallest radix-conv-core Bluestein inner m = r*16384 >= 2n-1
        within the measured pad cap, or None.  The dense conv core is
        deliberately excluded: it measured below XLA at every hole-band
        size (tools/perf_blue_misaligned.py)."""
        from .ops.pallas import conv, conv_radix

        min_inner = 2 * length - 1
        for r in (2, 4, 8, 16):
            m = r * 16384
            if m < min_inner:
                continue
            if (
                m <= config.bconv_misaligned_max_pad * length
                and m >= config.conv_radix_min_m
                and conv_radix.radix_conv_supported(m, self.dtype)
                and conv.conv_supported(m, self.dtype)
            ):
                return m
            return None
        return None

    @staticmethod
    def _on_tpu() -> bool:
        from . import executor

        # 'interpret' counts so use_pallas='on' exercises these planner
        # branches in CPU test runs
        return executor._pallas_mode() in ("tpu", "interpret")

    def _aligned_conv_inner(self, length: int) -> Optional[int]:
        """Smallest conv-kernel-aligned Bluestein inner size m >= 2n-1.

        The reference AVX planner searches all 2^a*3^b candidates above the
        bound instead of just pow2 / 3*2^k (avx_planner.rs:945-994); the TPU
        analogue searches the same family but filters for conv-kernel lane
        alignment (the inner FFT runs inside the fused convolution kernel,
        ops/pallas/conv.py) and minimizes m — fewer points beats smoother
        structure on the MXU.
        """
        from .ops.pallas import conv

        candidates = set(_bluestein_inner_candidates(length))
        min_inner = 2 * length - 1
        # all 2^a*3^b in [2n-1, 2*(2n-1)): beyond 2x the bound the pow2
        # candidate is always at least as small
        p3 = 1
        while p3 < 2 * min_inner:
            m = p3
            while m < min_inner:
                m *= 2
            if m < 2 * min_inner:
                candidates.add(m)
            p3 *= 3
        # NEGATIVE result (measured on v5e): the tightest multiple of 128
        # >= 2n-1 is also conv-feasible and has fewer points, but LOSES to
        # the nearest 2^a*3^b candidate — n=1234: m=2560 (20x128 split) ran
        # 102 vs m=3072 (24x128) 107 GF/s; n=7919: m=15872 (124x128) 189 vs
        # m=16384 (128x128, both stages full-width K=256) 211.  MXU-shaped
        # splits beat raw point count; keep the 2^a*3^b family.
        #
        # Round-5 core-preference rule (measured same-run, 2026-08-19):
        # above 32768 the radix conv core beats the dense core decisively
        # (m=32768: prime path 347.5 vs 191.9 GF/s; bconv 264.6 vs 169.2),
        # and a LARGER radix-core m beats a smaller dense-core m (19683:
        # m=65536 radix 229.0 vs m=41472 dense 142.5) — so prefer the
        # smallest radix-core-capable candidate once past the small-m
        # dense band, falling back to the smallest dense-supported m.
        from .ops.pallas import conv_radix

        best_dense = None
        for m in sorted(candidates):
            radix_ok = (
                m >= config.conv_radix_min_m
                and conv_radix.radix_conv_supported(m, self.dtype)
                and conv.conv_supported(m, self.dtype)
            )
            if radix_ok:
                return m
            if conv.conv_supported(m, self.dtype):
                if m < 32768:
                    return m
                if best_dense is None:
                    best_dense = m
        return best_dense

    def _design_composite(
        self, length: int, factors: PrimeFactors
    ) -> recipes.Recipe:
        # Near-balanced split p*q, p <= q.  Balance keeps both einsum /
        # fused-kernel stages MXU-shaped (neither factor degenerates into a
        # tiny contraction) and the recursion depth — i.e. passes over HBM —
        # at ceil(log_base(n)) of the dense-DFT leaf size.
        p = self._choose_left_factor(length, factors)
        q = length // p
        left = self.design_fft_for_len(p)
        right = self.design_fft_for_len(q)
        return recipes.MixedRadix(left, right)

    @staticmethod
    def _choose_left_factor(length: int, factors: PrimeFactors) -> int:
        # Largest divisor <= sqrt(n), enumerated from the prime factorization
        # (a raw scan down from sqrt(n) costs ~1e6 trial divisions for
        # n = 2 * large_prime).  Composite n always has one in [2, sqrt(n)].
        target = math.isqrt(length)
        primes = []
        if factors.get_power_of_two():
            primes.append((2, factors.get_power_of_two()))
        if factors.get_power_of_three():
            primes.append((3, factors.get_power_of_three()))
        primes.extend((f.value, f.count) for f in factors.get_other_factors())

        best = 1

        def walk(i: int, divisor: int) -> None:
            nonlocal best
            if divisor > best:
                best = divisor
            if i == len(primes):
                return
            value, count = primes[i]
            d = divisor
            walk(i + 1, d)
            for _ in range(count):
                d *= value
                if d > target:
                    break
                walk(i + 1, d)

        walk(0, 1)
        assert best > 1, length
        return best

    def _design_prime(self, length: int) -> recipes.Recipe:
        inner_len_rader = length - 1
        raders_factors = PrimeFactors.compute(inner_len_rader)
        if self._on_tpu():
            # measured preference order on v5e: Rader when p-1 is itself
            # MXU-aligned for the fused convolution kernel (m ~= n), else
            # Bluestein with the smallest aligned inner (m ~= 2n), else the
            # reference rules below.
            from .ops.pallas import conv

            if conv.conv_supported(inner_len_rader, self.dtype):
                return recipes.Raders(
                    self.design_fft_with_factors(inner_len_rader, raders_factors)
                )
            m = self._aligned_conv_inner(length)
            if m is not None:
                return recipes.Bluesteins(length, self.design_fft_for_len(m))
            # Huge primes: no single-kernel conv inner exists.  Rader's
            # inner (n-1) usually has awkward factors and falls to the XLA
            # six-step or the padded-lane tier; a Bluestein inner from the
            # 2^a*3^b family that lands on a fused Pallas tier wins despite
            # ~2x the points (measured on v5e: 746497 via Rader + XLA inner
            # = 70 GF/s, and via Rader + the large_pad inner the glued
            # gathers+double-FFT still read 18 GF/s-eq same-run where the
            # fused 3-kernel bconv read 161 — tools/perf_bconv_phases.py,
            # 2026-08-19).  Only a *fast aligned* tier on n-1 justifies the
            # glued Rader route; large_pad/dense-tier inners do not.
            from . import executor

            inner_route = executor.pallas_route(inner_len_rader, self.dtype)
            if inner_route in (None, "large_pad", "dense"):
                m = self._routed_bluestein_inner(length)
                if m is not None:
                    return recipes.Bluesteins(length, self.design_fft_for_len(m))
        return self._reference_prime_recipe(length, raders_factors)

    def _routed_bluestein_inner(self, length: int) -> Optional[int]:
        """Smallest 2^a*3^b inner m >= 2n-1 served by a fused Pallas tier."""
        from . import executor

        min_inner = 2 * length - 1
        candidates = set(_bluestein_inner_candidates(length))
        p3 = 1
        while p3 < 2 * min_inner:
            m = p3
            while m < min_inner:
                m *= 2
            if m < 2 * min_inner:
                candidates.add(m)
            p3 *= 3
        for m in sorted(candidates):
            if executor.pallas_route(m, self.dtype) is not None:
                return m
        return None


class FftPlanner(_PlannerBase):
    """Auto-dispatching planner (reference: plan.rs:67-126).

    The reference picks AVX -> SSE -> NEON -> WASM-SIMD -> scalar at
    construction; here the only hardware target is TPU (XLA also runs the
    same program on CPU/GPU backends), so this delegates to FftPlannerTpu.
    """

    def __init__(self, dtype=np.complex64) -> None:
        super().__init__(dtype)
        self._inner = FftPlannerTpu(dtype)
        # share caches so plan_fft and design_fft_for_len agree
        self._inner._algorithm_caches = self._algorithm_caches
        self._inner.recipe_cache = self.recipe_cache

    # delegate config keying too, so the shared caches key identically
    _recipe_cache_key = FftPlannerTpu._recipe_cache_key

    def design_fft_with_factors(
        self, length: int, factors: PrimeFactors
    ) -> recipes.Recipe:
        return self._inner.design_fft_with_factors(length, factors)
