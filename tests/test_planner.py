"""Planner recipe tests — port of the reference planner unit tests.

reference: src/plan.rs:668-894.  Recipes are pure data here, so the pointer
-equality cache checks become identity (`is`) checks.
"""
import numpy as np
import pytest

from rustfft_tpu import FftDirection, FftPlanner, FftPlannerScalar, FftPlannerTpu
from rustfft_tpu import recipes
from rustfft_tpu.config import config


class TestScalarParityPlanner:
    """Exact ports of plan.rs:700-894."""

    def test_plan_scalar_trivial(self):
        # plan.rs:700-709 — lengths 0 and 1 use Dft
        planner = FftPlannerScalar()
        for length in range(2):
            plan = planner.design_fft_for_len(length)
            assert plan == recipes.Dft(length)
            assert plan.length == length

    def test_plan_scalar_largepoweroftwo(self):
        # plan.rs:711-721 — powers of 2 above 64 use Radix4
        planner = FftPlannerScalar()
        for pow in range(6, 32):
            length = 1 << pow
            plan = planner.design_fft_for_len(length)
            assert isinstance(plan, recipes.Radix4), plan
            assert plan.length == length

    def test_plan_scalar_butterflies(self):
        # plan.rs:723-745
        planner = FftPlannerScalar()
        for n in [2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 13, 16, 17, 19, 23, 24, 27, 29, 31, 32]:
            assert planner.design_fft_for_len(n) == recipes.Butterfly(n)

    def test_plan_scalar_radixn(self):
        # plan.rs:747-776 — products of several small primes become RadixN
        planner = FftPlannerScalar()
        for pow2 in range(2, 5):
            for pow3 in range(2, 5):
                for pow5 in range(2, 5):
                    for pow7 in range(2, 5):
                        length = 2**pow2 * 3**pow3 * 5**pow5 * 7**pow7
                        plan = planner.design_fft_for_len(length)
                        assert isinstance(plan, recipes.RadixN), (length, plan)
                        assert plan.length == length

    def test_plan_scalar_mixedradixsmall(self):
        # plan.rs:778-791
        planner = FftPlannerScalar()
        for length in [12 * 3, 6 * 27]:
            plan = planner.design_fft_for_len(length)
            assert isinstance(plan, recipes.MixedRadixSmall), (length, plan)
            assert plan.length == length

    def test_plan_scalar_goodthomasbutterfly(self):
        # plan.rs:793-805
        planner = FftPlannerScalar()
        for length in [3 * 5, 3 * 7, 5 * 7, 11 * 13]:
            plan = planner.design_fft_for_len(length)
            assert isinstance(plan, recipes.GoodThomasSmall), (length, plan)
            assert plan.length == length

    def test_plan_scalar_bluestein_vs_rader(self):
        # plan.rs:807-830
        difficult_primes = [59, 83, 107, 149, 167, 173, 179, 359, 719, 1439, 2879]
        easy_primes = [
            53, 61, 67, 71, 73, 79, 89, 97, 101, 103, 109, 113, 127, 131, 137,
            139, 151, 157, 163, 181, 191, 193, 197, 199,
        ]
        planner = FftPlannerScalar()
        for length in difficult_primes:
            plan = planner.design_fft_for_len(length)
            assert isinstance(plan, recipes.Bluesteins), (length, plan)
            assert plan.length == length
        for length in easy_primes:
            plan = planner.design_fft_for_len(length)
            assert isinstance(plan, recipes.Raders), (length, plan)
            assert plan.length == length

    def test_scalar_fft_cache(self):
        # plan.rs:832-858 — same-direction plans are reused; directions are not
        planner = FftPlannerScalar()
        a = planner.plan_fft(1234, FftDirection.FORWARD)
        b = planner.plan_fft(1234, FftDirection.FORWARD)
        assert a is b
        planner = FftPlannerScalar()
        a = planner.plan_fft(1234, FftDirection.INVERSE)
        b = planner.plan_fft(1234, FftDirection.INVERSE)
        assert a is b
        planner = FftPlannerScalar()
        a = planner.plan_fft(1234, FftDirection.FORWARD)
        b = planner.plan_fft(1234, FftDirection.INVERSE)
        assert a is not b

    def test_scalar_recipe_cache(self):
        # plan.rs:860-870
        planner = FftPlannerScalar()
        a = planner.design_fft_for_len(1234)
        b = planner.design_fft_for_len(1234)
        assert a is b

    def test_plan_zero(self):
        # plan.rs:872-882 — len 0 must not explode
        for dtype in (np.complex64, np.complex128):
            planner = FftPlannerScalar(dtype)
            plan = planner.plan_fft_forward(0)
            out = plan.process(np.array([], dtype=dtype))
            assert out.shape[-1] == 0

    def test_radixn_bases(self):
        # pin the base-selection rules of plan.rs:508-607
        planner = FftPlannerScalar()
        # pure power of two: odd exponent -> base 8, even -> base 16
        plan = planner.design_fft_for_len(1 << 7)
        assert isinstance(plan, recipes.Radix4) and plan.base == recipes.Butterfly(8)
        plan = planner.design_fft_for_len(1 << 8)
        assert isinstance(plan, recipes.Radix4) and plan.base == recipes.Butterfly(16)
        # 3 * 2^k (sizes > 992 to skip the butterfly-product path):
        # odd p2 -> base 24, even p2 -> base 12
        plan = planner.design_fft_for_len(3 * 2**9)
        assert isinstance(plan, (recipes.Radix4, recipes.RadixN))
        assert plan.base == recipes.Butterfly(24)
        plan = planner.design_fft_for_len(3 * 2**10)
        assert plan.base == recipes.Butterfly(12)
        # mixed 2s and 3s: excess p2 0 -> 6, 1 -> 12, >=2 -> 24
        plan = planner.design_fft_for_len(2**3 * 3**3 * 5)
        assert plan.base == recipes.Butterfly(6)
        # pure 3s: p3 > 2 -> 27 (3^7 = 2187, above butterfly range)
        plan = planner.design_fft_for_len(3**7)
        assert plan.base == recipes.Butterfly(27)
        # factor > 7 forces base = product of large factors
        plan = planner.design_fft_for_len(13 * 64)
        assert isinstance(plan, recipes.Radix4)
        assert plan.base == recipes.Butterfly(13)
        assert plan.k == 3

    def test_butterfly_product_min_sum(self):
        # plan.rs:427-472: 8*8 preferred over 16*4 and 32*2 for len 64?
        # (64 is a power of two, excluded) — use 512 = not representable;
        # use 18*... actually verify with 22 = 2*11 -> GoodThomasSmall(2, 11)
        planner = FftPlannerScalar()
        plan = planner.design_fft_for_len(22)
        assert isinstance(plan, recipes.GoodThomasSmall)
        assert plan.left.length == 2 and plan.right.length == 11
        # 144: candidate pairs (6,24) sum 30 and (9,16) sum 25 -> min-sum 9*16;
        # (12,12) is not a candidate because 12 is excluded from the product
        # list (plan.rs:433-435).  gcd(9,16)=1 -> GoodThomasSmall.
        plan = planner.design_fft_for_len(144)
        assert isinstance(plan, recipes.GoodThomasSmall)
        assert {plan.left.length, plan.right.length} == {9, 16}


class TestTpuPlanner:
    def test_small_sizes_are_dense_dft(self):
        planner = FftPlannerTpu()
        for n in [2, 17, 64, 100, config.dense_dft_max]:
            plan = planner.design_fft_for_len(n)
            assert isinstance(plan, recipes.Dft), (n, plan)

    def test_large_composite_is_mixed_radix(self):
        planner = FftPlannerTpu()
        plan = planner.design_fft_for_len(1 << 20)
        assert isinstance(plan, recipes.MixedRadix)
        assert plan.length == 1 << 20

    def test_large_prime_uses_prime_algorithms(self):
        planner = FftPlannerTpu()
        for p in [1009, 7919, 65537]:
            plan = planner.design_fft_for_len(p)
            assert isinstance(plan, (recipes.Raders, recipes.Bluesteins)), (p, plan)
            assert plan.length == p

    def test_auto_planner_delegates(self):
        auto = FftPlanner()
        tpu = FftPlannerTpu()
        for n in [100, 1234, 4096]:
            assert auto.design_fft_for_len(n) == tpu.design_fft_for_len(n)

    def test_cache_shared_between_directions_recipes(self):
        planner = FftPlanner()
        a = planner.plan_fft_forward(1234)
        b = planner.plan_fft_forward(1234)
        assert a is b


def test_recipe_cache_tracks_config(monkeypatch):
    """Flipping config after the first plan must re-design, not serve stale
    recipes (VERDICT r1: recipe_cache keyed on length only)."""
    planner = FftPlannerTpu()
    monkeypatch.setattr(config, "use_pallas", "off")
    off_recipe = planner.design_fft_for_len(1234)
    # 1234 = 2*617 off-TPU: composite MixedRadix decomposition
    assert isinstance(off_recipe, recipes.MixedRadix)
    monkeypatch.setattr(config, "use_pallas", "on")
    on_recipe = planner.design_fft_for_len(1234)
    # with Pallas active the planner prefers the whole-n fused Bluestein conv
    assert isinstance(on_recipe, recipes.Bluesteins)
    # and each mode keeps serving its own cached recipe by identity
    assert planner.design_fft_for_len(1234) is on_recipe
    monkeypatch.setattr(config, "use_pallas", "off")
    assert planner.design_fft_for_len(1234) is off_recipe


def test_plan_cache_tracks_config(monkeypatch):
    """Plan (algorithm) cache must also be per-config-state."""
    planner = FftPlanner()
    monkeypatch.setattr(config, "use_pallas", "off")
    off_plan = planner.plan_fft_forward(4096)
    monkeypatch.setattr(config, "use_pallas", "on")
    on_plan = planner.plan_fft_forward(4096)
    assert on_plan is not off_plan
    assert planner.plan_fft_forward(4096) is on_plan
    monkeypatch.setattr(config, "use_pallas", "off")
    assert planner.plan_fft_forward(4096) is off_plan


def test_misaligned_hole_bconv_design(monkeypatch):
    """Lane-misaligned hole band (~8k..64k) on TPU: ODD composites with no
    whole-n Pallas tier ride a fused Bluestein onto the radix conv core
    (measured wins 15625/19683/59049; negatives: even 10000, pad-3.9
    16807 — tools/perf_blue_misaligned.py 2026-08-19)."""
    from rustfft_tpu import executor

    monkeypatch.setattr(executor, "_pallas_mode", lambda: "tpu")
    planner = FftPlannerTpu()
    for n, m in ((15625, 32768), (19683, 65536), (59049, 131072)):
        recipe = planner.design_fft_for_len(n)
        assert isinstance(recipe, recipes.Bluesteins), (n, recipe)
        assert recipe.inner.length == m, (n, recipe.inner.length)
    # even composites keep the factored route (XLA six-step is fast there)
    assert isinstance(
        planner.design_fft_for_len(10000), recipes.MixedRadix
    )
    # pad ratio > 3.5 keeps the factored route (16807: m=65536 pad 3.90)
    assert isinstance(
        planner.design_fft_for_len(16807), recipes.MixedRadix
    )
    # above the hole the padded-lane tier still owns misaligned sizes
    assert executor.pallas_route(78125, np.complex64, "tpu") == "large_pad"
    assert isinstance(
        planner.design_fft_for_len(78125), recipes.MixedRadix
    )


def test_aligned_conv_inner_prefers_radix_core(monkeypatch):
    """Above the small-m dense band the planner picks the smallest
    radix-core-capable Bluestein inner over a smaller dense-core one
    (measured: m=65536 radix 229.0 vs m=41472 dense 142.5 GF/s at 19683;
    prime path m=32768 radix 347.5 vs dense 191.9)."""
    from rustfft_tpu import executor

    monkeypatch.setattr(executor, "_pallas_mode", lambda: "tpu")
    planner = FftPlannerTpu()
    # small band unchanged: smallest conv-supported 2^a*3^b stays
    assert planner._aligned_conv_inner(1234) == 3072
    # prime 20011: 2n-1 = 40021; 41472/49152 are dense-core-only
    # candidates, 65536 = 4*16384 is the radix-core pick
    assert planner._aligned_conv_inner(20011) == 65536
    recipe = planner.design_fft_for_len(20011)
    assert isinstance(recipe, recipes.Bluesteins)
    assert recipe.inner.length == 65536
