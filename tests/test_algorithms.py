"""Per-algorithm conformance tests.

Port of the reference's per-algorithm `#[cfg(test)] mod unit_tests` blocks
(e.g. radix4.rs:207-245, bluesteins_algorithm.rs:202-226): every algorithm is
exercised directly via hand-built recipes — independent of planner choices —
through `check_fft_algorithm`, against the f64 oracle, in both directions.
"""
import numpy as np
import pytest

from rustfft_tpu import FftDirection, recipes
from rustfft_tpu.plan import FftPlan
from rustfft_tpu.utils.testing import check_fft_algorithm

DIRECTIONS = [FftDirection.FORWARD, FftDirection.INVERSE]


def run(recipe, direction, dtype=np.complex64):
    plan = FftPlan(recipe, direction, dtype)
    check_fft_algorithm(plan, recipe.length, direction, dtype)


@pytest.mark.parametrize("direction", DIRECTIONS)
@pytest.mark.parametrize("n", list(range(1, 33)) + [50, 100, 256])
def test_dft(n, direction):
    # algorithm/dft.rs:84-126 oracle tests, any size
    run(recipes.Dft(n), direction)


@pytest.mark.parametrize("direction", DIRECTIONS)
@pytest.mark.parametrize(
    "n", [2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 13, 16, 17, 19, 23, 24, 27, 29, 31, 32]
)
def test_butterflies(n, direction):
    # algorithm/butterflies.rs per-size tests
    run(recipes.Butterfly(n), direction)


@pytest.mark.parametrize("direction", DIRECTIONS)
@pytest.mark.parametrize("k", [0, 1, 2, 3])
@pytest.mark.parametrize("base", [1, 2, 4, 8, 16, 32])
def test_radix4(k, base, direction):
    # radix4.rs:207-245: test_radix4 over bases and exponents
    run(recipes.Radix4(k, recipes.Butterfly(base) if base > 1 else recipes.Dft(base)), direction)


@pytest.mark.parametrize("direction", DIRECTIONS)
@pytest.mark.parametrize(
    "factors,base",
    [
        ((2,), 8),
        ((3,), 8),
        ((5,), 4),
        ((6,), 4),
        ((7,), 3),
        ((2, 3), 8),
        ((7, 6, 5, 3, 2), 4),
        ((4, 4), 12),
        ((3, 3, 3), 27),
    ],
)
def test_radixn(factors, base, direction):
    # radixn.rs unit tests: arbitrary factor chains over bases
    run(recipes.RadixN(factors, recipes.Butterfly(base)), direction)


@pytest.mark.parametrize("direction", DIRECTIONS)
@pytest.mark.parametrize("width,height", [(2, 3), (3, 4), (4, 5), (7, 8), (12, 16), (16, 32), (31, 32)])
def test_mixed_radix(width, height, direction):
    # mixed_radix.rs unit tests
    run(
        recipes.MixedRadix(recipes.Butterfly(width), recipes.Butterfly(height))
        if width in {2,3,4,5,6,7,8,9,11,12,13,16,17,19,23,24,27,29,31,32}
        else recipes.MixedRadix(recipes.Dft(width), recipes.Dft(height)),
        direction,
    )


@pytest.mark.parametrize("direction", DIRECTIONS)
@pytest.mark.parametrize("width,height", [(2, 3), (3, 4), (4, 5), (7, 8), (11, 12)])
def test_mixed_radix_small(width, height, direction):
    run(recipes.MixedRadixSmall(recipes.Butterfly(width), recipes.Butterfly(height)), direction)


@pytest.mark.parametrize("direction", DIRECTIONS)
@pytest.mark.parametrize("width,height", [(2, 3), (3, 4), (4, 5), (7, 8), (9, 16), (11, 13), (16, 27), (25, 32)])
def test_good_thomas(width, height, direction):
    # good_thomas_algorithm.rs unit tests: coprime pairs
    run(recipes.GoodThomas(recipes.Dft(width), recipes.Dft(height)), direction)


@pytest.mark.parametrize("direction", DIRECTIONS)
@pytest.mark.parametrize("width,height", [(2, 3), (3, 4), (5, 6), (9, 16), (11, 13)])
def test_good_thomas_small(width, height, direction):
    run(
        recipes.GoodThomasSmall(recipes.Butterfly(width), recipes.Butterfly(height)),
        direction,
    )


@pytest.mark.parametrize("direction", DIRECTIONS)
@pytest.mark.parametrize("p", [3, 5, 7, 11, 13, 17, 97, 101, 257])
def test_raders(p, direction):
    # raders_algorithm.rs unit tests: prime sizes, inner fft of size p-1
    run(recipes.Raders(recipes.Dft(p - 1)), direction)


@pytest.mark.parametrize("direction", DIRECTIONS)
@pytest.mark.parametrize("n,inner", [(3, 8), (5, 16), (7, 13), (12, 23), (31, 64), (100, 256), (257, 1024)])
def test_bluestein(n, inner, direction):
    # bluesteins_algorithm.rs unit tests: any inner size >= 2n-1
    assert inner >= 2 * n - 1
    run(recipes.Bluesteins(n, recipes.Dft(inner)), direction)


@pytest.mark.parametrize("direction", DIRECTIONS)
def test_nested_composition(direction):
    # deep tree: Bluestein over Radix4 over MixedRadix inner pieces
    inner = recipes.Radix4(2, recipes.Butterfly(16))  # 256
    recipe = recipes.Bluesteins(101, inner)
    run(recipe, direction)
    recipe = recipes.Raders(recipes.MixedRadix(recipes.Butterfly(4), recipes.Butterfly(7)))  # 29
    run(recipe, direction)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_dtypes(dtype):
    # f32 and f64 parity (reference FftNum over f32/f64, common.rs:5-7)
    run(recipes.MixedRadix(recipes.Butterfly(24), recipes.Dft(50)), FftDirection.FORWARD, dtype)


def test_roundtrip_unnormalized():
    # forward+inverse roundtrip scales by n (lib.rs:81-86)
    from rustfft_tpu import FftPlanner
    from rustfft_tpu.utils.testing import random_signal

    n = 240
    planner = FftPlanner()
    fwd = planner.plan_fft_forward(n)
    inv = planner.plan_fft_inverse(n)
    x = random_signal(n)
    out = np.asarray(inv.process(fwd.process(x)))
    np.testing.assert_allclose(out, x * n, rtol=1e-4, atol=1e-3)
