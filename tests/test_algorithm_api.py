"""Public per-algorithm constructor API — parity with rustfft::algorithm.

The reference lets users hand-build any algorithm (bypassing the planner)
and compose them via inner `Arc<dyn Fft>` handles; this checks the same
compositions work here and match the oracle.
"""
import numpy as np
import pytest

from rustfft_tpu import FftDirection, algorithm
from rustfft_tpu.utils.testing import check_fft_algorithm

DIRECTIONS = [FftDirection.FORWARD, FftDirection.INVERSE]


@pytest.mark.parametrize("direction", DIRECTIONS)
def test_dft_constructor(direction):
    check_fft_algorithm(algorithm.Dft(50, direction), 50, direction)


@pytest.mark.parametrize("n", [2, 7, 16, 31, 32])
def test_butterfly_constructor(n):
    d = FftDirection.FORWARD
    check_fft_algorithm(algorithm.Butterfly(n, d), n, d)


def test_butterfly_rejects_unknown_size():
    with pytest.raises(ValueError):
        algorithm.Butterfly(10, FftDirection.FORWARD)


@pytest.mark.parametrize("n", [1, 8, 16, 64, 128, 256, 2048])
def test_radix4_constructor(n):
    d = FftDirection.FORWARD
    plan = algorithm.Radix4(n, d)
    check_fft_algorithm(plan, n, d)


def test_radix4_rejects_non_pow2():
    with pytest.raises(ValueError):
        algorithm.Radix4(12, FftDirection.FORWARD)


@pytest.mark.parametrize("n", [3, 27, 81, 729])
def test_radix3_constructor(n):
    d = FftDirection.FORWARD
    check_fft_algorithm(algorithm.Radix3(n, d), n, d)


def test_radix3_rejects_non_pow3():
    with pytest.raises(ValueError):
        algorithm.Radix3(12, FftDirection.FORWARD)


@pytest.mark.parametrize("direction", DIRECTIONS)
def test_mixed_radix_composition(direction):
    w = algorithm.Dft(12, direction)
    h = algorithm.Radix4(16, direction)
    plan = algorithm.MixedRadix(w, h)
    check_fft_algorithm(plan, 192, direction)


def test_mixed_radix_small():
    d = FftDirection.FORWARD
    plan = algorithm.MixedRadixSmall(
        algorithm.Butterfly(4, d), algorithm.Butterfly(6, d)
    )
    check_fft_algorithm(plan, 24, d)


def test_mixed_radix_rejects_mismatched_directions():
    w = algorithm.Dft(4, FftDirection.FORWARD)
    h = algorithm.Dft(5, FftDirection.INVERSE)
    with pytest.raises(ValueError):
        algorithm.MixedRadix(w, h)


@pytest.mark.parametrize("direction", DIRECTIONS)
def test_good_thomas_composition(direction):
    w = algorithm.Dft(9, direction)
    h = algorithm.Dft(16, direction)
    check_fft_algorithm(algorithm.GoodThomasAlgorithm(w, h), 144, direction)
    check_fft_algorithm(
        algorithm.GoodThomasAlgorithmSmall(
            algorithm.Butterfly(9, direction), algorithm.Butterfly(16, direction)
        ),
        144,
        direction,
    )


def test_good_thomas_rejects_non_coprime():
    d = FftDirection.FORWARD
    with pytest.raises(ValueError):
        algorithm.GoodThomasAlgorithm(algorithm.Dft(4, d), algorithm.Dft(6, d))


@pytest.mark.parametrize("direction", DIRECTIONS)
def test_raders_composition(direction):
    inner = algorithm.Dft(12, direction)  # 13 prime
    check_fft_algorithm(algorithm.RadersAlgorithm(inner), 13, direction)


def test_raders_rejects_composite():
    inner = algorithm.Dft(13, FftDirection.FORWARD)  # 14 not prime
    with pytest.raises(ValueError):
        algorithm.RadersAlgorithm(inner)


@pytest.mark.parametrize("direction", DIRECTIONS)
def test_bluesteins_composition(direction):
    inner = algorithm.Radix4(256, direction)
    check_fft_algorithm(algorithm.BluesteinsAlgorithm(100, inner), 100, direction)


def test_bluesteins_rejects_short_inner():
    inner = algorithm.Radix4(128, FftDirection.FORWARD)
    with pytest.raises(ValueError):
        algorithm.BluesteinsAlgorithm(100, inner)


def test_hand_built_matches_planner():
    """A hand-built tree and the planner's plan agree bit-for-bit shapes."""
    from rustfft_tpu import FftPlanner

    d = FftDirection.FORWARD
    hand = algorithm.MixedRadix(algorithm.Dft(30, d), algorithm.Dft(40, d))
    auto = FftPlanner().plan_fft_forward(1200)
    sig = (
        np.random.default_rng(3).standard_normal(1200)
        + 1j * np.random.default_rng(4).standard_normal(1200)
    ).astype(np.complex64)
    np.testing.assert_allclose(
        np.asarray(hand.process(sig)), np.asarray(auto.process(sig)),
        rtol=0, atol=2e-2 * np.abs(np.asarray(auto.process(sig))).max(),
    )
