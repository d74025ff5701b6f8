"""Native plancore parity tests.

The C++ plancore (native/plancore.cc) must produce byte-identical recipe
trees and number-theory results to the pure-Python implementation — the
analogue of the reference's codegen-conformance CI job that regenerates
kernels and diffs them (SURVEY.md §4, run_test.yml autogeneration).
"""
import numpy as np
import pytest

from rustfft_tpu import math_utils, native, recipes
from rustfft_tpu.config import config
from rustfft_tpu.planner import FftPlannerScalar

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native plancore not built"
)


def _python_planner():
    p = FftPlannerScalar()
    p._native_design = False
    return p


def test_is_prime_parity():
    for n in list(range(2000)) + [1 << 20, 65537, 746497, 2**31 - 1]:
        assert native.is_prime(n) == math_utils.is_prime(n), n


def test_primitive_root_parity():
    for p in [3, 5, 7, 29, 97, 1009, 7919, 65537]:
        assert native.primitive_root(p) == math_utils.primitive_root(p), p


def test_factorize_parity():
    for n in list(range(2, 2000)) + [1 << 20, 44100, 746496]:
        f = math_utils.PrimeFactors.compute(n)
        expected = []
        if f.power_two:
            expected.append((2, f.power_two))
        if f.power_three:
            expected.append((3, f.power_three))
        expected += [(x.value, x.count) for x in f.other_factors]
        assert native.factorize(n) == expected, n


def test_recipe_parity_exhaustive():
    planner = _python_planner()
    sizes = list(range(2, 1500)) + [
        4096, 65536, 1 << 20, 1009, 7919, 65537, 746497, 44100, 2 * 3 * 5 * 7 * 11 * 13,
    ]
    for n in sizes:
        assert native.design_recipe(n) == planner.design_fft_for_len(n), n


def test_planner_uses_native_when_enabled():
    planner = FftPlannerScalar()
    assert planner._native_design
    r = planner.design_fft_for_len(1234)
    assert r.length == 1234
    # flag off -> python path, identical output
    old = config.use_native
    try:
        config.use_native = False
        planner2 = FftPlannerScalar()
        assert planner2.design_fft_for_len(1234) == r
    finally:
        config.use_native = old


def test_twiddle_values_match():
    idx = np.arange(64)
    for conj in (False, True):
        tw = native.twiddle_values(idx, 64, conj)
        ref = np.exp((1j if conj else -1j) * 2 * np.pi * idx / 64)
        np.testing.assert_allclose(tw, ref, atol=1e-15)


class TestNativeTables:
    """C++ table tier == numpy table tier, exactly-structured f64."""

    def test_dft_matrix_parity(self):
        from rustfft_tpu import native, twiddles
        from rustfft_tpu.common import FftDirection
        from rustfft_tpu.config import config

        if not native.available():
            pytest.skip("native library unavailable")
        for n in (1, 2, 31, 128, 257):
            for direction in (FftDirection.FORWARD, FftDirection.INVERSE):
                nat = native.dft_matrix(n, direction is FftDirection.INVERSE)
                old = config.use_native
                config.use_native = False
                try:
                    ref = twiddles.dft_matrix(n, direction)
                finally:
                    config.use_native = old
                np.testing.assert_allclose(nat, ref, rtol=0, atol=1e-14)

    def test_twiddle_table_parity(self):
        from rustfft_tpu import native, twiddles
        from rustfft_tpu.common import FftDirection
        from rustfft_tpu.config import config

        if not native.available():
            pytest.skip("native library unavailable")
        for p, q in ((2, 3), (16, 128), (31, 37)):
            for direction in (FftDirection.FORWARD, FftDirection.INVERSE):
                nat = native.twiddle_table(p, q, direction is FftDirection.INVERSE)
                old = config.use_native
                config.use_native = False
                try:
                    ref = twiddles.twiddle_table(p, q, direction)
                finally:
                    config.use_native = old
                np.testing.assert_allclose(nat, ref, rtol=0, atol=1e-14)

    def test_bluestein_chirp_parity_and_precision(self):
        from rustfft_tpu import native, twiddles
        from rustfft_tpu.common import FftDirection
        from rustfft_tpu.config import config

        if not native.available():
            pytest.skip("native library unavailable")
        # includes a large n where the k^2 mod 2n reduction must be exact
        for n in (5, 1234, 1_000_003):
            for direction in (FftDirection.FORWARD, FftDirection.INVERSE):
                nat = native.bluestein_chirp(n, direction is FftDirection.INVERSE)
                old = config.use_native
                config.use_native = False
                try:
                    ref = twiddles.bluesteins_twiddles(n, direction)
                finally:
                    config.use_native = old
                np.testing.assert_allclose(nat, ref, rtol=0, atol=1e-12)
