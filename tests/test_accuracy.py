"""Integration accuracy sweep — port of reference tests/accuracy.rs.

The reference sweeps every length 1..1000 for f32+f64, fwd+inv, comparing the
planner's output against a Bluestein-over-Radix4 control; pass = mean element
error < 0.1 (accuracy.rs:30-37, 98-122).  Here the control is the host f64
DFT.  To keep CI time sane on CPU (every length is a fresh XLA compile), the
exhaustive range is trimmed: full coverage 1..128, strided coverage above,
plus the BASELINE.md scenario sizes.  Set RUSTFFT_TPU_FULL_SWEEP=1 for the
reference's full 1..1000 range.
"""
import os

import numpy as np
import pytest

from rustfft_tpu import FftDirection, FftPlanner, FftPlannerScalar
from rustfft_tpu.utils.testing import mean_element_error, oracle_dft, random_signal

FULL = os.environ.get("RUSTFFT_TPU_FULL_SWEEP") == "1"

if FULL:
    SWEEP_SIZES = list(range(1, 1001))
else:
    SWEEP_SIZES = (
        list(range(1, 129))
        + list(range(129, 512, 13))
        + [255, 256, 512, 729, 1000, 1024]
    )

# BASELINE.md scenario sizes: planner path 1234; primes via Rader/Bluestein
# (65537 = F4, Rader inner 65536); mixed-radix 3^n*2^m composites; pow2.
SCENARIO_SIZES = [1234, 1009, 7919, 65537, 2592, 2916, 3**5 * 2**5, 4096, 65536]


def _check(planner, n, direction, dtype, tol=0.1):
    plan = planner.plan_fft(n, direction)
    sig = random_signal(n, dtype=dtype, seed=1000 + n)
    out = np.asarray(plan.process(sig))
    expected = oracle_dft(sig, direction)
    err = mean_element_error(out, expected)
    assert err < tol, f"n={n} dir={direction} dtype={dtype} err={err}"


@pytest.fixture(scope="module")
def tpu_planner():
    return FftPlanner()


@pytest.fixture(scope="module")
def scalar_planner():
    return FftPlannerScalar()


@pytest.mark.parametrize("direction", [FftDirection.FORWARD, FftDirection.INVERSE])
@pytest.mark.parametrize("n", SWEEP_SIZES)
def test_sweep_c64_tpu_planner(tpu_planner, n, direction):
    _check(tpu_planner, n, direction, np.complex64)


@pytest.mark.parametrize("n", SWEEP_SIZES)
def test_sweep_c64_scalar_planner(scalar_planner, n):
    _check(scalar_planner, n, FftDirection.FORWARD, np.complex64)


@pytest.mark.parametrize("n", SWEEP_SIZES[:64] + [251, 509])
def test_sweep_c128(n):
    planner = FftPlannerScalar(np.complex128)
    _check(planner, n, FftDirection.FORWARD, np.complex128, tol=1e-6)


@pytest.mark.parametrize("n", SCENARIO_SIZES)
def test_scenario_sizes(tpu_planner, n):
    _check(tpu_planner, n, FftDirection.FORWARD, np.complex64)


@pytest.mark.parametrize("n", [1009, 7919, 65537])
def test_prime_roundtrip(tpu_planner, n):
    # BASELINE config 3: prime fwd+inv roundtrip scales by n
    fwd = tpu_planner.plan_fft(n, FftDirection.FORWARD)
    inv = tpu_planner.plan_fft(n, FftDirection.INVERSE)
    sig = random_signal(n, seed=7)
    out = np.asarray(inv.process(fwd.process(sig))) / n
    err = mean_element_error(out, sig)
    assert err < 1e-3, err
