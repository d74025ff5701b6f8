"""Fused Pallas kernel conformance (interpret mode on CPU).

The hardware tier for these kernels is the TPU (bench.py and the driver's
compile check); here the same kernel bodies run under the Pallas interpreter
so the numerics are pinned in CI.  Reference counterpart: the per-SIMD
butterfly test mods (e.g. avx32_butterflies.rs:1696+) that check each fused
kernel against the scalar oracle.
"""
import numpy as np
import pytest

from rustfft_tpu import FftDirection, FftPlanner, config
from rustfft_tpu.ops import calg
from rustfft_tpu.ops.pallas import fused
from rustfft_tpu.utils.testing import mean_element_error, oracle_dft, random_signal


def _run_fused(n, direction, batch=3, split=None):
    fn = fused.make_fused_two_stage_fn(
        n, direction, np.complex64, split=split, interpret=True
    )
    sig = random_signal(batch * n, dtype=np.complex64, seed=42 + n).reshape(batch, n)
    re, im = calg.from_numpy(sig, np.float32)
    out_r, out_i = fn((re, im))
    out = np.asarray(out_r) + 1j * np.asarray(out_i)
    expected = oracle_dft(sig, direction)
    return mean_element_error(out, expected)


@pytest.mark.parametrize("n", [4, 36, 64, 100, 720, 1024])
@pytest.mark.parametrize(
    "direction", [FftDirection.FORWARD, FftDirection.INVERSE]
)
def test_fused_two_stage_matches_oracle(n, direction):
    assert fused.fused_supported(n, np.complex64)
    assert _run_fused(n, direction) < 1e-2


def test_fused_unbalanced_split():
    # explicit uneven split exercises p != q twiddle/table shapes
    assert _run_fused(96, FftDirection.FORWARD, split=(4, 24)) < 1e-2


def test_fused_batch_padding():
    # batch not divisible by the tile size exercises the pad/unpad path
    assert _run_fused(256, FftDirection.FORWARD, batch=5) < 1e-2


def test_fused_unsupported_sizes():
    assert not fused.fused_supported(2, np.complex64)  # below minimum
    assert not fused.fused_supported(1009, np.complex64)  # prime
    assert not fused.fused_supported(1234, np.complex64)  # 2 * prime(617 > 512)
    assert not fused.fused_supported(64, np.complex128)  # c64-only kernel


def test_large_pipeline_matches_oracle():
    """Two-kernel large-N pipeline (ops/pallas/large.py), interpret mode."""
    from rustfft_tpu.ops.pallas import large

    n = 32768  # P * q1*q2 with every stage exercised
    assert large.large_supported(n, np.complex64)
    for direction in (FftDirection.FORWARD, FftDirection.INVERSE):
        for variant in ("wlhs", "swap"):
            fn = large.make_large_fft_fn(
                n, direction, np.complex64, interpret=True, variant=variant
            )
            sig = random_signal(2 * n, dtype=np.complex64, seed=7).reshape(2, n)
            o_r, o_i = fn((sig.real, sig.imag))
            out = np.asarray(o_r) + 1j * np.asarray(o_i)
            err = mean_element_error(out, oracle_dft(sig, direction))
            assert err < 1e-2, (direction, variant, err)


def test_executor_routes_through_fused(monkeypatch):
    """use_pallas='on' must produce identical results through the planner."""
    monkeypatch.setattr(config, "use_pallas", "on")
    planner = FftPlanner()
    plan = planner.plan_fft_forward(144)
    sig = random_signal(144, dtype=np.complex64)
    out = np.asarray(plan.process(sig))
    err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
    assert err < 1e-2
