"""Public-API contract tests (reference: src/lib.rs:140-278, fft_helper.rs)."""
import numpy as np
import pytest

from rustfft_tpu import (
    FftBufferError,
    FftDirection,
    FftPlanner,
    FftPlannerScalar,
    Forward,
    Inverse,
)
from rustfft_tpu.utils.testing import oracle_dft, random_signal


def test_direction_opposite():
    # lib.rs:164-170
    assert Forward.opposite() is Inverse
    assert Inverse.opposite() is Forward


def test_batch_chunking_flat_buffer():
    # lib.rs:195-211: buffer of k*n runs k independent FFTs
    n, k = 32, 5
    plan = FftPlanner().plan_fft_forward(n)
    sig = random_signal(n * k)
    out = np.asarray(plan.process(sig))
    expected = oracle_dft(sig.reshape(k, n), Forward).reshape(-1)
    np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-3)


def test_batch_leading_dims():
    n = 24
    plan = FftPlanner().plan_fft_forward(n)
    sig = random_signal(2 * 3 * n).reshape(2, 3, n)
    out = np.asarray(plan.process(sig))
    assert out.shape == (2, 3, n)
    np.testing.assert_allclose(out, oracle_dft(sig, Forward), rtol=1e-3, atol=1e-3)


def test_wrong_buffer_length_raises():
    # the analogue of the reference's buffer-misuse panics (common.rs:11-104)
    plan = FftPlanner().plan_fft_forward(32)
    with pytest.raises(FftBufferError):
        plan.process(random_signal(33))


def test_zero_length_fft():
    # plan.rs:872-882
    plan = FftPlanner().plan_fft_forward(0)
    out = plan.process(np.array([], dtype=np.complex64))
    assert np.asarray(out).size == 0
    with pytest.raises(FftBufferError):
        plan.process(random_signal(4))


def test_len_one_is_identity():
    plan = FftPlanner().plan_fft_forward(1)
    sig = random_signal(7)  # 7 chunks of length 1
    np.testing.assert_array_equal(np.asarray(plan.process(sig)), sig)


def test_scratch_api_parity():
    # lib.rs:214-277: all process variants agree; scratch queries return 0
    plan = FftPlanner().plan_fft_forward(30)
    sig = random_signal(30)
    base = np.asarray(plan.process(sig))
    np.testing.assert_array_equal(base, np.asarray(plan.process_with_scratch(sig, None)))
    np.testing.assert_array_equal(
        base, np.asarray(plan.process_outofplace_with_scratch(sig, None, None))
    )
    np.testing.assert_array_equal(
        base, np.asarray(plan.process_immutable_with_scratch(sig, None, None))
    )
    assert plan.get_inplace_scratch_len() == 0
    assert plan.get_outofplace_scratch_len() == 0
    assert plan.get_immutable_scratch_len() == 0


def test_plan_is_callable():
    plan = FftPlanner().plan_fft_forward(16)
    sig = random_signal(16)
    np.testing.assert_array_equal(np.asarray(plan(sig)), np.asarray(plan.process(sig)))


def test_real_input_promoted():
    plan = FftPlanner().plan_fft_forward(16)
    x = np.arange(16, dtype=np.float32)
    out = np.asarray(plan.process(x))
    np.testing.assert_allclose(out, np.fft.fft(x), rtol=1e-4, atol=1e-3)


def test_c128_dtype_plan():
    planner = FftPlanner(np.complex128)
    plan = planner.plan_fft_forward(100)
    sig = random_signal(100, dtype=np.complex128)
    out = np.asarray(plan.process(sig))
    assert out.dtype == np.complex128
    np.testing.assert_allclose(out, np.fft.fft(sig), rtol=1e-9, atol=1e-9)


def test_size_1234_readme_example():
    # the README example config (BASELINE config 1): size-1234 forward c32
    planner = FftPlanner()
    fft = planner.plan_fft_forward(1234)
    buffer = np.zeros(1234, dtype=np.complex64)
    out = np.asarray(fft.process(buffer))
    assert out.shape == (1234,)
    np.testing.assert_allclose(out, 0)
    sig = random_signal(1234)
    np.testing.assert_allclose(
        np.asarray(fft.process(sig)), np.fft.fft(sig), rtol=1e-3, atol=1e-2
    )


def test_planner_scalar_matches_tpu_results():
    # different planners, identical math
    for n in [48, 210, 1009]:
        sig = random_signal(n)
        a = np.asarray(FftPlannerScalar().plan_fft_forward(n).process(sig))
        b = np.asarray(FftPlanner().plan_fft_forward(n).process(sig))
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-2)


def test_process_device_arrays_stay_on_device():
    """JAX-array inputs round-trip on device (no host numpy conversion)."""
    import jax
    import jax.numpy as jnp

    from rustfft_tpu import FftPlanner
    from rustfft_tpu.utils.testing import mean_element_error, oracle_dft, random_signal

    plan = FftPlanner().plan_fft_forward(96)
    sig = random_signal(2 * 96, dtype=np.complex64).reshape(2, 96)
    dev = jnp.asarray(sig)
    out = plan.process(dev)
    assert isinstance(out, jax.Array)
    assert out.dtype == jnp.complex64
    err = mean_element_error(np.asarray(out), oracle_dft(sig, plan.fft_direction()))
    assert err < 1e-3
    # flat chunked device buffer
    out2 = plan.process(dev.reshape(-1))
    np.testing.assert_allclose(
        np.asarray(out2).reshape(2, 96), np.asarray(out), rtol=0, atol=1e-5
    )


def test_negative_length_rejected():
    from rustfft_tpu import FftPlanner

    with pytest.raises(ValueError):
        FftPlanner().plan_fft_forward(-1)


def test_c128_without_x64_raises():
    """Processing a c128 plan with x64 disabled must raise, not silently
    truncate to c64 (ADVICE r1)."""
    import jax

    import warnings

    plan = FftPlannerScalar(np.complex128).plan_fft_forward(16)
    sig = random_signal(16, dtype=np.complex128)
    jax.config.update("jax_enable_x64", False)
    try:
        with pytest.raises(RuntimeError, match="jax_enable_x64"):
            plan.process(sig)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            FftPlannerScalar(np.complex128).plan_fft_forward(32)
        assert any("jax_enable_x64" in str(w.message) for w in caught)
    finally:
        jax.config.update("jax_enable_x64", True)
    # with x64 back on, the same plan object processes fine
    out = np.asarray(plan.process(sig))
    assert out.dtype == np.complex128
