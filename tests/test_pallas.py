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
    # batch not divisible by an explicit tile size exercises the pad/unpad
    # path (auto tb would shrink to the batch and never pad)
    fn = fused.make_fused_two_stage_fn(
        256, FftDirection.FORWARD, np.complex64, interpret=True, batch_tile=4
    )
    sig = random_signal(5 * 256, dtype=np.complex64, seed=5).reshape(5, 256)
    re, im = calg.from_numpy(sig, np.float32)
    out_r, out_i = fn((re, im))
    assert out_r.shape == (5, 256)
    out = np.asarray(out_r) + 1j * np.asarray(out_i)
    err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
    assert err < 1e-2


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


def test_large_pipeline_gauss_matches_oracle():
    """Gauss 3-multiplication form of both large-pipeline kernels
    (_kernel_a_gauss / _kernel_b_gauss), interpret mode."""
    from rustfft_tpu.ops.pallas import large

    n = 32768
    for direction in (FftDirection.FORWARD, FftDirection.INVERSE):
        fn = large.make_large_fft_fn(
            n, direction, np.complex64, interpret=True, gauss=True
        )
        sig = random_signal(2 * n, dtype=np.complex64, seed=11).reshape(2, n)
        o_r, o_i = fn((sig.real, sig.imag))
        out = np.asarray(o_r) + 1j * np.asarray(o_i)
        err = mean_element_error(out, oracle_dft(sig, direction))
        assert err < 1e-2, (direction, err)


@pytest.mark.parametrize("n,m", [(100, 256), (1234, 3072)])
@pytest.mark.parametrize(
    "direction", [FftDirection.FORWARD, FftDirection.INVERSE]
)
def test_bluestein_conv_kernel(n, m, direction):
    """Fused double-FFT convolution kernel (ops/pallas/conv.py)."""
    from rustfft_tpu.ops.pallas import conv

    assert conv.conv_supported(m, np.complex64)
    fn = conv.make_bluestein_fn(n, m, direction, np.complex64, interpret=True)
    sig = random_signal(3 * n, dtype=np.complex64, seed=n).reshape(3, n)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, direction))
    assert err < 1e-2, (n, m, direction, err)


@pytest.mark.parametrize("n,m", [(8191, 16384), (12289, 32768)])
@pytest.mark.parametrize(
    "direction", [FftDirection.FORWARD, FftDirection.INVERSE]
)
def test_bluestein_large_conv_pipeline(n, m, direction):
    """Fused 3-kernel Bluestein convolution on the large-pipeline structure
    (ops/pallas/convlarge.py) — huge-inner tier.  12289 exercises the
    sliced kernel A2 (pkeep < P); 8191 the full-P case."""
    from rustfft_tpu.ops.pallas import convlarge

    assert convlarge.bconv_supported(m, np.complex64)
    fn = convlarge.make_bluestein_large_fn(
        n, m, direction, np.complex64, interpret=True
    )
    sig = random_signal(2 * n, dtype=np.complex64, seed=n).reshape(2, n)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, direction))
    assert err < 1e-2, (n, m, direction, err)


@pytest.mark.parametrize(
    "n", [32, 64, 128, 243, 500, 512, 1009, 1234]  # pow2 (packed rows for
    # n < 128), 3^5, misaligned, primes
)
@pytest.mark.parametrize("variant", ["gauss", "block"])
def test_dense_matmul_kernel(n, variant):
    """Dense whole-DFT MXU matmul tier (ops/pallas/dense.py): any length,
    including primes, one kernel."""
    from rustfft_tpu.ops.pallas import dense

    assert dense.dense_supported(n, np.complex64, variant)
    for direction in (FftDirection.FORWARD, FftDirection.INVERSE):
        fn = dense.make_dense_fft_fn(
            n, direction, np.complex64, interpret=True, variant=variant
        )
        sig = random_signal(3 * n, dtype=np.complex64, seed=n).reshape(3, n)
        o_r, o_i = fn((sig.real, sig.imag))
        out = np.asarray(o_r) + 1j * np.asarray(o_i)
        err = mean_element_error(out, oracle_dft(sig, direction))
        assert err < 1e-2, (n, variant, direction, err)


@pytest.mark.parametrize("n", [100, 500, 1009])
def test_dense_matmul_kernel_aligned(n):
    """aligned=True pads rows outside the kernel (128-aligned block specs,
    no in-kernel lane concat/slice) — the compile-safe fallback for
    misaligned n if Mosaic rejects the whole-dim lane-block form."""
    from rustfft_tpu.ops.pallas import dense

    fn = dense.make_dense_fft_fn(
        n, FftDirection.FORWARD, np.complex64, interpret=True, aligned=True
    )
    sig = random_signal(3 * n, dtype=np.complex64, seed=n).reshape(3, n)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
    assert err < 1e-2, (n, err)


def test_dense_route_knobs():
    """dense_min_n / dense_max_n / dense_fallback_max_n gate the dense tier
    (round-4 measured defaults: band [129, 768], fallback to 2048)."""
    from rustfft_tpu import executor

    old_min = config.dense_min_n
    old_max, old_fb = config.dense_max_n, config.dense_fallback_max_n
    try:
        config.dense_max_n = 0
        config.dense_fallback_max_n = 0
        assert executor.pallas_route(256, np.complex64, mode="tpu") is None
        config.dense_max_n = 512
        config.dense_fallback_max_n = 1536
        # below the band's lower edge XLA keeps the size (64: 767 vs 430)
        config.dense_min_n = 129
        assert executor.pallas_route(64, np.complex64, mode="tpu") is None
        assert executor.pallas_route(256, np.complex64, mode="tpu") == "dense"
        assert executor.pallas_route(512, np.complex64, mode="tpu") == "dense"
        # fallback band: primes get dense; aligned sizes keep their tier
        assert executor.pallas_route(1009, np.complex64, mode="tpu") == "dense"
        assert executor.pallas_route(1024, np.complex64, mode="tpu") == "lanepack"
        assert executor.pallas_route(2048, np.complex64, mode="tpu") == "lanepack"
        # past the fallback cap: unrouted as before
        assert executor.pallas_route(7919, np.complex64, mode="tpu") is None
    finally:
        config.dense_min_n = old_min
        config.dense_max_n = old_max
        config.dense_fallback_max_n = old_fb


@pytest.mark.parametrize("p", [257, 769])
@pytest.mark.parametrize(
    "direction", [FftDirection.FORWARD, FftDirection.INVERSE]
)
def test_raders_conv_kernel(p, direction):
    """Rader's via the fused convolution kernel + XLA gathers."""
    from rustfft_tpu.ops.pallas import conv

    fn = conv.make_raders_fn(p, direction, np.complex64, interpret=True)
    sig = random_signal(3 * p, dtype=np.complex64, seed=p).reshape(3, p)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, direction))
    assert err < 1e-2, (p, direction, err)


def test_conv_unsupported_sizes():
    from rustfft_tpu.ops.pallas import conv

    assert not conv.conv_supported(128, np.complex64)  # q=64 lane-misaligned
    assert not conv.conv_supported(256, np.complex128)  # c64 only


def test_executor_routes_bluestein_through_conv(monkeypatch):
    """use_pallas='on' routes prime Bluestein sizes through the conv kernel."""
    monkeypatch.setattr(config, "use_pallas", "on")
    from rustfft_tpu import executor

    planner = FftPlanner()
    plan = planner.plan_fft_forward(1237)  # prime; 1236 = 2^2*3*103 -> Bluestein
    from rustfft_tpu import recipes

    assert isinstance(plan.recipe, recipes.Bluesteins)
    sig = random_signal(1237, dtype=np.complex64)
    out = np.asarray(plan.process(sig))
    err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
    assert err < 1e-2, err


def test_tpu_planner_conv_rules(monkeypatch):
    """With Pallas active, the TPU planner prefers conv-kernel-shaped recipes:
    Rader when p-1 is MXU-aligned, whole-n Bluestein for awkward sizes."""
    monkeypatch.setattr(config, "use_pallas", "on")
    from rustfft_tpu import FftPlannerTpu, recipes

    planner = FftPlannerTpu()
    # 257: p-1 = 256 = 2x128 conv-aligned -> Rader
    assert isinstance(planner.design_fft_for_len(257), recipes.Raders)
    # 1009: p-1 = 1008 misaligned -> Bluestein with the smallest aligned inner
    r = planner.design_fft_for_len(1009)
    assert isinstance(r, recipes.Bluesteins) and r.inner.length == 2048
    # 1234 = 2*617 (factor > dense leaf) -> whole-n Bluestein, inner 3072
    r = planner.design_fft_for_len(1234)
    assert isinstance(r, recipes.Bluesteins) and r.inner.length == 3072
    # accuracy through the public surface
    plan = FftPlanner().plan_fft_forward(1234)
    sig = random_signal(1234, dtype=np.complex64)
    err = mean_element_error(
        np.asarray(plan.process(sig)), oracle_dft(sig, FftDirection.FORWARD)
    )
    assert err < 1e-2, err


def test_executor_routes_through_fused(monkeypatch):
    """use_pallas='on' must produce identical results through the planner."""
    monkeypatch.setattr(config, "use_pallas", "on")
    planner = FftPlanner()
    plan = planner.plan_fft_forward(144)
    sig = random_signal(144, dtype=np.complex64)
    out = np.asarray(plan.process(sig))
    err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
    assert err < 1e-2


def test_large_pipeline_above_2pow20():
    """Sizes above 2^20 (reference benches pow2 to 2^24,
    bench_rustfft.rs:43-105): the pipeline holds to its honest ceiling
    n = 2^22 (kernel-B needs full-width 128 lane tiles and Q <= 8192 —
    both measured Mosaic limits, large.max_lane_tile); larger sizes fall
    back to the XLA six-step path via the planner."""
    from rustfft_tpu import FftPlanner
    from rustfft_tpu.ops.pallas import large

    for n in (1 << 21, 1 << 22):
        assert large.large_supported(n, np.complex64), n
    for n in (1 << 23, 1 << 24):
        assert not large.large_supported(n, np.complex64), n
    # the XLA fallback still plans 2^23+ (recipe design only; executing
    # 8M+ points is out of CI budget)
    assert FftPlanner().plan_fft_forward(1 << 23) is not None

    n = 1 << 21
    fn = large.make_large_fft_fn(n, FftDirection.FORWARD, np.complex64, interpret=True)
    sig = random_signal(n, dtype=np.complex64, seed=21).reshape(1, n)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
    # default precision is the bf16x3s cat tier, which interpret mode runs
    # FAITHFULLY (real bf16 cat dots — resolve_precision docstring), so the
    # unnormalized 2^21 transform carries genuine bf16x3-grade error
    # (~1.1e-2 mean absolute here, ~6e-6 relative on hardware at 2^20);
    # the bar is the reference's 0.1 accuracy tolerance (tests/accuracy.rs:30-37)
    assert err < 0.1, err


def test_raders_conv_kernel_65537():
    """BASELINE scenario 3's largest prime: 65537 = F4, Rader inner 65536
    (256 x 256 conv split) — the whole conv route executes end to end."""
    from rustfft_tpu.ops.pallas import conv

    p = 65537
    assert conv.conv_supported(p - 1, np.complex64)
    fn = conv.make_raders_fn(p, FftDirection.FORWARD, np.complex64, interpret=True)
    sig = random_signal(p, dtype=np.complex64, seed=65537).reshape(1, p)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
    assert err < 1e-2, err


def test_pinned_algorithm_skips_fused(monkeypatch):
    """algorithm.py constructors pin the literal decomposition: no fused
    Pallas substitution even when use_pallas is active (ADVICE r1: Dft must
    stay an independent oracle)."""
    monkeypatch.setattr(config, "use_pallas", "on")
    from rustfft_tpu import algorithm, executor

    calls = []
    real_maybe_fused = executor._maybe_fused

    def spy(n, direction, dtype, mode):
        calls.append(n)
        return real_maybe_fused(n, direction, dtype, mode)

    monkeypatch.setattr(executor, "_maybe_fused", spy)
    executor._CACHE.clear()

    plan = algorithm.Dft(4096, FftDirection.FORWARD)
    assert calls == [], "pinned Dft must not consult the fused router"
    sig = random_signal(4096, dtype=np.complex64, seed=3)
    err = mean_element_error(
        np.asarray(plan.process(sig)), oracle_dft(sig, FftDirection.FORWARD)
    )
    assert err < 1e-3, err

    # planner-built plans of the same length DO consult it
    FftPlanner().plan_fft_forward(4096)
    assert 4096 in calls


@pytest.mark.parametrize(
    "direction", [FftDirection.FORWARD, FftDirection.INVERSE]
)
@pytest.mark.parametrize("n,radices", [
    (1024, None), (3888, None), (3888, (16, 243)), (720, None), (243, None),
    (4096, (16, 16, 16)),
])
def test_lanepack_matches_oracle(n, radices, direction):
    """Batch-in-lanes kernel (ops/pallas/lanepack.py): transforms in sublanes,
    arbitrary (unaligned) radices — the 3n2m class and the small-n tier."""
    from rustfft_tpu.ops.pallas import lanepack

    fn = lanepack.make_lanepack_fn(
        n, direction, np.complex64, radices=radices, interpret=True
    )
    batch = 130  # not a multiple of 128: exercises group padding
    sig = random_signal(batch * n, dtype=np.complex64, seed=5 + n).reshape(batch, n)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, direction))
    assert err < 1e-2, (n, radices, direction, err)


@pytest.mark.parametrize(
    "direction", [FftDirection.FORWARD, FftDirection.INVERSE]
)
@pytest.mark.parametrize("n", [16384, 65536])
def test_fused_three_stage_matches_oracle(n, direction):
    """3-stage fused kernel: n = p*q1*q2 in one VMEM pass (fused.py)."""
    fn = fused.make_fused_three_stage_fn(
        n, direction, np.complex64, interpret=True, batch_tile=2
    )
    sig = random_signal(2 * n, dtype=np.complex64, seed=9).reshape(2, n)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, direction))
    assert err < 1e-2, (n, direction, err)


def test_lanepack_supported_rules():
    from rustfft_tpu.ops.pallas import lanepack

    assert lanepack.lanepack_supported(3888, np.complex64)
    assert lanepack.lanepack_supported(1024, np.complex64)
    assert not lanepack.lanepack_supported(1009, np.complex64)  # prime
    assert not lanepack.lanepack_supported(3888, np.complex128)  # c64 only
    assert not lanepack.lanepack_supported(2, np.complex64)


@pytest.mark.parametrize(
    "direction", [FftDirection.FORWARD, FftDirection.INVERSE]
)
@pytest.mark.parametrize("n", [512, 1024, 4096])
def test_lanepack_flat_matches_oracle(n, direction):
    """Flat-view lanepack variant: (tb, 65536) whole-row I/O packing
    65536/n transforms per row, slot relayout in VMEM (round-5 DMA rule)."""
    from rustfft_tpu.ops.pallas import lanepack

    assert lanepack.flat_pack(n) == 65536 // n
    fn = lanepack.make_lanepack_fn(
        n, direction, np.complex64, interpret=True, variant="flat"
    )
    # not a multiple of tb*pack: exercises the flat padding path, and >1
    # grid step at the small sizes
    batch = (2 * 65536) // n + 3
    sig = random_signal(batch * n, dtype=np.complex64, seed=5 + n).reshape(batch, n)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, direction))
    assert err < 1e-2, (n, direction, err)


def test_lanepack_flat_pack_rules():
    from rustfft_tpu.ops.pallas import lanepack

    assert lanepack.flat_pack(3888) is None  # 65536 % n != 0
    assert lanepack.flat_pack(720) is None  # n % 128 != 0
    assert lanepack.flat_pack(65536) is None  # already a whole row
    # misaligned/unpackable sizes silently fall back to block form
    fn = lanepack.make_lanepack_fn(
        3888, FftDirection.FORWARD, np.complex64, interpret=True,
        variant="flat",
    )
    sig = random_signal(130 * 3888, dtype=np.complex64, seed=7).reshape(130, 3888)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
    assert err < 1e-2, err


@pytest.mark.parametrize(
    "direction", [FftDirection.FORWARD, FftDirection.INVERSE]
)
@pytest.mark.parametrize("n", [32768, 65536])
def test_fused_radix_matches_oracle(n, direction):
    """Radix-r fused kernel: MXU 128x128 stages + VPU radix chain (fused.py)."""
    fn = fused.make_fused_radix_fn(
        n, direction, np.complex64, interpret=True, batch_tile=1
    )
    sig = random_signal(2 * n, dtype=np.complex64, seed=11).reshape(2, n)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, direction))
    assert err < 1e-2, (n, direction, err)


@pytest.mark.parametrize(
    "direction", [FftDirection.FORWARD, FftDirection.INVERSE]
)
@pytest.mark.parametrize("variant", ["ctw", "ctwg"])
@pytest.mark.parametrize("precision", ["bf16x3s", "bf16x2s", None])
def test_fused_radix_ctw_matches_oracle(direction, variant, precision):
    """Traffic-lean ctw/ctwg radix variants: merged twiddle table + per-c
    twiddle-folded stage-B weights (fused._fused_kernel_ctw[g]); ctwg adds
    Gauss 3-multiplication complex GEMMs (the shipped default,
    config.radix_variant).  Cat tiers survive interpret mode faithfully
    (resolve_precision)."""
    n = 65536
    fn = fused.make_fused_radix_fn(
        n, direction, np.complex64, interpret=True, batch_tile=1,
        variant=variant, precision=precision,
    )
    sig = random_signal(2 * n, dtype=np.complex64, seed=12).reshape(2, n)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    ref = oracle_dft(sig, direction)
    rel = mean_element_error(out, ref) / np.abs(ref).mean()
    bar = 5e-3 if precision == "bf16x2s" else 2e-5
    assert rel < bar, (direction, variant, precision, rel)


@pytest.mark.parametrize(
    "direction", [FftDirection.FORWARD, FftDirection.INVERSE]
)
@pytest.mark.parametrize("n", [4096, 16384])
def test_fused_two_stage_gauss_matches_oracle(n, direction):
    """Gauss-variant two-stage kernel (the shipped default,
    config.two_stage_variant): 3 real dots per complex stage."""
    fn = fused.make_fused_two_stage_fn(
        n, direction, np.complex64, interpret=True, batch_tile=1,
        variant="gauss", precision="bf16x3s",
    )
    sig = random_signal(2 * n, dtype=np.complex64, seed=13).reshape(2, n)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    ref = oracle_dft(sig, direction)
    rel = mean_element_error(out, ref) / np.abs(ref).mean()
    assert rel < 2e-5, (n, direction, rel)


def test_fused_radix_supported_rules():
    assert fused.choose_rpq(32768) == (2, 128, 128)
    assert fused.choose_rpq(65536) == (4, 128, 128)
    assert fused.choose_rpq(1 << 18) == (16, 128, 128)
    assert fused.choose_rpq(16384) is None  # r == 1: two-stage territory
    assert fused.choose_rpq(3 * 16384) is None  # r must be a power of two
    assert fused.choose_rpq(1 << 19) is None  # r = 32: large pipeline wins


@pytest.mark.parametrize("n,m", [(600, 1296), (1009, 2187)])
@pytest.mark.parametrize(
    "direction", [FftDirection.FORWARD, FftDirection.INVERSE]
)
def test_bluestein_lanepack_conv_kernel(n, m, direction):
    """Lane-misaligned inner sizes route to the lanepack conv core
    (ops/pallas/lanepack.py make_lanepack_conv_fn)."""
    from rustfft_tpu.ops.pallas import conv, lanepack

    assert not conv.conv_supported(m, np.complex64)
    assert lanepack.lanepack_conv_supported(m, np.complex64)
    fn = conv.make_bluestein_fn(n, m, direction, np.complex64, interpret=True)
    sig = random_signal(3 * n, dtype=np.complex64, seed=n).reshape(3, n)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, direction))
    assert err < 1e-2, (n, m, direction, err)


@pytest.mark.parametrize("p", [1009, 617])
@pytest.mark.parametrize(
    "direction", [FftDirection.FORWARD, FftDirection.INVERSE]
)
def test_raders_lanepack_conv_kernel(p, direction):
    """Rader's natural inner m = p-1 (lane-misaligned) via the lanepack
    conv core — the route the aligned conv kernel cannot serve."""
    from rustfft_tpu.ops.pallas import conv, lanepack

    m = p - 1
    assert not conv.conv_supported(m, np.complex64)
    assert lanepack.lanepack_conv_supported(m, np.complex64)
    fn = conv.make_raders_fn(p, direction, np.complex64, interpret=True)
    sig = random_signal(3 * p, dtype=np.complex64, seed=p).reshape(3, p)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, direction))
    assert err < 1e-2, (p, direction, err)


def test_large_pipeline_deep_kernel_a():
    """The multi-stage kernel A variant (deep_a) stays correct — kept as a
    perf-harness option; measured slower than the dense form on v5e
    (large.py make_large_fft_fn docstring)."""
    from rustfft_tpu.ops.pallas import large

    n = 32768
    sig = random_signal(2 * n, dtype=np.complex64, seed=7).reshape(2, n)
    fn = large.make_large_fft_fn(
        n, FftDirection.FORWARD, np.complex64, interpret=True, deep_a=True
    )
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
    assert err < 1e-2, err


def test_large_pipeline_rejects_odd_tile_splits():
    """Odd factors would need whole-dim lane tiles, which fail the Mosaic
    compile (verified on v5e at n = 3^11): choose_pqq must only emit splits
    with p % 128 == 0 and q % 128 == 0, sending such sizes to the XLA path."""
    from rustfft_tpu.ops.pallas import large

    assert large.choose_pqq(3**11) is None
    assert not large.large_supported(3**11, np.complex64)
    for n in (1 << 20, 786432, 655360):  # incl. 3*2^18 and 5*2^17
        split = large.choose_pqq(n)
        p, q1, q2 = split
        assert p % 128 == 0 and (q1 * q2) % 128 == 0, (n, split)


def test_pallas_route_table():
    """Pin the measured routing tiers (executor.pallas_route is the single
    source of truth for _maybe_fused's dispatch; bands per CLAUDE.md)."""
    from rustfft_tpu import executor

    expect = {
        # round-4 dense band [125, 768] gated by pad_worth_it: one
        # whole-DFT MXU GEMM beats the factored tiers there
        # (tools/perf_small.py differential rows: 256: 634 vs 436, 512:
        # 595 vs 267, 729: 372 vs 183 GF/s); high-pad smooth sizes stay
        # XLA (144: 427 vs 324); primes/misaligned with no factored tier
        # fall back to dense up to 2048 (1009: 438 vs ~106, 2003: 215 vs 86)
        256: "dense", 500: "dense", 512: "dense", 537: "dense",
        729: "dense", 1009: "dense", 2003: "dense",
        125: "dense", 128: "dense", 144: None, 160: None, 64: None,
        1024: "lanepack", 2048: "lanepack",
        3888: "lanepack", 7776: "lanepack",
        # 4096 moved to lanepack in round 4: under the bf16x3s cat tier
        # lanepack measured 538 vs two-stage 470 GF/s (tools/perf_cat.py)
        4096: "lanepack", 16384: "two_stage",
        32768: "radix", 65536: "radix", 131072: "radix", 262144: "radix",
        524288: "large", 1 << 20: "large", 1 << 21: "large",
        # fused two-kernel pipeline: 4 HBM traversals beat large3's 6 at
        # every supported size (791/835/858/882 vs 667/689/688/- same-run)
        1 << 22: "large2f", 1 << 23: "large2f", 1 << 24: "large2f",
        1 << 25: "large2f",
        # large2f's (256, 64) pass-1 block exceeds VMEM at 2^26; the
        # factored-twiddle 3-kernel pipeline takes over
        1 << 26: "large3f",
        3 << 22: None,  # non-pow2 P2 digit -> XLA path
        100: None,      # below pallas_min_n
        # the (MAX_FUSED_N, large_min) backstop: too big for one pass, no
        # radix-r pow2 split — the late large_supported branch serves these
        # below large_min on purpose (the alternative is the XLA six-step)
        393216: "large", 327680: "large",
        # ...and it never shadows the misaligned tiers: lane-misaligned
        # composites keep large_pad (>= largepad_min_n) or fall through
        # to the XLA path (large_supported's q1*q2 constraints reject them)
        78125: "large_pad", 177147: "large_pad", 59049: None,
        # 3*2^16 stays aligned two_stage (q = 3*2^16/256 is a 128-multiple)
        196608: "two_stage",
    }
    for n, route in expect.items():
        assert executor.pallas_route(n, np.complex64, mode="tpu") == route, n
    # c128 never routes to the c64-only kernels
    assert executor.pallas_route(65536, np.complex128, mode="tpu") is None


def test_precision_tiers_plumbing():
    """The bf16x2/bf16 throughput tiers thread through every kernel factory
    (interpret mode substitutes true f32, so this pins plumbing + shapes;
    the accuracy of the 2-/1-pass math is a hardware-tier artifact,
    ACCURACY_TPU.md)."""
    import jax

    for prec in ("bf16x2", "bf16"):
        # resolve_precision substitutes HIGHEST under the interpreter and
        # passes the tier through untouched on hardware
        assert (
            fused.resolve_precision(prec, True) == jax.lax.Precision.HIGHEST
        )
        assert fused.resolve_precision(prec, False) == prec
        fn = fused.make_fused_two_stage_fn(
            256, FftDirection.FORWARD, np.complex64, interpret=True,
            precision=prec,
        )
        sig = random_signal(2 * 256, dtype=np.complex64, seed=9).reshape(2, 256)
        re, im = calg.from_numpy(sig, np.float32)
        out_r, out_i = fn((re, im))
        out = np.asarray(out_r) + 1j * np.asarray(out_i)
        err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
        assert err < 1e-2, (prec, err)


def test_w_split_reconstructs():
    """bf16 (hi, lo) weight splits reconstruct the f32 table to bf16^2."""
    rng = np.random.default_rng(3)
    w = rng.standard_normal((16, 16)).astype(np.float32)
    for prec in ("bf16x3", "bf16x2", "bf16"):
        hi, lo = fused.w_split(w, prec)
        back = np.asarray(hi, np.float32) + np.asarray(lo, np.float32)
        assert np.abs(back - w).max() < 1e-4
    # XLA tiers ship the f32 table untouched
    import jax

    hi, lo = fused.w_split(w, jax.lax.Precision.HIGHEST)
    assert hi.dtype == np.float32 and np.array_equal(hi, w)


def test_large3_matches_oracle():
    """Three-kernel pipeline (interpret mode, scaled-down split): the full
    pass1/pass2/pass3 chain with 4D block scatter must land natural order."""
    from rustfft_tpu.ops.pallas import large3

    for split, batch in (((8, 2, 4, 4, 16)), 3), ((8, 4, 4, 4, 16), 2):
        p1, p2, q1, q2, q = split
        n = p1 * p2 * q
        fn = large3.make_large3_fft_fn(
            n, FftDirection.FORWARD, np.complex64, split=split,
            interpret=True, pt=8, qt=16,
        )
        sig = random_signal(batch * n, dtype=np.complex64, seed=n).reshape(
            batch, n
        )
        re, im = calg.from_numpy(sig, np.float32)
        out_r, out_i = fn((re, im))
        out = np.asarray(out_r) + 1j * np.asarray(out_i)
        err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
        assert err < 1e-2, (split, err)


def test_large3_inverse_and_qt2_tiling():
    from rustfft_tpu.ops.pallas import large3

    split = (8, 2, 4, 4, 16)
    n = 8 * 2 * 16
    fn = large3.make_large3_fft_fn(
        n, FftDirection.INVERSE, np.complex64, split=split, interpret=True,
        pt=8, qt=16, qt2=8,  # qt2 < Q exercises the strided pass-2 blocks
    )
    sig = random_signal(2 * n, dtype=np.complex64, seed=7).reshape(2, n)
    re, im = calg.from_numpy(sig, np.float32)
    out_r, out_i = fn((re, im))
    out = np.asarray(out_r) + 1j * np.asarray(out_i)
    err = mean_element_error(out, oracle_dft(sig, FftDirection.INVERSE))
    assert err < 1e-2, err


def test_large3_split_chooser():
    from rustfft_tpu.ops.pallas import large3

    for n in (1 << 23, 1 << 24):
        sp = large3.choose_split3(n)
        p1, p2, q1, q2, q = sp
        assert p1 * p2 * q == n and q1 * q2 == q, (n, sp)
        assert p1 % 128 == 0 and p2 in (2, 4, 8, 16), (n, sp)
    assert large3.choose_split3(3 << 22) is None  # non-pow2 P2
    assert not large3.large3_supported(1 << 23, np.complex128)


def test_permute_kernel_exact():
    """5-phase Benes permutation kernel (ops/pallas/permute.py): random and
    structured (Rader root-order) permutations reproduce x[..., perm]
    EXACTLY (every phase is a pure pick — no arithmetic on the values)."""
    import math

    from rustfft_tpu.ops.pallas import permute

    rng = np.random.default_rng(11)
    m = 16384
    perms = [rng.permutation(m)]
    # a structured multiplicative-stride permutation (same scattered-access
    # character as the Rader root orders)
    g = 5
    assert math.gcd(g, m) == 1
    perms.append((np.arange(m, dtype=np.int64) * g + 7) % m)
    for perm in perms:
        fn = permute.make_permute_fn(perm, interpret=True, tb=2)
        xr = rng.standard_normal((3, m)).astype(np.float32)
        xi = rng.standard_normal((3, m)).astype(np.float32)
        o_r, o_i = fn((xr, xi))
        assert np.array_equal(np.asarray(o_r), xr[:, perm])
        assert np.array_equal(np.asarray(o_i), xi[:, perm])


def test_permute_edge_coloring():
    """Euler-split edge coloring: proper (no node repeats a color) on a
    k-regular bipartite multigraph, including non-power-of-two node counts."""
    from rustfft_tpu.ops.pallas import permute

    rng = np.random.default_rng(7)
    n_nodes, colors = 6, 8  # 8-regular on 6+6 nodes
    src = np.repeat(np.arange(n_nodes), colors)
    dst = np.concatenate([rng.permutation(n_nodes) for _ in range(colors)])
    dst = np.repeat(dst[: n_nodes * colors // n_nodes], 1)[: len(src)]
    # build a proper k-regular multigraph: k random perfect matchings
    dst = np.concatenate(
        [rng.permutation(n_nodes) for _ in range(colors)]
    )
    src = np.tile(np.arange(n_nodes), colors)
    col = permute.edge_color(src, dst, colors, n_nodes)
    for node in range(n_nodes):
        assert len(set(col[src == node])) == colors
        assert len(set(col[dst == node])) == colors


def test_permute_supported_grid():
    from rustfft_tpu.ops.pallas import permute

    assert permute.choose_x(16384) == 1
    assert permute.choose_x(65536) == 4
    assert permute.choose_x(3 * 16384) == 3  # non-pow2 X is fine
    assert permute.choose_x(17 * 16384) is None  # select tree cap
    assert permute.choose_x(8192) is None
    assert not permute.permute_supported(65536, np.complex128)


def test_large2f_matches_oracle():
    """Fused two-kernel pipeline (interpret mode, scaled-down splits): the
    fused column stage (DFT_P1 + factorized twiddles + j2 VPU chain) must
    chain into kernel Q and land natural order, both directions."""
    from rustfft_tpu.ops.pallas import large2f

    for split, batch, direction, b2d in (
        ((8, 2, 4, 4, 16), 3, FftDirection.FORWARD, False),
        ((8, 4, 4, 4, 16), 2, FftDirection.FORWARD, False),
        ((8, 2, 4, 4, 16), 2, FftDirection.INVERSE, False),
        # reduced-rank HBM block descriptions (round-5 flat-view rule)
        ((8, 2, 4, 4, 16), 3, FftDirection.FORWARD, True),
        ((8, 4, 4, 4, 16), 2, FftDirection.INVERSE, True),
    ):
        p1, p2, q1, q2, q = split
        n = p1 * p2 * q
        fn = large2f.make_large2f_fft_fn(
            n, direction, np.complex64, split=split, interpret=True,
            pt=8, qt3=16, blocks2d=b2d,
        )
        sig = random_signal(batch * n, dtype=np.complex64, seed=n).reshape(
            batch, n
        )
        re, im = calg.from_numpy(sig, np.float32)
        out_r, out_i = fn((re, im))
        out = np.asarray(out_r) + 1j * np.asarray(out_i)
        err = mean_element_error(out, oracle_dft(sig, direction))
        assert err < 1e-2, (split, direction, err)


def test_large2f_split_chooser():
    from rustfft_tpu.ops.pallas import large2f

    for lg in (22, 23, 24, 25):
        sp = large2f.choose_split2f(1 << lg)
        p1, p2, q1, q2, q = sp
        assert p1 * p2 * q == (1 << lg) and q1 * q2 == q, (lg, sp)
        assert p1 in (128, 256) and 8 <= p2 <= 64, (lg, sp)
        assert q in (2048, 4096), (lg, sp)
    assert large2f.choose_split2f(3 << 22) is None  # non-pow2 P2
    assert not large2f.large2f_supported(1 << 23, np.complex128)
    assert not large2f.large2f_supported(1 << 27, np.complex64)


def test_radix_conv_bluestein_matches_oracle():
    """Two-kernel radix-structured conv core (ops/pallas/conv_radix.py):
    whole Bluestein pipeline at an r*128*128 inner, interpret mode."""
    from rustfft_tpu.ops import bluestein as op_bluestein
    from rustfft_tpu.ops.pallas import conv_radix

    n, m = 15000, 32768
    assert conv_radix.radix_conv_supported(m, np.complex64)
    chirp, h_fft = op_bluestein.bluestein_tables(n, m, FftDirection.FORWARD)
    fn = conv_radix.make_radix_conv_fn(
        m, FftDirection.FORWARD, np.complex64, h=h_fft, pre=chirp,
        post=chirp, conj_out=True, n_in=n, n_out=n, interpret=True,
    )
    sig = random_signal(2 * n, dtype=np.complex64, seed=11).reshape(2, n)
    o_r, o_i = fn((sig.real, sig.imag))
    assert o_r.shape == (2, n)
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
    assert err < 1e-2, err


def test_radix_conv_epilogue_fusion():
    """x0_add / emit_sum (the fused Rader epilogue): pass 2 adds the
    per-signal const to every bin, pass 1 emits exact f32 input sums."""
    from rustfft_tpu.ops import bluestein as op_bluestein
    from rustfft_tpu.ops.pallas import conv_radix

    m = 32768
    # identity-ish conv: h = FFT spectrum of a delta is all-ones, so the
    # core computes conj(FFT(conj(FFT(x)))) = m * x (forward-forward pair)
    h = np.ones(m, np.complex128)
    sig = random_signal(2 * m, dtype=np.complex64, seed=7).reshape(2, m)
    c0 = (np.float32([[0.5], [-1.25]]), np.float32([[2.0], [0.75]]))
    fn = conv_radix.make_radix_conv_fn(
        m, FftDirection.FORWARD, np.complex64, h=h, conj_out=True,
        interpret=True, x0_add=True, emit_sum=True,
    )
    (o_r, o_i), (s_r, s_i) = fn((sig.real, sig.imag), const=c0)
    assert o_r.shape == (2, m) and s_r.shape == (2, 1)
    np.testing.assert_allclose(
        np.asarray(s_r)[:, 0], sig.real.sum(axis=-1), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s_i)[:, 0], sig.imag.sum(axis=-1), rtol=1e-5, atol=1e-4
    )
    want = m * sig + (c0[0] + 1j * c0[1])
    got = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(got / m, want / m)
    assert err < 1e-2, err


def test_radix_conv_rader_65537(monkeypatch):
    """Rader at the headline prime routes through the radix conv core when
    the threshold admits its inner (65536 = 4*128*128)."""
    monkeypatch.setattr(config, "conv_radix_min_m", 32768)
    from rustfft_tpu.ops.pallas import conv

    p = 65537
    fn = conv.make_raders_fn(p, FftDirection.INVERSE, np.complex64,
                             interpret=True)
    sig = random_signal(p, dtype=np.complex64, seed=3).reshape(1, p)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, FftDirection.INVERSE))
    assert err < 1e-2, err


def test_radix_conv_unsupported():
    from rustfft_tpu.ops.pallas import conv_radix

    assert not conv_radix.radix_conv_supported(2048, np.complex64)
    assert not conv_radix.radix_conv_supported(65536, np.complex128)


def test_largepad_matches_oracle():
    """Padded-lane pipeline (ops/pallas/largepad.py): lane-misaligned
    factors with in-kernel zero padding, interpret mode."""
    from rustfft_tpu.ops.pallas import largepad

    for n, split in ((3125, (25, 25, 5)), (46656, None)):  # 46656 = 6^6
        sp = split or largepad.choose_pq_padded(n)
        assert sp is not None, n
        fn = largepad.make_largepad_fft_fn(
            n, FftDirection.FORWARD, np.complex64, split=sp, interpret=True
        )
        sig = random_signal(2 * n, dtype=np.complex64, seed=n).reshape(2, n)
        o_r, o_i = fn((sig.real, sig.imag))
        out = np.asarray(o_r) + 1j * np.asarray(o_i)
        err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
        assert err < 1e-2, (n, err)


def test_largepad_inverse():
    from rustfft_tpu.ops.pallas import largepad

    n = 3125
    fn = largepad.make_largepad_fft_fn(
        n, FftDirection.INVERSE, np.complex64, split=(25, 25, 5),
        interpret=True,
    )
    sig = random_signal(n, dtype=np.complex64, seed=4).reshape(1, n)
    o_r, o_i = fn((sig.real, sig.imag))
    out = np.asarray(o_r) + 1j * np.asarray(o_i)
    err = mean_element_error(out, oracle_dft(sig, FftDirection.INVERSE))
    assert err < 1e-2, err


def test_largepad_split_chooser_and_routing():
    from rustfft_tpu import executor
    from rustfft_tpu.ops.pallas import largepad

    # good pad ratios accepted; sub-8 inner factors and pathological pad
    # ratios rejected (measured Mosaic failures / XLA wins)
    for n in (59049, 78125, 177147, 10000):
        sp = largepad.choose_pq_padded(n)
        assert sp is not None, n
        p, q1, q2 = sp
        assert p * q1 * q2 == n and min(q1, q2) >= 8, (n, sp)
    assert largepad.choose_pq_padded(16807) is None  # 2.9x pad -> XLA
    assert largepad.choose_pq_padded(15625) is None  # only q1=5 splits
    assert not largepad.largepad_supported(78125, np.complex128)
    # routing: only ABOVE the measured win boundary (78125 beats XLA 324
    # vs 204; 59049 and below lose and stay on the XLA path)
    assert executor.pallas_route(78125, np.complex64, mode="tpu") == "large_pad"
    assert executor.pallas_route(177147, np.complex64, mode="tpu") == "large_pad"
    assert executor.pallas_route(59049, np.complex64, mode="tpu") is None
    assert executor.pallas_route(15625, np.complex64, mode="tpu") is None


def test_cat_tiers_match_multidot_terms():
    """Single-dot cat tiers (bf16x3s/bf16x2s) are term-for-term the same
    math as bf16x3/bf16x2 issued as ONE MXU dot over a concatenated K.
    Unlike the multi-dot tiers, they survive interpret mode faithfully
    (nothing for XLA's dot merger to cancel), so accuracy is pinned HERE:
    bf16x3s must land at bf16x3 grade (~5e-6 relative), bf16x2s at
    bf16x2 grade (~2.3e-3, the dropped x_lo bits)."""
    from rustfft_tpu.ops.pallas import lanepack

    n = 1024
    sig = random_signal(256 * n, dtype=np.complex64, seed=7).reshape(256, n)
    re, im = calg.from_numpy(sig, np.float32)
    expected = oracle_dft(sig, FftDirection.FORWARD)

    errs = {}
    for prec in ("bf16x3s", "bf16x2s"):
        fn = lanepack.make_lanepack_fn(
            n, FftDirection.FORWARD, np.complex64, interpret=True,
            precision=prec,
        )
        out_r, out_i = fn((re, im))
        out = np.asarray(out_r) + 1j * np.asarray(out_i)
        errs[prec] = mean_element_error(out, expected)
    # absolute mean error (reference metric): outputs scale ~sqrt(n)=32,
    # so bf16x3 grade (5e-6 rel) ~ 2e-4 abs, bf16x2 grade (2.3e-3 rel) ~ 0.09
    assert errs["bf16x3s"] < 1e-3, errs
    assert errs["bf16x2s"] < 0.3, errs
    # the tiers must be genuinely different precisions (x3s keeps x_lo)
    assert errs["bf16x3s"] < errs["bf16x2s"] / 10, errs


@pytest.mark.parametrize("family", ["two_stage", "radix", "dense"])
def test_cat_tier_kernel_families(family):
    """bf16x3s threads through every kernel factory via w_split/contract_*
    (one concatenated table in the hi slot, dummy lo)."""
    if family == "two_stage":
        n = 4096
        fn = fused.make_fused_two_stage_fn(
            n, FftDirection.FORWARD, np.complex64, interpret=True,
            precision="bf16x3s",
        )
    elif family == "radix":
        n = 65536
        fn = fused.make_fused_radix_fn(
            n, FftDirection.FORWARD, np.complex64, interpret=True,
            precision="bf16x3s",
        )
    elif family == "dense":
        from rustfft_tpu.ops.pallas import dense

        n = 100
        fn = dense.make_dense_fft_fn(
            n, FftDirection.FORWARD, np.complex64, interpret=True,
            precision="bf16x3s",
        )
    batch = 2 if n > 10000 else 8
    sig = random_signal(batch * n, dtype=np.complex64, seed=n).reshape(batch, n)
    re, im = calg.from_numpy(sig, np.float32)
    out_r, out_i = fn((re, im))
    out = np.asarray(out_r) + 1j * np.asarray(out_i)
    err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
    assert err < 1e-2, (family, err)


def test_cat_tier_through_planner(monkeypatch):
    """config.pallas_precision='bf16x3s' + use_pallas='on': the public plan
    surface stays correct (executor memo keys on the precision)."""
    monkeypatch.setattr(config, "use_pallas", "on")
    monkeypatch.setattr(config, "pallas_precision", "bf16x3s")
    planner = FftPlanner()
    # 1237 routes Bluestein through the conv kernel with the cat tier
    for n in (144, 1024, 1237):
        plan = planner.plan_fft_forward(n)
        sig = random_signal(n, dtype=np.complex64, seed=n)
        out = np.asarray(plan.process(sig))
        err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
        assert err < 1e-3, (n, err)


def test_large3f_factored_twiddles_match_oracle():
    """Factored-twiddle 3-kernel pipeline (large3f): pass 1 streams only the
    (Q, P1) j3 factor (modular block map) and pass 2 applies the (P2, P1)
    j2 factor before its VPU chain.  Scaled-down splits, incl. one where
    the pass-1 table wraps (qt < Q)."""
    from rustfft_tpu.ops.pallas import large3

    for split, qt, batch in (
        ((8, 8, 4, 4, 16), 16, 3),  # one block per j2
        ((8, 8, 4, 4, 16), 8, 2),   # two blocks per j2: modular map wraps
        ((8, 4, 4, 4, 16), 8, 2),   # P2 != P1
    ):
        p1, p2, q1, q2, q = split
        n = p1 * p2 * q
        fn = large3.make_large3_fft_fn(
            n, FftDirection.FORWARD, np.complex64, split=split,
            interpret=True, pt=8, qt=qt, factored=True,
        )
        sig = random_signal(batch * n, dtype=np.complex64, seed=n + qt).reshape(
            batch, n
        )
        re, im = calg.from_numpy(sig, np.float32)
        out_r, out_i = fn((re, im))
        out = np.asarray(out_r) + 1j * np.asarray(out_i)
        err = mean_element_error(out, oracle_dft(sig, FftDirection.FORWARD))
        assert err < 1e-2, (split, qt, err)


def test_large3f_routing_and_chooser():
    """2^26 routes to large3f (past large2f's VMEM edge); the chooser keeps
    Q = 4096 and extends P2 past large3's table cap."""
    from rustfft_tpu import executor
    from rustfft_tpu.ops.pallas import large3

    assert large3.choose_split3f(1 << 26) == (256, 64, 64, 64, 4096)
    assert large3.large3f_supported(1 << 26, np.complex64)
    assert not large3.large3_supported(1 << 26, np.complex64)  # P2 > 16
    assert executor.pallas_route(1 << 26, np.complex64, mode="tpu") == "large3f"
    # below the default threshold large2f keeps the band
    assert executor.pallas_route(1 << 25, np.complex64, mode="tpu") == "large2f"


def test_w_cat_terms_equal_multidot():
    """w_cat / w_cat_pair tables reproduce the multi-dot tier term-for-term:
    dot(x_cat, w_cat) == the explicit hi/lo product sum, exactly (same bf16
    products, f32 accumulation)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    K, N, B = 16, 24, 5
    w = rng.standard_normal((N, K)).astype(np.float32)  # wlhs (out, K)
    x = rng.standard_normal((K, B)).astype(np.float32)

    w_hi = w.astype(jnp.bfloat16)
    w_lo = (w - np.asarray(w_hi, np.float32)).astype(jnp.bfloat16)
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - np.asarray(x_hi, np.float32)).astype(jnp.bfloat16)

    def d(a, b):
        return np.asarray(a, np.float32) @ np.asarray(b, np.float32)

    want3 = d(w_hi, x_hi) + d(w_lo, x_hi) + d(w_hi, x_lo)

    w_cat = fused.w_cat(w, "bf16x3s")
    assert w_cat.shape == (N, 3 * K) and w_cat.dtype == jnp.bfloat16
    x_cat = np.concatenate(
        [np.asarray(x_hi, np.float32)] * 2 + [np.asarray(x_lo, np.float32)],
        axis=0,
    )
    got3 = np.asarray(w_cat, np.float32) @ x_cat
    np.testing.assert_allclose(got3, want3, rtol=0, atol=1e-5)

    # pair form: dot(wA, xr) + dot(wB, xi) at bf16x3
    wA, wB = w[:, : K // 2], w[:, K // 2 :]
    xr, xi = x[: K // 2], x[K // 2 :]
    wp_cat = fused.w_cat_pair(wA, wB, "bf16x3s")
    assert wp_cat.shape == (N, 6 * (K // 2))

    def split(a):
        hi = a.astype(jnp.bfloat16)
        lo = (a - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        return np.asarray(hi, np.float32), np.asarray(lo, np.float32)

    wA_hi, wA_lo = split(wA)
    wB_hi, wB_lo = split(wB)
    xr_hi, xr_lo = split(xr)
    xi_hi, xi_lo = split(xi)
    want = (wA_hi @ xr_hi + wA_lo @ xr_hi + wA_hi @ xr_lo
            + wB_hi @ xi_hi + wB_lo @ xi_hi + wB_hi @ xi_lo)
    x_cat = np.concatenate([xr_hi, xr_hi, xr_lo, xi_hi, xi_hi, xi_lo], axis=0)
    got = np.asarray(wp_cat, np.float32) @ x_cat
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
