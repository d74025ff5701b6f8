"""Public per-algorithm constructors — parity with `rustfft::algorithm`.

The reference exposes its composite algorithms as directly constructible
types implementing `Fft<T>` (src/algorithm/mod.rs:1-21): `Dft`, `Radix4`,
`Radix3`, `MixedRadix(+Small)`, `GoodThomasAlgorithm(+Small)`,
`RadersAlgorithm`, `BluesteinsAlgorithm`, plus the `butterflies` module.
Users who want a specific decomposition (bypassing the planner) build these
by hand; each takes pre-built inner FFTs exactly like the reference
constructors take `Arc<dyn Fft<T>>`.

Here every constructor returns an `FftPlan` built from the corresponding
recipe node — plans are the uniform `Fft`-trait analogue (plan.py), so
hand-built algorithms compose with planner-built ones.

All constructors build with `pinned=True`: the literal requested
decomposition executes (no fused-Pallas-kernel substitution by the
executor), so e.g. `Dft` stays an independent full-precision oracle.
Planner-built plans are the performance path.
"""
from __future__ import annotations

import numpy as np

from . import recipes
from .common import FftDirection
from .plan import FftPlan
from .planner import BUTTERFLY_SIZES


def _leaf(n: int) -> recipes.Recipe:
    return recipes.Butterfly(n) if n in BUTTERFLY_SIZES else recipes.Dft(n)


def _check_inner(*plans: FftPlan):
    d0 = plans[0].fft_direction()
    t0 = plans[0].dtype
    for p in plans[1:]:
        if p.fft_direction() is not d0:
            raise ValueError("inner FFTs must share a direction")
        if p.dtype != t0:
            raise ValueError("inner FFTs must share a dtype")
    return d0, t0


def Dft(length: int, direction: FftDirection, dtype=np.complex64) -> FftPlan:
    """Naive O(n^2) DFT — the reference oracle (algorithm/dft.rs:22-81).

    On TPU this is simultaneously the *fast* small-size path: one dense
    MXU matmul against the n x n DFT matrix.
    """
    return FftPlan(recipes.Dft(length), direction, dtype, pinned=True)


def Butterfly(length: int, direction: FftDirection, dtype=np.complex64) -> FftPlan:
    """Fixed-size base kernel (algorithm/butterflies.rs), sizes 2..32."""
    if length not in BUTTERFLY_SIZES:
        raise ValueError(
            f"no butterfly of size {length}; reference set is "
            f"{sorted(BUTTERFLY_SIZES)} (plan.rs:610-634)"
        )
    return FftPlan(recipes.Butterfly(length), direction, dtype, pinned=True)


def Radix4(length: int, direction: FftDirection, dtype=np.complex64) -> FftPlan:
    """Power-of-two FFT (algorithm/radix4.rs).

    Base selection mirrors radix4.rs:50-63: lengths up to 8 run directly;
    larger use base 16 (even exponent) or 32 (odd), with radix-4 layers above.
    """
    if length & (length - 1):
        raise ValueError(f"Radix4 requires a power-of-two length, got {length}")
    bits = length.bit_length() - 1
    if bits <= 3:
        return FftPlan(_leaf(length), direction, dtype, pinned=True)
    base = 16 if bits % 2 == 0 else 32
    k = (bits - base.bit_length() + 1) // 2
    return FftPlan(recipes.Radix4(k, recipes.Butterfly(base)), direction, dtype, pinned=True)


def Radix3(length: int, direction: FftDirection, dtype=np.complex64) -> FftPlan:
    """Power-of-three FFT (algorithm/radix3.rs); bases {1, 3, 9, 27}."""
    n, k = length, 0
    while n % 3 == 0:
        n //= 3
        k += 1
    if n != 1:
        raise ValueError(f"Radix3 requires a power-of-three length, got {length}")
    if length <= 27:
        return FftPlan(_leaf(length), direction, dtype, pinned=True)
    base = recipes.Butterfly(27)
    return FftPlan(recipes.RadixN((3,) * (k - 3), base), direction, dtype, pinned=True)


def MixedRadix(width_fft: FftPlan, height_fft: FftPlan) -> FftPlan:
    """Cooley-Tukey n = w*h six-step (algorithm/mixed_radix.rs:35-238)."""
    direction, dtype = _check_inner(width_fft, height_fft)
    recipe = recipes.MixedRadix(width_fft.recipe, height_fft.recipe)
    return FftPlan(recipe, direction, dtype, pinned=True)


def MixedRadixSmall(width_fft: FftPlan, height_fft: FftPlan) -> FftPlan:
    """MixedRadix variant for butterfly-sized factors (mixed_radix.rs:266-507)."""
    direction, dtype = _check_inner(width_fft, height_fft)
    recipe = recipes.MixedRadixSmall(width_fft.recipe, height_fft.recipe)
    return FftPlan(recipe, direction, dtype, pinned=True)


def GoodThomasAlgorithm(width_fft: FftPlan, height_fft: FftPlan) -> FftPlan:
    """Prime-Factor Algorithm for coprime w*h (good_thomas_algorithm.rs:40-311)."""
    import math

    if math.gcd(len(width_fft), len(height_fft)) != 1:
        raise ValueError(
            "GoodThomasAlgorithm requires coprime inner lengths, got "
            f"{len(width_fft)} and {len(height_fft)}"
        )
    direction, dtype = _check_inner(width_fft, height_fft)
    recipe = recipes.GoodThomas(width_fft.recipe, height_fft.recipe)
    return FftPlan(recipe, direction, dtype, pinned=True)


def GoodThomasAlgorithmSmall(width_fft: FftPlan, height_fft: FftPlan) -> FftPlan:
    """Good-Thomas with precomputed maps (good_thomas_algorithm.rs:344-649)."""
    import math

    if math.gcd(len(width_fft), len(height_fft)) != 1:
        raise ValueError(
            "GoodThomasAlgorithmSmall requires coprime inner lengths, got "
            f"{len(width_fft)} and {len(height_fft)}"
        )
    direction, dtype = _check_inner(width_fft, height_fft)
    recipe = recipes.GoodThomasSmall(width_fft.recipe, height_fft.recipe)
    return FftPlan(recipe, direction, dtype, pinned=True)


def RadersAlgorithm(inner_fft: FftPlan) -> FftPlan:
    """Prime-length FFT via cyclic convolution (raders_algorithm.rs:41-330).

    `inner_fft` must have length p-1 for the (prime) target length p —
    the same contract as the reference constructor.
    """
    from . import math_utils

    p = len(inner_fft) + 1
    if not math_utils.is_prime(p):
        raise ValueError(
            f"RadersAlgorithm requires inner length + 1 prime, got {p}"
        )
    recipe = recipes.Raders(inner_fft.recipe)
    return FftPlan(recipe, inner_fft.fft_direction(), inner_fft.dtype, pinned=True)


def BluesteinsAlgorithm(length: int, inner_fft: FftPlan) -> FftPlan:
    """Arbitrary-length FFT via chirp-z (bluesteins_algorithm.rs:39-226).

    `inner_fft` may be any FFT of length >= 2*length - 1.
    """
    if len(inner_fft) < 2 * length - 1:
        raise ValueError(
            f"BluesteinsAlgorithm inner length {len(inner_fft)} < "
            f"2*{length}-1 (bluesteins_algorithm.rs:39)"
        )
    recipe = recipes.Bluesteins(length, inner_fft.recipe)
    return FftPlan(recipe, inner_fft.fft_direction(), inner_fft.dtype, pinned=True)
