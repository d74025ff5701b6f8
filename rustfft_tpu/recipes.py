"""Recipe AST: the planner's algorithm-selection output as pure data.

Port of the reference `Recipe` enum (src/plan.rs:131-238).  In the reference a
recipe is built into a tree of `Arc<dyn Fft<T>>` trait objects; here a recipe
is a frozen, hashable pytree of dataclasses that the executor (executor.py)
lowers into a single jittable JAX function.  Hashability matters: the compile
cache is keyed on (recipe, direction, dtype) — the TPU analogue of the
reference's FftCache (src/fft_cache.rs:5-39).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import math


class Recipe:
    """Base class for all recipe nodes."""

    __slots__ = ()

    def __len__(self) -> int:
        return self.length  # type: ignore[attr-defined]


@dataclass(frozen=True)
class Dft(Recipe):
    """Dense DFT-matrix transform of any size, including 0 and 1.

    Doubles as (a) the trivial-length recipe (reference: plan.rs:312-314 emits
    Recipe::Dft for len < 2), (b) the O(n^2) oracle algorithm
    (algorithm/dft.rs:22-81), and (c) on TPU, the *fast* path for small n:
    a batched matmul against the n x n DFT matrix runs on the MXU, so the TPU
    planner emits Dft for sizes far beyond the reference's scalar Dft usage.
    """

    length: int


@dataclass(frozen=True)
class Butterfly(Recipe):
    """Fixed-size base kernel, sizes {2..9,11,12,13,16,17,19,23,24,27,29,31,32}.

    Replaces the reference's hand-written butterfly kernels
    (algorithm/butterflies.rs:97-6434, plan.rs:610-634).  On TPU these lower to
    either a DFT-matrix matmul or a fused Pallas kernel; the recipe only
    records the size so planner parity tests stay exact.
    """

    length: int


@dataclass(frozen=True)
class Radix4(Recipe):
    """Power-of-two FFT: base butterfly + k layers of radix-4 cross FFTs.

    reference: plan.rs:568-573, algorithm/radix4.rs.
    Total length = base.length * 4**k.
    """

    k: int
    base: Recipe

    @property
    def length(self) -> int:
        return self.base.length * 4**self.k


@dataclass(frozen=True)
class RadixN(Recipe):
    """Generalized radix chain over factors in {2,3,4,5,6,7} above a base.

    reference: plan.rs:575-606, algorithm/radixn.rs.
    """

    factors: Tuple[int, ...]
    base: Recipe

    @property
    def length(self) -> int:
        return self.base.length * math.prod(self.factors)


@dataclass(frozen=True)
class MixedRadix(Recipe):
    """Cooley-Tukey n = left * right via the six-step formulation.

    reference: plan.rs:500-505, algorithm/mixed_radix.rs:35-238.
    """

    left: Recipe
    right: Recipe

    @property
    def length(self) -> int:
        return self.left.length * self.right.length


@dataclass(frozen=True)
class MixedRadixSmall(Recipe):
    """MixedRadix variant for two butterfly-sized factors.

    reference: plan.rs:466-470,487-499, algorithm/mixed_radix.rs:266-507.
    The executor fuses both stages without intermediate transposes.
    """

    left: Recipe
    right: Recipe

    @property
    def length(self) -> int:
        return self.left.length * self.right.length


@dataclass(frozen=True)
class GoodThomas(Recipe):
    """Prime-Factor Algorithm for coprime left * right — no twiddles.

    reference: plan.rs:378-384, algorithm/good_thomas_algorithm.rs:40-311.
    CRT input re-index and Ruritanian output re-index become one-time gather
    index arrays on TPU.
    """

    left: Recipe
    right: Recipe

    @property
    def length(self) -> int:
        return self.left.length * self.right.length


@dataclass(frozen=True)
class GoodThomasSmall(Recipe):
    """Good-Thomas with precomputed permutation tables for butterfly sizes.

    reference: plan.rs:460-464, algorithm/good_thomas_algorithm.rs:344-649.
    """

    left: Recipe
    right: Recipe

    @property
    def length(self) -> int:
        return self.left.length * self.right.length


@dataclass(frozen=True)
class Raders(Recipe):
    """Rader's algorithm: prime n via cyclic convolution of size n-1.

    reference: plan.rs:401-403, algorithm/raders_algorithm.rs:41-330.
    """

    inner: Recipe

    @property
    def length(self) -> int:
        return self.inner.length + 1


@dataclass(frozen=True)
class Bluesteins(Recipe):
    """Bluestein's chirp-z algorithm: arbitrary n via inner FFT of m >= 2n-1.

    reference: plan.rs:405-408, algorithm/bluesteins_algorithm.rs:39-226.
    """

    length: int
    inner: Recipe


def recipe_len(recipe: Recipe) -> int:
    return recipe.length
