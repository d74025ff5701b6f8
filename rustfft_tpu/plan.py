"""The plan object — TPU-functional equivalent of the `Fft<T>` trait.

Reference: src/lib.rs:184-278.  The four process methods and three
scratch-size queries are kept for API parity, but in a functional runtime
there is no caller-managed scratch: XLA allocates and reuses buffers during
compilation, so every scratch query returns 0 and every process variant maps
to the same pure computation.  Batching keeps the reference contract: any
buffer whose (last-axis) length is a multiple of `len` is processed as
independent chunks (lib.rs:195-211, fft_helper.rs:9-28).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import executor, recipes
from .common import FftBufferError, FftDirection, canonical_complex_dtype, validate_buffer_len


class FftPlan:
    """A planned FFT of one (length, direction, dtype), reusable and jittable.

    Immutable after construction and safe to share across threads — the
    analogue of every reference `Fft` object being `Sync + Send`
    (lib.rs:184, examples/concurrency.rs:1-30); here immutability plus JAX's
    pure-functional execution provides the same guarantee for free.
    """

    def __init__(
        self,
        recipe: recipes.Recipe,
        direction: FftDirection,
        dtype,
        pinned: bool = False,
    ):
        self._recipe = recipe
        self._direction = direction
        self._dtype = canonical_complex_dtype(dtype)
        self._real_dtype = np.dtype(
            np.float32 if self._dtype == np.complex64 else np.float64
        )
        if self._dtype == np.complex128 and not jax.config.jax_enable_x64:
            import warnings

            warnings.warn(
                "complex128 FFT plan created without jax_enable_x64: JAX will "
                "truncate to complex64. Run "
                "jax.config.update('jax_enable_x64', True) for f64 parity.",
                stacklevel=3,
            )
        # The compute path works on complex-pair tuples (re, im) of real
        # arrays — the TPU runtime has no complex dtypes (ops/calg.py).
        # pinned=True (hand-built algorithm.py constructors) executes the
        # literal recipe decomposition — no fused-kernel substitution.
        self._raw_fn = executor.build(
            recipe, direction, self._dtype, allow_fused=not pinned
        )
        # One jitted entry; jax caches compiled executables per input shape,
        # which is the analogue of the reference FftCache keyed by length
        # (fft_cache.rs:5-39) extended with the batch-shape class.
        self._jit_fn = jax.jit(self._raw_fn)

    # -- Length / Direction traits (lib.rs:140-143, 174-177) --
    @property
    def recipe(self) -> recipes.Recipe:
        return self._recipe

    def __len__(self) -> int:
        return self._recipe.length

    @property
    def length(self) -> int:
        return self._recipe.length

    def fft_direction(self) -> FftDirection:
        return self._direction

    @property
    def direction(self) -> FftDirection:
        return self._direction

    @property
    def dtype(self) -> np.dtype:
        return self._dtype

    # -- process family (lib.rs:184-278) --
    def process(self, buffer: Any):
        """Compute FFTs over `buffer`, returning a new array.

        `buffer` may be any array whose last dimension is a multiple of
        `len(self)`; each length-`len` chunk is transformed independently
        (reference batching contract, lib.rs:200-209).  Output is ascending
        frequency order, DC first, unnormalized (lib.rs:81-89).

        JAX arrays stay on device end to end (split/combine of the complex
        pair happens in jitted device ops); any other input goes through
        numpy on the host.
        """
        if self._dtype == np.complex128 and not jax.config.jax_enable_x64:
            raise RuntimeError(
                "complex128 FFT plan processed without jax_enable_x64: JAX "
                "would silently truncate to complex64. Run "
                "jax.config.update('jax_enable_x64', True) first."
            )
        on_device = isinstance(buffer, jax.Array)
        x = buffer if on_device else np.asarray(buffer)
        n = self._recipe.length
        if x.ndim == 0:
            raise FftBufferError("FFT input must have at least one dimension")
        chunks = validate_buffer_len(x.shape[-1], n)
        shape = x.shape
        if on_device:
            x = x.astype(self._dtype)
            if n <= 1 or shape[-1] == 0:
                return x
            if shape[-1] != n:
                x = x.reshape(shape[:-1] + (chunks, n))
            re, im = self.process_pair(jnp.real(x), jnp.imag(x))
            return jax.lax.complex(re, im).reshape(shape).astype(self._dtype)
        x = x.astype(self._dtype)
        if n <= 1 or shape[-1] == 0:
            return x
        if shape[-1] != n:
            x = x.reshape(shape[:-1] + (chunks, n))
        re, im = self.process_pair(
            x.real.astype(self._real_dtype), x.imag.astype(self._real_dtype)
        )
        out = np.asarray(re).astype(self._real_dtype) + 1j * np.asarray(im)
        return out.reshape(shape).astype(self._dtype)

    def process_pair(self, re, im):
        """Device-level entry: (re, im) real arrays of shape (..., len).

        This is the jitted, jit-composable compute path — complex splitting
        happens at the host boundary in `process`; TPU programs should call
        this (or `raw_fn`) directly with real tensors.
        """
        return self._jit_fn((jnp.asarray(re), jnp.asarray(im)))

    @property
    def raw_fn(self):
        """The traced pair function Cplx -> Cplx, for composition under jit."""
        return self._raw_fn

    def __call__(self, buffer: Any):
        return self.process(buffer)

    def process_with_scratch(self, buffer: Any, scratch: Any = None):
        """API parity with lib.rs:214-226; scratch is ignored (XLA owns buffers)."""
        return self.process(buffer)

    def process_outofplace_with_scratch(self, input: Any, output: Any = None, scratch: Any = None):
        """API parity with lib.rs:231-242; returns the output instead of writing it."""
        return self.process(input)

    def process_immutable_with_scratch(self, input: Any, output: Any = None, scratch: Any = None):
        """API parity with lib.rs:250-259 (input untouched — always true here)."""
        return self.process(input)

    # -- scratch queries (lib.rs:262-277): functional runtime needs none --
    def get_inplace_scratch_len(self) -> int:
        return 0

    def get_outofplace_scratch_len(self) -> int:
        return 0

    def get_immutable_scratch_len(self) -> int:
        return 0

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return (
            f"FftPlan(len={self._recipe.length}, direction={self._direction.name}, "
            f"dtype={self._dtype}, recipe={type(self._recipe).__name__})"
        )
