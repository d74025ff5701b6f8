"""rustfft_tpu — a TPU-native FFT framework with RustFFT's capabilities.

Built from scratch in JAX/XLA/Pallas.  The public API mirrors the reference
(ejmahler/RustFFT, src/lib.rs): planners with `plan_fft_forward/inverse(n)`
for any n >= 0 (including primes and zero), complex64 and complex128,
unnormalized, ascending-frequency output, batched leading dimensions, plan
reuse via caching.  The mechanisms are TPU-first: recipes are pure data
lowered into one jittable XLA program whose small-DFT stages run as MXU
matmuls, with Pallas kernels for fused hot paths and jax.sharding for
multi-chip scaling.

Example (reference: src/lib.rs README example, plan.rs:247-256)::

    import numpy as np
    from rustfft_tpu import FftPlanner

    planner = FftPlanner()
    fft = planner.plan_fft_forward(1234)
    buffer = np.zeros(1234, dtype=np.complex64)
    spectrum = fft.process(buffer)
"""

from .common import (  # noqa: F401
    FftBufferError,
    FftDirection,
    Forward,
    Inverse,
)
from .config import (  # noqa: F401
    FftConfig,
    config,
    enable_persistent_compilation_cache,
)
from .plan import FftPlan  # noqa: F401
from .planner import (  # noqa: F401
    FftCache,
    FftPlanner,
    FftPlannerScalar,
    FftPlannerTpu,
)
from . import algorithm, math_utils, recipes, twiddles  # noqa: F401

__version__ = "0.1.0"

__all__ = [
    "FftBufferError",
    "FftDirection",
    "Forward",
    "Inverse",
    "FftConfig",
    "config",
    "enable_persistent_compilation_cache",
    "FftPlan",
    "FftCache",
    "FftPlanner",
    "FftPlannerScalar",
    "FftPlannerTpu",
    "algorithm",
    "math_utils",
    "recipes",
    "twiddles",
    "__version__",
]
