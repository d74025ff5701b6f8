"""TPU compute kernels for FFT stages.

Each module lowers one reference algorithm family to idiomatic XLA/JAX
(matmuls on the MXU, elementwise twiddles on the VPU, gathers for the
number-theoretic permutations).  Fused Pallas variants live in ops/pallas/.
"""
from . import ct, dft, good_thomas, raders, bluestein  # noqa: F401
