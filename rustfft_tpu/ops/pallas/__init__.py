"""Pallas TPU kernels: fused hot paths for the FFT compute tier.

These are the TPU counterpart of the reference's hand-written SIMD kernel
backends (src/avx/, src/sse/, src/neon/, src/wasm_simd/ — SURVEY.md §2.4):
where the reference keeps whole transforms in vector registers, these keep
whole transforms in VMEM, with the MXU doing the small-DFT stages and a
single HBM read+write per transform.
"""
from .fused import make_fused_two_stage_fn, fused_supported  # noqa: F401
