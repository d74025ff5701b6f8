"""Global configuration for the TPU compute path.

The reference exposes Cargo feature flags + runtime CPU detection
(Cargo.toml:16-33, plan.rs:72-94); the TPU analogue is a small options object:
matmul precision (how XLA decomposes f32 matmuls onto the bf16 MXU) and
kernel-selection thresholds for the TPU planner cost model.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax


@dataclass
class FftConfig:
    #: Precision for DFT-matrix matmuls and twiddle contractions.  HIGHEST
    #: makes XLA run f32 matmuls as 6-pass bf16 (full f32 accuracy) on the
    #: MXU; DEFAULT trades accuracy for ~3x matmul throughput.
    matmul_precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    #: TPU planner: sizes <= this threshold run as one dense DFT-matrix matmul
    #: on the MXU instead of being decomposed.  Tuned on v5e: a single fused
    #: matmul pass beats multi-stage decompositions up to a few hundred points.
    dense_dft_max: int = 256

    #: TPU planner: preferred radix for power-of-two chains (MXU-friendly
    #: contraction size).
    pow2_radix: int = 16

    #: Use the native C++ plancore (number theory + recipe design) when its
    #: shared library is available; pure-Python fallback otherwise.
    use_native: bool = True

    #: Use fused Pallas kernels on TPU backends ("auto"), always ("on"), or
    #: never ("off" — pure-XLA path, also the CPU path).
    use_pallas: str = "auto"


#: Module-level config; mutate fields or swap wholesale to retune.
config = FftConfig()
