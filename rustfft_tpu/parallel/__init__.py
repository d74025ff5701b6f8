"""Multi-chip scaling for FFTs over a jax.sharding.Mesh.

The reference has no distributed layer at all (SURVEY.md §2.5: no threads, no
NCCL/MPI — parallelism is SIMD lanes + implicit batching, lib.rs:200-209).
This package is therefore new TPU-first design, not a port:

* batch sharding — the reference's implicit batching contract, scaled across
  chips over ICI (embarrassingly parallel),
* distributed six-step — the MixedRadix six-step decomposition
  (mixed_radix.rs:128-158) is exactly the decomposition that distributes: its
  three transposes become `jax.lax.all_to_all` collectives over the mesh.
"""
from .sharded import (  # noqa: F401
    make_batch_sharded_fft,
    make_distributed_fft,
    choose_split,
)
from .mesh import make_mesh  # noqa: F401
