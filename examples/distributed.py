"""Multi-chip FFT: batch sharding and the distributed six-step.

New TPU-first capability (the reference is single-node; SURVEY.md §2.5).
Runs on any device mesh; this demo uses 8 virtual CPU devices so it works
anywhere (`XLA_FLAGS=--xla_force_host_platform_device_count=8`).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The demo needs 8 devices; force the CPU backend (8 virtual devices) unless
# real multi-chip TPU hardware is present.  Must happen before any
# computation — some TPU runtime plugins override JAX_PLATFORMS from env.
if os.environ.get("RUSTFFT_TPU_DISTRIBUTED_REAL") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from rustfft_tpu import FftDirection, FftPlanner  # noqa: E402
from rustfft_tpu.parallel import make_batch_sharded_fft, make_distributed_fft, make_mesh  # noqa: E402


def main():
    devices = jax.devices()[:8]
    mesh = make_mesh((2, 4), ("data", "fft"), devices)
    rng = np.random.default_rng(0)

    # 1. batch sharding: independent FFTs data-parallel over 'data'+'fft'
    plan = FftPlanner().plan_fft_forward(1024)
    batch_fft = make_batch_sharded_fft(plan, mesh, batch_axis="data")
    re = rng.standard_normal((16, 1024)).astype(np.float32)
    im = rng.standard_normal((16, 1024)).astype(np.float32)
    out = batch_fft((re, im))
    print("batch-sharded output:", out[0].shape, out[0].sharding)

    # 2. one huge transform sharded over 'fft': the three six-step transposes
    #    run as jax.lax.all_to_all over ICI
    n = 256 * 256
    dist = make_distributed_fft(n, FftDirection.FORWARD, np.complex64, mesh)
    re = rng.standard_normal((2, n)).astype(np.float32)
    im = rng.standard_normal((2, n)).astype(np.float32)
    fr, fi = dist((re, im))
    expected = np.fft.fft(re + 1j * im, axis=-1)
    err = np.mean(np.abs((np.asarray(fr) + 1j * np.asarray(fi)) - expected))
    print(f"distributed n={n}: mean err = {err:.2e}")


if __name__ == "__main__":
    main()
