"""Basic usage — the reference README example (rustfft README.md:14-27).

Computes a forward FFT of size 1234 via the planner.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rustfft_tpu import FftPlanner


def main():
    planner = FftPlanner()
    fft = planner.plan_fft_forward(1234)

    buffer = np.zeros(1234, dtype=np.complex64)
    buffer[0] = 1.0  # impulse -> flat spectrum
    spectrum = fft.process(buffer)
    print("spectrum[:4] =", np.asarray(spectrum)[:4])

    # batched: any buffer of k * len elements is processed as k chunks
    # (reference batching contract, lib.rs:200-209)
    batch = np.random.default_rng(0).standard_normal((8, 1234)).astype(np.complex64)
    out = fft.process(batch)
    print("batch output shape:", np.asarray(out).shape)

    # unnormalized: forward then inverse scales by n (lib.rs:81-86)
    inverse = planner.plan_fft_inverse(1234)
    roundtrip = np.asarray(inverse.process(fft.process(batch))) / 1234
    print("roundtrip max err:", np.abs(roundtrip - batch).max())


if __name__ == "__main__":
    main()
