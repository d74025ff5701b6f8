"""Plans are immutable and shareable across threads.

Port of reference examples/concurrency.rs:1-30: one planned FFT used from
many threads simultaneously.  Reference plans are `Sync + Send`; here plans
are immutable after construction and JAX dispatch is thread-safe, so the
same plan object can be processed concurrently without locks.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import threading

import numpy as np

from rustfft_tpu import FftPlanner


def main():
    fft = FftPlanner().plan_fft_forward(100)
    rng = np.random.default_rng(0)
    inputs = [
        (rng.standard_normal(100) + 1j * rng.standard_normal(100)).astype(
            np.complex64
        )
        for _ in range(4)
    ]
    outputs = [None] * 4

    def worker(i):
        outputs[i] = np.asarray(fft.process(inputs[i]))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for i, out in enumerate(outputs):
        expected = np.fft.fft(inputs[i])
        print(f"thread {i}: err = {np.mean(np.abs(out - expected)):.2e}")


if __name__ == "__main__":
    main()
