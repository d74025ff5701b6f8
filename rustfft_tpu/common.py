"""Core enums, dtype helpers, and validation errors.

TPU-native re-design of the reference public-API layer
(reference: src/lib.rs:140-278, src/common.rs:11-104).  Instead of an `Fft<T>`
trait with panic-formatting helpers, we expose a small set of Python types; the
"trait object" becomes a functional plan object (see plan.py).
"""
from __future__ import annotations

import enum

import numpy as np


class FftDirection(enum.Enum):
    """Transform direction (reference: src/lib.rs:146-171).

    Forward uses twiddles e^(-2*pi*i*jk/n); Inverse conjugates them.
    Neither direction normalizes: a forward+inverse roundtrip scales by n
    (reference: src/lib.rs:81-86).
    """

    FORWARD = "forward"
    INVERSE = "inverse"

    def opposite(self) -> "FftDirection":
        """reference: src/lib.rs:164-170 (`opposite_direction`)."""
        return (
            FftDirection.INVERSE
            if self is FftDirection.FORWARD
            else FftDirection.FORWARD
        )

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"FftDirection.{self.name}"


# Aliases matching the reference naming.
Forward = FftDirection.FORWARD
Inverse = FftDirection.INVERSE


#: Supported complex dtypes.  c64 (f32 pairs) is the TPU-native fast path;
#: c128 (f64 pairs) is supported for capability parity with the reference's
#: f64 support (reference: src/common.rs:5-7) but f64 is emulated on TPU, so
#: it is primarily exercised on the CPU backend.
COMPLEX_DTYPES = (np.complex64, np.complex128)


def real_dtype(dtype) -> np.dtype:
    return np.dtype(np.float32) if np.dtype(dtype) == np.complex64 else np.dtype(np.float64)


def canonical_complex_dtype(dtype) -> np.dtype:
    d = np.dtype(dtype)
    if d == np.complex64 or d == np.complex128:
        return d
    if d == np.float32:
        return np.dtype(np.complex64)
    if d == np.float64:
        return np.dtype(np.complex128)
    raise ValueError(
        f"Unsupported dtype {dtype!r}: expected complex64/complex128 (or "
        f"float32/float64 as shorthand for the matching complex type)"
    )


class FftBufferError(ValueError):
    """Buffer/scratch misuse errors.

    The reference panics with formatted messages for misuse
    (reference: src/common.rs:11-104); in Python we raise instead.
    """


def validate_buffer_len(buffer_len: int, fft_len: int) -> int:
    """Check RustFFT's batching contract and return the chunk count.

    Any buffer whose length is a multiple of ``fft_len`` is processed as
    independent chunks (reference: src/lib.rs:195-211, src/fft_helper.rs:9-28).
    A zero-length FFT accepts only an empty buffer.
    """
    if fft_len == 0:
        if buffer_len != 0:
            raise FftBufferError(
                f"A zero-length FFT can only process an empty buffer, got "
                f"buffer of length {buffer_len}"
            )
        return 0
    if buffer_len % fft_len != 0:
        raise FftBufferError(
            f"Buffer length {buffer_len} is not a multiple of FFT length {fft_len}"
        )
    return buffer_len // fft_len
