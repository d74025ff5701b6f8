"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

New TPU-first capability (the reference is single-node, SURVEY.md §2.5):
batch sharding of the implicit-batching contract, and the distributed
six-step whose transposes are all_to_all collectives.
"""
import jax
import numpy as np
import pytest

from rustfft_tpu import FftDirection, FftPlanner
from rustfft_tpu.parallel import (
    choose_split,
    make_batch_sharded_fft,
    make_distributed_fft,
    make_mesh,
)
from rustfft_tpu.parallel.mesh import split_devices_2d
from rustfft_tpu.utils.testing import mean_element_error, oracle_dft, random_signal


def _pair(x):
    return np.ascontiguousarray(x.real), np.ascontiguousarray(x.imag)


def _join(pair):
    return np.asarray(pair[0]) + 1j * np.asarray(pair[1])


@pytest.fixture(scope="module")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    return devs[:8]


def test_split_devices_2d():
    assert split_devices_2d(8) == (4, 2)
    assert split_devices_2d(4) == (2, 2)
    assert split_devices_2d(1) == (1, 1)


def test_choose_split():
    p, q = choose_split(1 << 20, 4)
    assert p * q == 1 << 20 and p % 4 == 0 and q % 4 == 0
    p, q = choose_split(2304, 8)  # 2^8 * 3^2
    assert p * q == 2304 and p % 8 == 0 and q % 8 == 0
    with pytest.raises(ValueError):
        choose_split(17 * 19, 8)


@pytest.mark.parametrize("direction", [FftDirection.FORWARD, FftDirection.INVERSE])
def test_distributed_fft_2d_mesh(devices8, direction):
    mesh = make_mesh((2, 4), ("data", "fft"), devices8)
    n = 256
    fn = make_distributed_fft(n, direction, np.complex64, mesh)
    x = random_signal(4 * n, seed=5).reshape(4, n)
    out = _join(fn(_pair(x)))
    err = mean_element_error(out, oracle_dft(x, direction))
    assert err < 1e-3, err


def test_distributed_fft_full_fft_axis(devices8):
    mesh = make_mesh((1, 8), ("data", "fft"), devices8)
    n = 1024
    fn = make_distributed_fft(n, FftDirection.FORWARD, np.complex64, mesh)
    x = random_signal(2 * n, seed=6).reshape(2, n)
    out = _join(fn(_pair(x)))
    assert mean_element_error(out, oracle_dft(x, FftDirection.FORWARD)) < 1e-3


def test_distributed_matches_single_chip_plan(devices8):
    mesh = make_mesh((1, 4), ("data", "fft"), devices8[:4])
    n = 2304  # 2^8 * 3^2: non-pow2 composite
    fn = make_distributed_fft(n, FftDirection.FORWARD, np.complex64, mesh)
    x = random_signal(2 * n, seed=8).reshape(2, n)
    dist = _join(fn(_pair(x)))
    single = np.asarray(FftPlanner().plan_fft_forward(n).process(x))
    assert mean_element_error(dist, single) < 1e-3


def test_batch_sharded_fft(devices8):
    mesh = make_mesh((8,), ("data",), devices8)
    plan = FftPlanner().plan_fft_forward(128)
    fn = make_batch_sharded_fft(plan, mesh)
    x = random_signal(8 * 128, seed=7).reshape(8, 128)
    out = _join(fn(_pair(x)))
    assert mean_element_error(out, oracle_dft(x, FftDirection.FORWARD)) < 1e-3


def test_distributed_roundtrip(devices8):
    mesh = make_mesh((2, 4), ("data", "fft"), devices8)
    n = 512
    fwd = make_distributed_fft(n, FftDirection.FORWARD, np.complex64, mesh)
    inv = make_distributed_fft(n, FftDirection.INVERSE, np.complex64, mesh)
    x = random_signal(2 * n, seed=9).reshape(2, n)
    out = _join(inv(fwd(_pair(x)))) / n
    assert mean_element_error(out, x) < 1e-4


def test_distributed_fft_replicated_batch(devices8):
    """batch_axis=None replicates the batch; only the fft axis is sharded."""
    mesh = make_mesh((1, 4), ("data", "fft"), devices8[:4])
    n = 256
    fn = make_distributed_fft(
        n, FftDirection.FORWARD, np.complex64, mesh, batch_axis=None
    )
    x = random_signal(3 * n, seed=11).reshape(3, n)
    out = _join(fn(_pair(x)))
    assert mean_element_error(out, oracle_dft(x, FftDirection.FORWARD)) < 1e-3


def test_distributed_fft_c128(devices8):
    """The sharded six-step carries f64 pairs for c128 plans (twiddles and
    shard-local FFTs at double precision; conftest enables x64)."""
    mesh = make_mesh((2, 4), ("data", "fft"), devices8)
    n = 512
    fn = make_distributed_fft(n, FftDirection.FORWARD, np.complex128, mesh)
    x = random_signal(2 * n, dtype=np.complex128, seed=12).reshape(2, n)
    out = _join(fn(_pair(x)))
    err = mean_element_error(out, oracle_dft(x, FftDirection.FORWARD))
    assert err < 1e-8, err


def test_distributed_fft_large_local_recipes(devices8):
    """Flagship-like shape scaled down (VERDICT r2 #7): n = 2^16 over the
    (4, 2) mesh with the batch axis sharded simultaneously — each device's
    local FFTs go through NONTRIVIAL planner recipes, and the three
    all_to_all transposes run at a realistic (w, h) split.  Oracle = numpy
    pocketfft (the O(n^2) dft oracle is too slow at this n)."""
    mesh = make_mesh((4, 2), ("data", "fft"), devices8)
    n = 1 << 16
    fn = make_distributed_fft(n, FftDirection.FORWARD, np.complex64, mesh)
    x = random_signal(8 * n, seed=13).reshape(8, n)
    out = _join(fn(_pair(x)))
    want = np.fft.fft(x, axis=-1)
    err = np.mean(np.abs(out - want)) / np.mean(np.abs(want))
    assert err < 1e-4, err
