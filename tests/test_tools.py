"""Perf-tool bitrot guard: every tools/ script must parse and import its
module-level dependencies (the hardware session scripts chain them blind —
a NameError at import time would silently burn a tunnel window)."""
import ast
import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
SCRIPTS = sorted(
    f for f in os.listdir(TOOLS) if f.endswith(".py")
)


@pytest.mark.parametrize("script", SCRIPTS)
def test_tool_parses(script):
    src = open(os.path.join(TOOLS, script)).read()
    ast.parse(src)


def test_tool_factory_names_exist():
    """The factory/chooser names the hardware sweeps call must exist with
    the signatures they use (keyword args checked by inspect)."""
    import inspect

    import numpy as np

    from rustfft_tpu.ops.pallas import (
        conv, conv_radix, dense, fused, lanepack, large, large2f, large3,
        largepad, permute,
    )

    sig = inspect.signature(large3.make_large3_fft_fn)
    assert "factored" in sig.parameters
    sig = inspect.signature(fused.make_fused_radix_fn)
    assert "variant" in sig.parameters
    sig = inspect.signature(conv.make_bluestein_fn)
    assert "batch_tile" in sig.parameters
    sig = inspect.signature(conv_radix.make_radix_conv_fn)
    for k in ("in_perm", "out_perm", "precision", "batch_tile"):
        assert k in sig.parameters
    sig = inspect.signature(dense.make_dense_fft_fn)
    for k in ("variant", "batch_tile", "pack", "aligned"):
        assert k in sig.parameters
    sig = inspect.signature(lanepack.make_lanepack_fn)
    for k in ("radices", "group", "precision"):
        assert k in sig.parameters
    assert callable(permute.make_permute_fn)
    assert callable(large2f.make_large2f_fft_fn)
    assert callable(large.make_large_fft_fn)
    assert callable(largepad.make_largepad_fft_fn)
    assert large3.choose_split3f(1 << 26) is not None
