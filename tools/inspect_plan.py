"""Inspect a plan: recipe tree, jaxpr, and compiled HLO for one size.

The analogue of the reference's examples/asmtest.rs workflow (build one FFT,
inspect the emitted code, asmtest.rs:1-14).

Usage: python tools/inspect_plan.py N [--direction inverse] [--hlo] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def describe(recipe, indent=0) -> str:
    from rustfft_tpu import recipes

    pad = "  " * indent
    name = type(recipe).__name__
    if isinstance(recipe, (recipes.Dft, recipes.Butterfly)):
        return f"{pad}{name}({recipe.length})"
    if isinstance(recipe, recipes.Radix4):
        return f"{pad}Radix4(k={recipe.k}, len={recipe.length})\n" + describe(
            recipe.base, indent + 1
        )
    if isinstance(recipe, recipes.RadixN):
        return (
            f"{pad}RadixN(factors={recipe.factors}, len={recipe.length})\n"
            + describe(recipe.base, indent + 1)
        )
    if hasattr(recipe, "left"):
        return (
            f"{pad}{name}(len={recipe.length})\n"
            + describe(recipe.left, indent + 1)
            + "\n"
            + describe(recipe.right, indent + 1)
        )
    if hasattr(recipe, "inner"):
        return f"{pad}{name}(len={recipe.length})\n" + describe(
            recipe.inner, indent + 1
        )
    return f"{pad}{name}(len={recipe.length})"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int)
    ap.add_argument("--direction", default="forward")
    ap.add_argument("--hlo", action="store_true", help="print optimized HLO")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--scalar", action="store_true", help="use FftPlannerScalar")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from rustfft_tpu import FftPlanner, FftPlannerScalar

    planner = FftPlannerScalar() if args.scalar else FftPlanner()
    plan = (
        planner.plan_fft_forward(args.n)
        if args.direction == "forward"
        else planner.plan_fft_inverse(args.n)
    )
    from rustfft_tpu import executor

    print("=== recipe ===")
    print(describe(plan.recipe))
    route = executor.pallas_route(args.n, plan.dtype)
    print(f"pallas route: {route or 'none (XLA recipe tree)'}")

    re = np.zeros((1, args.n), dtype=np.float32)
    print("\n=== jaxpr ===")
    print(jax.make_jaxpr(plan.raw_fn)((re, re)))

    if args.hlo:
        print("\n=== optimized HLO ===")
        lowered = jax.jit(plan.raw_fn).lower((re, re))
        print(lowered.compile().as_text())


if __name__ == "__main__":
    main()
