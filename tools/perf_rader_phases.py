"""Per-phase timing of the 65537 Rader route (VERDICT r3 item 7).

The route (conv.make_raders_fn, rader_gather="kernel") is: XLA sum(x) ->
radix conv core pass 1 (fused in-perm + H multiply) -> pass 2 (fused
out-perm + conj) -> XLA +x0 add + concat.  Same-run rows isolate each
phase so the remaining gap to the ~3055 GF/s roofline is attributed:

  plan            the full planner route end-to-end
  core noperm     radix conv core alone (no Benes phases)
  core inperm     + fused input permutation only
  core bothperm   + both permutations (the shipped core)
  benes alone     one standalone Benes permutation kernel (m points)
  xla take        one plain jnp.take gather pair (the 'lane' strategy)
  epilogue        sum + add + concat measured as plan - core(both)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_rader_phases.py [p ...]
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from rustfft_tpu import FftDirection, FftPlanner
    from rustfft_tpu.config import config, enable_persistent_compilation_cache
    from rustfft_tpu.ops.raders import raders_tables
    from rustfft_tpu.ops.pallas import conv_radix, permute
    from rustfft_tpu.ops import calg

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    primes = [int(a) for a in sys.argv[1:]] or [65537]
    for p in primes:
        m = p - 1
        batch = max(8, min(4096, (1 << 25) // p))
        re = jax.device_put(
            (rng.standard_normal((batch, p)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, p)) * 1e-30).astype(np.float32)
        )
        re_m = jax.device_put(np.ascontiguousarray(np.asarray(re)[:, :m]))
        im_m = jax.device_put(np.ascontiguousarray(np.asarray(im)[:, :m]))
        gf = lambda t: 5.0 * batch * p * math.log2(p) / t / 1e9  # noqa: E731
        ms = lambda t: t * 1e3  # noqa: E731
        print(f"p={p} m={m} batch={batch}", flush=True)

        perm_in, inv_gather, b_fft = raders_tables(p, d)
        rows = {}

        # full route (config default: rader_full_out=True fuses the final
        # DC concat into pass 2); the "concat epi" row is the same plan
        # with the flag off — the round-4 shipped epilogue
        try:
            plan = FftPlanner().plan_fft_forward(p)
            t = time_fn(plan.raw_fn, re, im)
            rows["plan"] = t
            print(f"  plan           : {ms(t):8.3f} ms  {gf(t):7.1f} GF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  plan           : FAILED {str(e)[:300]}", flush=True)
        try:
            config.rader_full_out = False
            plan2 = FftPlanner().plan_fft_forward(p)
            t = time_fn(plan2.raw_fn, re, im)
            rows["plan concat"] = t
            print(f"  plan concat epi: {ms(t):8.3f} ms  {gf(t):7.1f} GF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  plan concat epi: FAILED {str(e)[:300]}", flush=True)
        finally:
            config.rader_full_out = True

        cores = [
            ("core noperm   ", dict()),
            ("core inperm   ", dict(in_perm=perm_in - 1)),
            ("core bothperm ", dict(in_perm=perm_in - 1, out_perm=inv_gather,
                                    conj_out=True)),
            ("core both x3s ", dict(in_perm=perm_in - 1, out_perm=inv_gather,
                                    conj_out=True, precision="bf16x3s")),
            ("core tb=32    ", dict(in_perm=perm_in - 1, out_perm=inv_gather,
                                    conj_out=True, batch_tile=32)),
        ]
        for label, kw in cores:
            try:
                fn = conv_radix.make_radix_conv_fn(m, d, np.complex64,
                                                   h=b_fft, **kw)
                t = time_fn(fn, re_m, im_m)
                rows[label.strip()] = t
                print(f"  {label}: {ms(t):8.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {label}: FAILED {str(e)[:300]}", flush=True)

        if permute.permute_supported(m, np.complex64):
            try:
                fn = permute.make_permute_fn(perm_in - 1)
                t = time_fn(fn, re_m, im_m)
                rows["benes"] = t
                print(f"  benes alone    : {ms(t):8.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  benes alone    : FAILED {str(e)[:300]}", flush=True)

        try:
            idx = jnp.asarray((perm_in - 1).astype(np.int32))

            def take_fn(x):
                return calg.take(x, idx, axis=-1)

            t = time_fn(take_fn, re_m, im_m)
            rows["take"] = t
            print(f"  xla take       : {ms(t):8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  xla take       : FAILED {str(e)[:300]}", flush=True)

        if "plan" in rows and "core bothperm" in rows:
            epi = rows["plan"] - rows["core bothperm"]
            print(f"  epilogue (plan - core) ~ {ms(epi):8.3f} ms", flush=True)
        if "core bothperm" in rows and "core noperm" in rows:
            dp = rows["core bothperm"] - rows["core noperm"]
            print(f"  fused perms cost ~ {ms(dp):8.3f} ms", flush=True)
        # stream-bound floor for the core's 4 traversals of m
        # (printed for the reader; uses a nominal 600 GB/s — scale by the
        # same-run stream number from bench.py when comparing)
        floor = 4 * batch * m * 8 / 600e9
        print(f"  4-traversal floor @600GB/s ~ {ms(floor):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
