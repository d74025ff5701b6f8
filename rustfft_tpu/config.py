"""Global configuration for the TPU compute path.

The reference exposes Cargo feature flags + runtime CPU detection
(Cargo.toml:16-33, plan.rs:72-94); the TPU analogue is a small options object:
matmul precision (how XLA decomposes f32 matmuls onto the bf16 MXU) and
kernel-selection thresholds for the TPU planner cost model.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

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

    #: Use fused Pallas kernels on TPU backends ("auto"), always ("on" —
    #: interpret mode off-TPU, for testing), or never ("off" — pure-XLA path,
    #: also the CPU path).
    use_pallas: str = "auto"

    #: Smallest transform the Pallas kernel tier takes over from the XLA
    #: path ("auto" mode).  Below this, a single dense-DFT matmul that XLA
    #: fuses with neighboring ops wins over a separate kernel launch
    #: (measured crossover on v5e: lanepack beats XLA from ~512 up).
    pallas_min_n: int = 512

    #: Dense whole-DFT matmul kernel (ops/pallas/dense.py) band: sizes in
    #: [dense_min_n, dense_max_n] route dense — one MXU GEMM per batch
    #: tile, any length — when dense.pad_worth_it(n) passes (lane-pad
    #: ratio <= 1.25, or a prime factor > 32 so the XLA alternative is a
    #: slow Rader/Bluestein tree).  Round-4 boundary sweep
    #: (tools/perf_small.py, differential timer, same-run): dense wins 125
    #: (617 vs XLA 514), 128 (648 vs 575), 243-768 (1.3-2.7x); XLA keeps
    #: 96/100 (680 vs ~470) and the high-pad 144/160 (427/446 vs 324/365);
    #: lanepack keeps 1000+ (1024: 572 vs dense 393).
    dense_min_n: int = 125
    dense_max_n: int = 768

    #: Largest transform routed to the dense kernel when NO other Pallas
    #: tier serves it (primes, misaligned smalls the factored tiers skip).
    #: Round-4 sweep: 1009 dense 349 vs conv-route 106, 1234: 316 vs 99,
    #: 2003: 210 vs 147 GF/s — 1.4-3.3x wins across the measured band.
    dense_fallback_max_n: int = 2048

    #: Largest transform routed to the batch-in-lanes kernel
    #: (ops/pallas/lanepack.py) when a lane-aligned fused split also exists;
    #: misaligned sizes use lanepack as far as its VMEM bound allows.
    #: Measured on v5e: under bf16x3 lanepack won to 2048 and two-stage won
    #: at 4096; under the bf16x3s cat tier (round-4 hardware sweep,
    #: tools/perf_cat.py) lanepack wins at 4096 too (538 vs 470 GF/s,
    #: same-run adjacent rows).
    lanepack_max_n: int = 4096

    #: Radix conv core (conv_radix.py) stage GEMMs: False = (2p, 2p)
    #: block-form complex dots; True = Gauss 3-dot form (25% less MXU work
    #: per stage — the same switch that won +2-17% in the standalone
    #: two_stage/radix kernels, commit 1543b83).
    conv_radix_gauss: bool = False

    #: Rader whole-input mode (requires rader_full_out): pass 1 of the
    #: radix conv core reads the RAW (batch, p) prime-length signal and
    #: lane-rolls it in-VMEM, replacing the XLA x[1:] slice (~0.8 ms at
    #: (512, 65537)) and keeping every chain array (batch, p) wide so both
    #: passes alias their flat views (full_out alone breaks pass-2
    #: aliasing: m -> m+1).
    rader_in_shift: bool = False

    #: Lanepack I/O description: "block" = (g*128, n) batch-tile blocks;
    #: "flat" = whole (tb, 65536)-class rows packing 65536/n transforms per
    #: row, unpacked/repacked in VMEM via lane-slice stacks (the round-5
    #: flat-view DMA rule that took the radix band 1.6-2x — CLAUDE.md).
    #: "flat" needs n % 128 == 0 and falls back to "block" otherwise.
    #: MEASURED NEGATIVE on v5e (tools/perf_lpx.py 2026-08-19, same-run):
    #: flat loses 26-34% at every size even with per-group slot stacks
    #: replacing the block ref read (512: 382 vs 582; 1024: 408 vs 623;
    #: 2048: 442 vs 629; 4096: 457/465-aliased vs 623) — the small band is
    #: op-count-bound and the sw-way unpack/repack slicing costs more VPU
    #: time than the wide-row DMA saves.  Kept as an opt-in measurement
    #: variant; "block" stays the default.
    lanepack_variant: str = "block"

    #: Smallest transform routed to the three-stage fused kernel when its
    #: (p, q1, q2) split exists.  Measured on v5e: the kernel is MXU-PASS
    #: bound, not flop bound — the small-factor stages (K = q1 < 128) waste
    #: the systolic array, so 3-stage loses to 2-stage at 16k..131k (497 vs
    #: 858 GF/s at 16k) and to the large pipeline at 262k (560 vs 621).
    #: Disabled by default; the kernel stays available for explicit use.
    three_stage_min_n: int = 1 << 40

    #: Smallest transform routed to the two-kernel large pipeline even when
    #: a single-kernel fused split exists.  Measured on v5e: the radix-r
    #: fused kernel (use_radix_fused) wins to 262144 (746 vs large 609
    #: GF/s); at 524288 the large pipeline wins (751 vs radix-r 528).
    large_min_n: int = 524288

    #: Route n = r*128*128 (r a power of two in [2, 16]) to the radix-r
    #: fused kernel: both dense DFT stages as K=128 MXU contractions, the
    #: radix-r cross-stage as a recursive radix-2 chain on the VPU — one
    #: HBM pass with 2-4x fewer MXU flops than the two-stage split.
    #: Measured on v5e: 852/946/792/746 GF/s at 32k/65k/131k/262k vs
    #: 774/696/467/390 for the two-stage kernel (same run).
    use_radix_fused: bool = True

    #: Smallest transform routed to the FUSED two-kernel pipeline
    #: (ops/pallas/large2f.py): large3's pass 2 fused into the column
    #: stage, 4 HBM traversals, factorized twiddle tables.  Measured on
    #: v5e (same run): beats large3 at 2^22 (791 vs 667), 2^23 (835 vs
    #: 689), 2^24 (858 vs 688), and runs 2^25 at 882 (large3 can't
    #: compile there); ties large2 at 2^21 (654 vs 640 — only the
    #: Q=2048 split exists), where the 2-kernel pipeline stays.
    large2f_min_n: int = 1 << 22

    #: Smallest transform routed to the three-kernel pipeline
    #: (ops/pallas/large3.py) when its split exists.  Measured on v5e:
    #: large3 beats the two-kernel pipeline at 2^22 (813 vs 678 GF/s,
    #: same run — kernel-B's Q=8192 working set is the 2-kernel
    #: bottleneck there) and ties at 2^21 (812 vs 796); below that the
    #: 2-kernel pipeline's 4 traversals win (2^20: 842 vs 723).
    large3_min_n: int = 1 << 22

    #: Smallest transform routed to the FACTORED-twiddle 3-kernel pipeline
    #: ("large3f": large3's structure + large2f's tiny factorized tables,
    #: so P2 extends past 16 and the envelope reaches 2^26 — the size
    #: where large2f's only split exhausts VMEM).  Default: only past
    #: large2f's measured 2^25 edge; lower it to A/B the factored tables
    #: at 2^22..2^24 (tools/perf_large3f.py).
    large3f_min_n: int = 1 << 26

    #: Smallest lane-misaligned composite routed to the padded-lane
    #: pipeline (ops/pallas/largepad.py).  Measured on v5e: wins at 78125
    #: (324 vs XLA 204 GF/s) but loses below (59049: 212 vs 250, 19683:
    #: 141 vs 240 — the padded blocks are too small to beat the XLA
    #: six-step there).
    largepad_min_n: int = 65536

    #: Route huge-prime Bluestein transforms whose inner m rides the large
    #: two-kernel tier through the fused 3-kernel convolution
    #: (ops/pallas/convlarge.py, ~11 traversals of m vs ~16 glued).
    #: Hardware-validated round 4 (tools/perf_bconv.py, same-run): 746497
    #: fused 159.3 vs glued 131.4 GF/s (+21%), rel err 8.6e-6.  The kernel
    #: requests its own scoped VMEM (71.6M at q=6144; cap 100M).
    use_bconv_fused: bool = True

    #: Smallest Bluestein/Rader inner length m routed to the two-kernel
    #: radix-structured convolution core (ops/pallas/conv_radix.py) instead
    #: of the dense single-kernel core.  Needs m = r*128*128, r a power of
    #: two in [2, 16].  Round-4 crossover was 65536; the round-5 flat-view
    #: conv core moved it down — at m = 32768 the radix core now beats the
    #: dense core 1.56x (15625 bconv: 8.83 vs 13.81 ms same-run,
    #: tools/perf_blue_misaligned.py 2026-08-19).
    conv_radix_min_m: int = 32768

    #: Lane-misaligned hole band (the ~8k..64k composites largepad loses
    #: at and no fused tier serves): route ODD composites through a
    #: whole-n fused Bluestein whose inner m = r*16384 rides the radix
    #: conv core, when the pad ratio m/n stays under
    #: bconv_misaligned_max_pad.  Measured v5e (same-run,
    #: tools/perf_blue_misaligned.py 2026-08-19): 15625 264.6 vs XLA
    #: 199.9, 19683 229.0 vs 204.4, 59049 307.3 vs 251.2 GF/s; recorded
    #: negatives: even 10000 loses (181.6 vs XLA 268.1 — a pow2 factor
    #: makes the XLA six-step fast), 16807 at pad 3.90 loses (155.7 vs
    #: 196.9) — hence the odd gate and the 3.5 pad cap (19683's winning
    #: 3.33 stays in).  The dense conv core loses everywhere in this band.
    bconv_misaligned: bool = True
    bconv_misaligned_min_n: int = 8192
    bconv_misaligned_max_pad: float = 3.5

    #: Describe the large two-kernel pipeline's I/O arrays 2D ((B*P, Q) /
    #: (B*Q, P)) instead of 3D — same bytes, blocks, and grids; candidate
    #: from the round-2 "2D block specs DMA ~25% faster" rule.  MEASURED
    #: NEGATIVE on v5e (tools/perf_large2d.py, same-run 2026-08-19): 2^20
    #: 497.7 vs 878.5 GF/s, 2^21 494.8 vs 819.8 — the lower-rank
    #: descriptions are ~1.7x SLOWER here (the copy-probe rule does not
    #: transfer to this pipeline's batched grids).  Kept for the record.
    large_blocks2d: bool = False

    #: Permutation gather strategy (Rader/Good-Thomas maps): "kernel"
    #: (in-VMEM 5-phase Benes permutation, ops/pallas/permute.py — the TPU
    #: analogue of RadersAvx2's in-register gathers; applies when the
    #: (X<=16, 128, 128) digit grid exists, falling back to "lane"
    #: otherwise), "lane" (plain last-axis jnp.take per f32 component),
    #: "packed" (re-interleave the pair as complex64 so each gathered
    #: element is 8 bytes — half the random-access transactions; measured
    #: ~10% faster at (512, 65536) on v5e, BUT requires complex64 compute
    #: support, which the tunneled backend dropped mid-round-3: every
    #: complex-dtype op now returns UNIMPLEMENTED, so packed would crash
    #: every Rader/GT plan.  An f64-bitcast repack was measured as a
    #: replacement and LOSES — 9.3 vs 6.7 ms for the take pair, the
    #: interleave costs a traversal), or "row" (transpose so the gather
    #: rides the major axis then transpose back — measured NO better, XLA
    #: cancels the transposes; kept as a documented negative).
    rader_gather: str = "kernel"

    #: Benes X-phase combine (ops/pallas/permute.py): "fma" = X multiplies
    #: + X-1 adds of 0/1-masked tiles; "tree" = binary tournament of X-1
    #: vector selects (mask comparisons/or-combines loop-invariant).
    #: MEASURED WASH at 65537 on v5e (fma 299.0 vs tree 297.1 GF/s,
    #: identical error, 2026-08-19): the X-phase is not the binding cost
    #: of the Benes perms — the gathers/transposes and DMA overlap are.
    permute_select: str = "fma"

    #: Fuse the final Rader epilogue concat into the conv core's pass 2:
    #: the out_perm table is rolled one position (the Benes network does
    #: the DC-first layout shift for free) and pass 2 emits the complete
    #: (batch, p) output, DC bin included — the XLA concat (measured
    #: ~1.5 ms of the 9.4 ms 65537 plan at batch 512) disappears.
    rader_full_out: bool = True

    #: MXU precision inside Pallas kernels.  "bf16x3" = manual 3-pass bf16
    #: emulation (f32-grade accuracy at half the passes of HIGHEST, which
    #: Mosaic would otherwise use; Mosaic rejects Precision.HIGH).
    #: Throughput tiers: "bf16x2" (2 passes, ~1e-4-grade — drops the
    #: x_lo@w_hi pass AND the per-tile x_lo split) and "bf16" (1 pass,
    #: ~1e-3-grade).  All clear the reference's 0.1 mean-error tolerance
    #: by orders of magnitude.  Single-dot "cat" tiers "bf16x3s"/"bf16x2s"
    #: compute the SAME terms as bf16x3/bf16x2 in ONE MXU dot over a
    #: concatenated contraction axis (identical accuracy, 1 MXU op per
    #: stage instead of 3-6 — the designed attack on the op-count-bound
    #: small-n band).  Round-4 hardware sweep (tools/perf_cat.py): bf16x3s
    #: beats bf16x3 by 40-55% across the lanepack band (512: 504 vs 325,
    #: 1024: 567 vs 357, 2048: 604 vs 408, 3888: 417 vs 300, 4096: 538 vs
    #: 358 GF/s), +8.6% at two-stage 4096, parity within noise at 16k/65k/
    #: 2^20 (812 vs 807 / 889 vs 919 / 833 vs 821) — flipped to default.
    #: Other accepted values: jax.lax.Precision.HIGHEST / .DEFAULT.
    pallas_precision: object = "bf16x3s"

    #: Radix-r fused-kernel variant.  "ctwgx" (round-5 default) = ctwg math
    #: on FLAT (batch, n) HBM views: the round-5 DMA sweep found only the
    #: whole-transform-row view rides the fast DMA class (330 GB/s unaliased
    #: / 660 aliased vs ~218 for every tiled description), and the in-VMEM
    #: digit relayouts (p-way lane-slice stack in, per-k2 slice-stores out)
    #: are ~free.  Same-run v5e A/B vs ctwg (tools/perf_ctwgn.py):
    #: 32768: 959 -> 1289 (2150 aliased); 65536: 1003 -> 1302 (2086);
    #: 131072: 830 -> 1284 (2053 aliased) GF/s.  "ctwg" = the round-4
    #: tiled-view default (merged twiddle + per-c twiddle-folded stage-B
    #: weights + Gauss 3-mult GEMMs; 32768: 960 vs 910; 65536: 1006 vs 961;
    #: 131072: 836 vs 826; 262144: 790 vs 782 vs ctw).  Other values:
    #: "ctwgn" (narrow (.,128) views: 737 at 65536 — recorded negative),
    #: "default", "ctw", "wlhs_b" (2.5x SLOWER).
    radix_variant: str = "ctwgx"

    #: Two-stage fused-kernel variant.  "gauss" (default): 4096: 492 vs
    #: 483; 8192: 603 vs 591; 16384: 940 vs 846; 65536: 825 vs 708 GF/s
    #: (same-run x3s, tools/perf_ctw.py).  Other values: None/"default",
    #: "twodot", "wlhs", "transpose_in_kernel", "transpose_outside".
    two_stage_variant: Optional[str] = "gauss"

    #: Gauss 3-multiplication dots in the large two-kernel pipeline
    #: (kernel A's dense DFT_P + kernel B's two sublane stages).
    large_gauss: bool = False

    #: Alias the input HBM pair to the outputs (input_output_aliases) in
    #: the one-pass kernels whose in/out views share a shape and block
    #: index map (radix, square two-stage, dense).  In-place halves the
    #: HBM page working set: the aliased two-stage kernel measured +24%
    #: in a chained loop on v5e (tools/perf_dma2.py — overturning the
    #: round-2 negative, which predates the cat tier and today's tile
    #: choices).  XLA inserts a defensive copy when the operand is an
    #: entry parameter the caller still owns, so this is always correct;
    #: it pays when the operand is a loop carry, a donated arg, or an
    #: XLA temp (the pad/pack copies in dense/radix apply()).
    #: Round-5 default ON: with the flat-view ctwgx kernel the aliased
    #: form rides the full 660 GB/s stream class — 1302 -> 2086 GF/s at
    #: 65536, 1289 -> 2150 at 32768, 1284 -> 2053 at 131072 (same-run
    #: v5e, tools/perf_ctwgn.py).  This matches the reference's in-place
    #: execution model (lib.rs:195-211: process() overwrites the buffer).
    pallas_in_place: bool = True
    #: Scoped VMEM budget for Pallas kernels (bytes).  The TPU default is
    #: 16MB; v5e cores have more physical VMEM, and a larger budget lets the
    #: fused kernels run bigger batch tiles (fewer grid steps).
    pallas_vmem_limit: int = 64 * 1024 * 1024


#: Module-level config; mutate fields or swap wholesale to retune.
config = FftConfig()


def enable_persistent_compilation_cache(path: str = "~/.cache/rustfft_tpu_xla") -> None:
    """Persist compiled executables across processes.

    The planner's recipe/plan caches (the analogue of the reference's
    FftCache, fft_cache.rs:5-39) live per process; the expensive part on TPU
    is XLA compilation, and this enables JAX's on-disk compilation cache so
    a plan compiled once is reused by every later process — the closest
    TPU analogue of "checkpoint/resume" for plan setup (SURVEY.md §5).
    """
    import os

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
