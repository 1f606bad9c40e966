#!/usr/bin/env python
"""Analytic roofline / MFU statement for the flagship pipelines.

Host-only: computes flops and bytes per step from the kernel designs'
shapes (no TPU), places them against the chip's measured/peak rates,
and prints the utilization table committed in doc/KERNELS.md (VERDICT
r03 next #4).  Two flop counts are reported per MXU workload:

  * useful   — algorithmic MACs of the f32-grade result (K-stacked
               bf16 passes count ONCE: they are the price of f32
               precision on a bf16 MXU, like FMA counting);
  * executed — pad-inclusive MACs the MXU actually clocks through
               (sublane/lane tile granularity 8 / 128), including every
               K-stack pass.  The executed roofline is the hardware
               speed-of-light of the CURRENT kernel; useful/measured is
               the headline MFU.

Chip constants (one v5e chip):
  MXU peak 197e12 bf16 flops/s (rated), HBM practical 210 GB/s
  (measured, doc/KERNELS.md), VPU ~4e12 f32 element-ops/s (measured
  ~2.8e12 sustained = 70% in the CACGMM kernel attribution).

Measured step times cite the artifact they come from.
"""

import math

MXU = 197e12          # bf16 flops/s (2 * MACs)
HBM = 210e9           # bytes/s, measured practical
VPU = 4.0e12          # f32 element-ops/s

SR = 16000
F, FH, NFFT, HOP = 257, 256, 512, 256


def ceil_to(x, m):
    return (x + m - 1) // m * m


def mxu_exec(mm, nn, kk):
    """Pad-inclusive MACs of one (mm, kk) x (kk, nn) MXU dot."""
    return ceil_to(mm, 8) * ceil_to(nn, 128) * ceil_to(kk, 8)


def fused_mvdr_row():
    """bench.py headline: B=128 x 8 s, 6 ch (ops/pallas/fused_mvdr.py).

    Two kernels: stft+covar (forward DIF DFT all mics + masked pair
    covariance) and beamform+istft (forward DFT RECOMPUTED in VMEM +
    weighted sum + inverse DIT + OLA); weights solve between them.
    """
    B, N, SECS = 128, 6, 8
    S = SECS * SR
    T = S // HOP + 1          # center-padded frames
    TP = ceil_to(T, 8)
    # forward DIF per mic-utterance: two K-stacked dots
    #   even: (T, 768) @ (768, 384); odd: (T, 768) @ (768, 256)
    fwd_useful = T * FH * (2 * FH // 2 + 1 + FH) * 2   # one-pass real DFT
    fwd_exec = mxu_exec(TP, 384, 768) + mxu_exec(TP, 256, 768)
    # inverse DIT per utterance: (T, 1152) @ (1152, 256) + (T, 768) @ (768, 256)
    inv_useful = T * (384 + 256) * FH * 2
    inv_exec = mxu_exec(TP, 256, 1152) + mxu_exec(TP, 256, 768)
    # lane permutation matmuls (scramble/unscramble): (T, 128) @ (128, 128)
    perm_exec = 6 * mxu_exec(TP, 128, 128)  # per mic-ish, small
    macs_exec = B * (N * fwd_exec * 2      # covar kernel + beamform recompute
                     + inv_exec + perm_exec)
    macs_useful = B * (N * fwd_useful + inv_useful)  # count DFT math once
    # VPU: masked pair covariance, 21 pairs x (Rs, Rn) x ~8 ops
    vpu_ops = B * F * T * 21 * 8 * 2
    # HBM: int16 wav in (read twice: both kernels), mask in (twice),
    # covar planes out+in, weights, f32 wav out
    bytes_ = (B * N * S * 2 * 2 + B * T * F * 4 * 2
              + B * F * N * N * 8 * 2 * 2 + B * F * N * 8 + B * S * 4)
    return {
        "name": "fused MVDR B=128 x 8 s (bench.py headline)",
        "measured_ms": 8.56, "artifact": "BENCH_r03 (119,655 audio-s/s)",
        "mxu_useful_ms": 2 * macs_useful / MXU * 1e3,
        "mxu_exec_ms": 2 * macs_exec / MXU * 1e3,
        "hbm_ms": bytes_ / HBM * 1e3,
        "vpu_ms": vpu_ops / VPU * 1e3,
    }


def wpe_row():
    """WPE B=32 x 8 s, 10 taps, 3 iters (ops/pallas/wpe_gram.py +
    cholesky.py, round-4 symmetric-trick grams)."""
    B, N, SECS, TAPS = 32, 6, 8, 10
    T = ceil_to(SECS * SR // HOP + 1, 8)   # 1008 padded
    BINS = B * F
    COLS = (TAPS + 1) * N                  # 66
    NK = N * TAPS                          # 60
    # per-bin gram dots (3 iterations): sym pairs K=2T x4 + cross K=6T
    g_exec = (4 * mxu_exec(COLS, COLS, 2 * T)
              + mxu_exec(COLS, COLS, 6 * T))
    g_useful = (2 * COLS * COLS * T        # Ar Ar^T + Ai Ai^T
                + COLS * COLS * T)         # Ai Ar^T
    # lambda dereverb dot (1-pass): (2NK, 16) x (2NK, 2T), 2 of 3 iters
    d_exec = mxu_exec(16, 2 * T, 2 * NK)
    d_useful = 2 * NK * 8 * T
    # apply kernel dereverb (3-pass K-stack): (6NK, 16) x (6NK, 2T)
    a_exec = mxu_exec(16, 2 * T, 6 * NK)
    macs_exec = BINS * (3 * g_exec + 2 * d_exec + a_exec)
    macs_useful = BINS * (3 * g_useful + 3 * d_useful)
    # solve: VPU issue model — sum_j j/4 fori steps x 4 updates x ~8 ops
    # on (rows, lanes) tiles, rows pruned to the lower triangle at R=32
    lanes, R = 512, 32
    vregs = 0
    for j in range(NK):
        rows = NK - R if j >= R else NK
        tiles = math.ceil(rows / 8) * (lanes // 128)
        vregs += j * 8 * tiles            # 8 ops per rank-update
    solve_vpu_cycles = vregs * math.ceil(BINS / lanes)
    solve_ms = solve_vpu_cycles / (VPU / (8 * 128)) * 1e3  # cycles at vreg rate
    # HBM per step: obs read 3x gram + 1x apply; d write; gram planes
    # write + XLA bins->lanes transpose (read+write) + solve read = 4
    # passes per iteration x3; filters out+in x3
    obs = BINS * N * T * 4 * 2
    gram_planes = BINS * COLS * COLS * 4 * 2
    bytes_ = (obs * 4 + obs + 4 * gram_planes * 3
              + BINS * NK * N * 4 * 2 * 2 * 3)
    return {
        "name": "fused WPE B=32 x 8 s (10 taps, 3 it)",
        "measured_ms": 54.96 - 24.80 / 6,  # probe-adjusted chain step
        "artifact": "profile_wpe_fused r04 (4,658 audio-s/s printed)",
        "mxu_useful_ms": 2 * macs_useful / MXU * 1e3,
        "mxu_exec_ms": 2 * macs_exec / MXU * 1e3,
        "hbm_ms": bytes_ / HBM * 1e3,
        "vpu_ms": 3 * solve_ms,
    }


def cacgmm_row():
    """Fused CACGMM EM B=32 x 4 s, 20 iters (ops/pallas/cacgmm_em.py).
    Pure VPU kernel (bins in lanes, no shared contraction axis): the
    roofline is the measured (T, sweeps, iters)-slope attribution
    (profile_em3.py, doc/KERNELS.md round-4)."""
    B, SECS, ITERS = 32, 4, 20
    T = SECS * SR // HOP + 1
    BINS = B * F
    tiles = math.ceil(BINS / (8 * 128))
    elem_ops = 610 * T * ITERS * tiles * 8 * 128
    jacobi_ms = 3.46   # measured T-independent sweep slope x 6 sweeps
    fixed_ms = 3.7     # measured per-call DMA + dispatch remainder
    bytes_ = BINS * (6 * T * 8 + 2 * T * 4 * 4)   # obs complex + gamma/k io
    return {
        "name": "fused CACGMM EM B=32 x 4 s (20 it)",
        "measured_ms": 17.26, "artifact": "profile_em3 r04 (7,416 audio-s/s)",
        "mxu_useful_ms": 0.0, "mxu_exec_ms": 0.0,
        "hbm_ms": bytes_ / HBM * 1e3,
        "vpu_ms": elem_ops / VPU * 1e3 + jacobi_ms + fixed_ms,
    }


def main():
    rows = [fused_mvdr_row(), wpe_row(), cacgmm_row()]
    hdr = (f"{'pipeline':44} {'meas':>7} {'MXU-x':>7} {'MXU-u':>7} "
           f"{'HBM':>6} {'VPU':>6} {'bound':>6} {'SoL%':>5} {'MFU%':>5}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        bound = max(r["mxu_exec_ms"], r["hbm_ms"], r["vpu_ms"])
        sol = 100.0 * bound / r["measured_ms"]
        mfu = (100.0 * r["mxu_useful_ms"] / r["measured_ms"]
               if r["mxu_useful_ms"] else float("nan"))
        print(f"{r['name']:44} {r['measured_ms']:7.2f} "
              f"{r['mxu_exec_ms']:7.2f} {r['mxu_useful_ms']:7.2f} "
              f"{r['hbm_ms']:6.2f} {r['vpu_ms']:6.2f} {bound:6.2f} "
              f"{sol:5.0f} {mfu:5.1f}")
        print(f"{'':44} [{r['artifact']}]")
    print("\nmeas = measured step ms; MXU-x = executed (pad+K-stack) "
          "matmul ms at peak;\nMXU-u = useful (algorithmic, 1-pass) "
          "matmul ms; bound = max(MXU-x, HBM, VPU);\nSoL% = bound/meas "
          "(speed-of-light attainment of the current kernel design);\n"
          "MFU% = MXU-u/meas (classic model-flops utilization).")


if __name__ == "__main__":
    main()
