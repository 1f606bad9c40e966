#!/usr/bin/env python
"""Simulation RTF head-to-head vs the reference wav_simulate.py.

The reference prints exactly one performance number anywhere in its
tree: the data-simulation real-time factor
(/root/reference/scripts/sptk/wav_simulate.py:319-325).  This script
runs the REFERENCE CLI and the repo's `setk_tpu.cli.wav_simulate` on an
IDENTICAL config — 6-channel room, 2 speakers + a point noise +
isotropic noise, all three image-method RIRs generated once by the
repo's native engine and consumed as the same wav files by both sides —
and commits both RTFs.

Both CLIs measure RTF internally around the simulation only (process
startup and wav writes excluded, matching the reference's own
definition); each side runs ``--runs`` fresh processes and the MIN
RTF is reported (the stall-resistant estimator, same policy as the
TPU benches).  A batched throughput row (one jitted convolve+mix over
B=32 utterances on the accelerator) shows the corpus-regime rate the
reference's per-process design cannot reach.

Writes BENCH_SIM_r05.json.
"""

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SR = 16000
REF = "/root/reference/scripts/sptk/wav_simulate.py"


def build_inputs(workdir: Path):
    from setk_tpu.io.wave import write_wav
    from setk_tpu.sim.room import Room
    workdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)

    def speechish(secs):
        # low-passed modulated noise — spectrally speech-like enough for
        # power/SNR math, deterministic
        x = rng.standard_normal(secs * SR).astype(np.float32)
        k = np.hanning(33).astype(np.float32)
        x = np.convolve(x, k / k.sum(), mode="same")
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 3.0 *
                                 np.arange(x.size) / SR).astype(np.float32)
        return (x * env * 0.3).astype(np.float32)

    write_wav(str(workdir / "spk1.wav"), speechish(8), sr=SR)
    write_wav(str(workdir / "spk2.wav"), speechish(8), sr=SR)
    write_wav(str(workdir / "ptn.wav"),
              (rng.standard_normal(8 * SR) * 0.1).astype(np.float32), sr=SR)
    write_wav(str(workdir / "iso.wav"),
              (rng.standard_normal((6, 10 * SR)) * 0.05).astype(np.float32),
              sr=SR)

    room = Room(6.0, 5.0, 3.0, rt60=0.5)
    room.set_linear_mic((0.0, 0.05, 0.1, 0.15, 0.2, 0.25), (3.0, 2.5, 1.4))
    for name, pos in (("rir_spk1", (2.0, 3.8, 1.6)),
                      ("rir_spk2", (4.2, 3.5, 1.5)),
                      ("rir_ptn", (1.2, 1.0, 1.2))):
        room.set_spk(pos)
        rir = np.asarray(room.rir(sr=SR, rir_nsamps=8000))
        write_wav(str(workdir / f"{name}.wav"), rir.astype(np.float32),
                  sr=SR)
    print("inputs built", flush=True)


def sim_args(workdir: Path, out: Path):
    return [
        "--src-spk", f"{workdir}/spk1.wav,{workdir}/spk2.wav",
        "--src-rir", f"{workdir}/rir_spk1.wav,{workdir}/rir_spk2.wav",
        # N-1 values: speaker 0 is the 0 dB reference (both CLIs share
        # the reference's semantics, wav_simulate.py:177-185)
        "--src-sdr", "-4",
        "--src-begin", "0,16000",
        "--point-noise", f"{workdir}/ptn.wav",
        "--point-noise-rir", f"{workdir}/rir_ptn.wav",
        "--point-noise-snr", "10",
        "--isotropic-noise", f"{workdir}/iso.wav",
        "--isotropic-noise-snr", "15",
        "--sr", str(SR),
        str(out),
    ]


_RTF = re.compile(r"RTF = ([0-9.]+)")


def run_cli(cmd, env=None, runs=5):
    rtfs = []
    for _ in range(runs):
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             timeout=600)
        m = _RTF.search(out.stdout + out.stderr)
        if not m:
            print(out.stdout[-2000:], out.stderr[-2000:], sep="\n")
            raise RuntimeError(f"no RTF in output of {cmd[:3]}...")
        rtfs.append(float(m.group(1)))
    return min(rtfs), rtfs


def batched_rate(workdir: Path, batch=32):
    """One jitted convolve+mix step over a (B, ...) utterance batch on
    the accelerator: the corpus-regime path (sim/mixer.simulate_batch
    math inline — RIR convolution for 2 spk + 1 point noise, SNR
    scaling, isotropic add)."""
    import jax
    import jax.numpy as jnp
    from setk_tpu.io.wave import read_wav
    s = 8 * SR
    rng = np.random.default_rng(3)
    spk = rng.standard_normal((batch, 2, s)).astype(np.float32) * 0.3
    ptn = rng.standard_normal((batch, s)).astype(np.float32) * 0.1
    iso = rng.standard_normal((batch, 6, s)).astype(np.float32) * 0.05
    rirs = np.stack([
        read_wav(str(workdir / "rir_spk1.wav"), sr=SR, normalize=False),
        read_wav(str(workdir / "rir_spk2.wav"), sr=SR, normalize=False),
        read_wav(str(workdir / "rir_ptn.wav"), sr=SR, normalize=False),
    ]).astype(np.float32)                                # (3, 6, R)
    n_fft = 1 << (s + rirs.shape[-1] - 1).bit_length()

    @jax.jit
    def step(spk, ptn, iso):
        src = jnp.concatenate([spk, ptn[:, None]], axis=1)   # (B, 3, S)
        fs = jnp.fft.rfft(src[:, :, None, :], n_fft)         # (B,3,1,~)
        fr = jnp.fft.rfft(rirs[None], n_fft)                 # (1,3,6,~)
        img = jnp.fft.irfft(fs * fr, n_fft)[..., :s]         # (B,3,6,S)
        pow_ref = jnp.mean(img[:, 0, 0] ** 2, -1, keepdims=True)
        mix = img[:, 0] + img[:, 1]
        pn = jnp.mean(img[:, 2, 0] ** 2, -1, keepdims=True)
        mix = mix + img[:, 2] * jnp.sqrt(
            pow_ref / (pn * 10.0 + 1e-8))[..., None]
        pi = jnp.mean(iso[:, 0] ** 2, -1, keepdims=True)
        mix = mix + iso * jnp.sqrt(
            pow_ref / (pi * 10.0 ** 1.5 + 1e-8))[..., None]
        return mix / jnp.max(jnp.abs(mix), axis=(-2, -1), keepdims=True)

    args = [jnp.asarray(a) for a in (spk, ptn, iso)]
    out = step(*args)
    float(jnp.sum(jnp.abs(out)))  # compile + first run
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = step(*args)
        float(jnp.sum(jnp.abs(out)))
        best = min(best, time.perf_counter() - t0)
    audio_s = batch * 8
    return audio_s / best, best / audio_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir",
                    default=str(Path(__file__).resolve().parent.parent /
                                "scratch" / "sim_bench"))
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--skip-batched", action="store_true")
    args = ap.parse_args()
    workdir = Path(args.workdir)
    if not (workdir / "rir_ptn.wav").exists():
        build_inputs(workdir)

    import os
    env = dict(os.environ)
    # _ref_stubs provides the librosa/soundfile surface libs/utils.py
    # imports (absent in this image); stdlib-wave PCM16 IO underneath
    stubs = str(Path(__file__).resolve().parent / "_ref_stubs")
    env["PYTHONPATH"] = stubs + ":/root/reference/scripts/sptk:" + \
        env.get("PYTHONPATH", "")
    ref_min, ref_all = run_cli(
        [sys.executable, REF] + sim_args(workdir, workdir / "ref_mix.wav"),
        env=env, runs=args.runs)
    print(f"reference RTF: min {ref_min:.4f}  all {ref_all}", flush=True)

    ours_min, ours_all = run_cli(
        [sys.executable, "-m", "setk_tpu.cli.wav_simulate"] +
        sim_args(workdir, workdir / "our_mix.wav"),
        runs=args.runs)
    print(f"setk_tpu RTF: min {ours_min:.4f}  all {ours_all}", flush=True)

    result = {
        "config": "6ch room (rt60 0.5, image method, 8000-tap RIRs), "
                  "2 spk (spk2 at sdr -4) + point noise (snr 10) + isotropic "
                  "(snr 15), 8.5 s mixture",
        "reference_rtf_min": ref_min,
        "reference_rtf_all": ref_all,
        "setk_tpu_rtf_min": ours_min,
        "setk_tpu_rtf_all": ours_all,
        "speedup": round(ref_min / ours_min, 2),
    }
    if not args.skip_batched:
        rate, rtf = batched_rate(workdir)
        result["batched_b32_audio_s_per_s"] = round(rate, 1)
        result["batched_b32_rtf"] = rtf
        print(f"batched B=32 on-device: {rate:,.0f} audio-s/s "
              f"(RTF {rtf:.2e})", flush=True)

    out_path = Path(__file__).resolve().parent.parent / "BENCH_SIM_r05.json"
    with open(out_path, "w") as fd:
        json.dump(result, fd, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
