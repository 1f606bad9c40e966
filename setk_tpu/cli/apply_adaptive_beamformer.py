#!/usr/bin/env python
"""Mask-based adaptive beamforming (mvdr/mpdr/mpdr-whiten/gevd/pmwf-0/1).

Parity: /root/reference/scripts/sptk/apply_adaptive_beamformer.py — same
flags (interference masks, VAD mask filtering, BAN, post-masking, online
chunked mode), with the whole per-utterance pipeline jitted and shapes
bucketed so the compile cache is reused across a corpus.
"""

import argparse
from functools import lru_cache, partial

import numpy as np

from setk_tpu.cli.common import (StftParser, stft_config_from_args,
                                 strtobool, pad_to_bucket)
from setk_tpu.enhance import beamformer as bf
from setk_tpu.enhance.vad import vad_masks, apply_vad_filter
from setk_tpu.dsp.stft import inverse_stft
from setk_tpu.io import SpectrogramReader, MaskReader, WaveWriter
from setk_tpu.utils import get_logger
from setk_tpu.utils.hostdev import put_complex
from setk_tpu.utils.profiling import ThroughputMeter, trace

logger = get_logger(__name__)

BEAMFORMERS = ["mvdr", "mpdr", "mpdr-whiten", "gevd", "pmwf-0", "pmwf-1"]


@lru_cache(maxsize=None)
def _jit_pipeline(beamformer, ban, post_mask, chunk_size, alpha, pmwf_ref,
                  rank1, cfg):
    import jax
    import jax.numpy as jnp

    def pipeline(obs, mask_s, mask_n, nsamps):
        # obs (F, N, T); masks (F, T)
        kwargs = {}
        if beamformer.startswith("pmwf"):
            kwargs = dict(ref_channel=pmwf_ref, rank1_appro=rank1)
        if chunk_size > 0:
            enh = bf.online_supervised_run(beamformer, obs, mask_s,
                                           mask_n=mask_n,
                                           chunk_size=chunk_size,
                                           alpha=alpha, ban=ban)
        else:
            enh = bf.supervised_run(beamformer, obs, mask_s, mask_n=mask_n,
                                    ban=ban, **kwargs)
        if post_mask:
            enh = enh * mask_s
        samps = inverse_stft(jnp.swapaxes(enh, -1, -2), cfg, nsamps=nsamps)
        return samps

    return jax.jit(pipeline, static_argnames=("nsamps",))


def _run_batched(args):
    """Throughput path: bucketed (B, N, S) batches through BatchEnhancer,
    optionally data-parallel over the device mesh."""
    from setk_tpu.io.prefetch import PrefetchWaveLoader
    from setk_tpu.parallel.executor import BatchEnhancer
    cfg = stft_config_from_args(args)
    # decode-ahead on the native thread pool so the chip never waits on IO
    reader = PrefetchWaveLoader(args.wav_scp, sr=args.sr)
    tgt_reader = MaskReader(args.fmt, args.tgt_mask)
    mesh = None
    if args.data_parallel:
        import jax
        from setk_tpu.parallel import make_mesh
        n = len(jax.devices())
        if n > 1:
            mesh = make_mesh(n, axis_sizes=(n, 1, 1))
    enhancer = BatchEnhancer(cfg, beamformer=args.beamformer,
                             batch_size=args.batch_size, mesh=mesh,
                             ban=bool(args.ban),
                             chunk_size=args.chunk_size, alpha=args.alpha)
    num_done = 0
    meter = ThroughputMeter("adaptive-beamformer[batched]", report_every=64)
    with WaveWriter(args.dst_dir, sr=args.sr) as writer:
        norms = {}

        def emit(key, samps):
            if not np.isfinite(samps).all():
                # degenerate covariance: the reference skips the
                # utterance on np.linalg.LinAlgError
                # (apply_adaptive_beamformer.py:170-172); XLA solves
                # return NaN instead of raising
                logger.warning(f"{key}: non-finite output, skipping")
                return
            peak = np.max(np.abs(samps))
            writer.write(key, samps * norms[key] / (peak + 1e-7))
            meter.update(samps.shape[-1] / args.sr)

        for key, wav in reader:
            if key not in tgt_reader:
                continue
            if wav.ndim == 1:
                wav = wav[None]
            mask = np.asarray(tgt_reader[key])
            f_bins = cfg.num_bins
            if mask.shape[0] == f_bins and mask.shape[1] != f_bins:
                mask = mask.T  # to T x F
            norms[key] = float(np.max(np.abs(wav)))
            for done_key, samps in enhancer.add(
                    key, wav.astype(np.float32),
                    np.minimum(mask, 1).astype(np.float32)):
                emit(done_key, samps)
                num_done += 1
        for done_key, samps in enhancer.flush():
            emit(done_key, samps)
            num_done += 1
    meter.report()
    logger.info(f"Processed {num_done} utterances (batched)")


def run(args):
    with trace(args.jax_profile_dir):
        _run(args)


def _run(args):
    if args.batch_size > 1:
        if args.itf_mask or 0.5 < args.vad_proportion < 1 or args.mask:
            raise RuntimeError(
                "--batch-size > 1 supports the offline and online "
                "paths (no interference/VAD/post-mask options)")
        _run_batched(args)
        return
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, transpose=False)
    tgt_reader = MaskReader(args.fmt, args.tgt_mask)
    itf_reader = MaskReader(args.fmt, args.itf_mask) if args.itf_mask \
        else None
    pipeline = _jit_pipeline(args.beamformer, bool(args.ban),
                             bool(args.mask), args.chunk_size, args.alpha,
                             args.pmwf_ref, args.rank1_appro, cfg)
    bucket = args.chunk_size if args.chunk_size > 0 else 64
    num_done = 0
    meter = ThroughputMeter("adaptive-beamformer", report_every=100)
    with WaveWriter(args.dst_dir, sr=args.sr) as writer:
        for key, stft_mat in reader:
            if key not in tgt_reader:
                continue
            norm = reader.maxabs(key)
            # stft_mat: N x F x T
            n_ch, f_bins, _ = stft_mat.shape
            speech_mask = np.asarray(tgt_reader[key])
            interf_mask = np.asarray(itf_reader[key]) if itf_reader else None
            if interf_mask is None:
                speech_mask = np.minimum(speech_mask, 1)
            # ensure T x F orientation
            if speech_mask.shape[0] == f_bins and \
                    speech_mask.shape[1] != f_bins:
                speech_mask = speech_mask.T
                if interf_mask is not None:
                    interf_mask = interf_mask.T
            if 0.5 < args.vad_proportion < 1:
                silence, n_filtered = vad_masks(stft_mat[0],
                                                args.vad_proportion)
                logger.info(f"Filtering {int(n_filtered)} TF-masks...")
                speech_mask = np.asarray(
                    apply_vad_filter(speech_mask, silence))
                if interf_mask is not None:
                    interf_mask = np.asarray(
                        apply_vad_filter(interf_mask, silence))
            # canonical layouts + frame bucketing for compile reuse
            obs = stft_mat.transpose(1, 0, 2).astype(np.complex64)
            m_s = np.ascontiguousarray(speech_mask.T).astype(np.float32)
            obs, t_orig = pad_to_bucket(obs, axis=-1, bucket=bucket)
            m_s, _ = pad_to_bucket(m_s, axis=-1, bucket=bucket)
            if interf_mask is not None:
                m_n = np.ascontiguousarray(interf_mask.T).astype(np.float32)
                m_n, _ = pad_to_bucket(m_n, axis=-1, bucket=bucket)
            else:
                m_n = np.maximum(1.0 - m_s, 0.0)
            nsamps = reader.nsamps(key)
            # planar device transfer: complex buffers cannot cross the
            # host<->device boundary on some runtimes (axon TPU)
            samps = np.asarray(pipeline(put_complex(obs), m_s, m_n, nsamps))
            if not np.isfinite(samps).all():
                # degenerate covariance: the reference skips on
                # np.linalg.LinAlgError (:170-172); XLA yields NaN
                logger.warning(f"{key}: non-finite output, skipping")
                continue
            peak = np.max(np.abs(samps))
            samps = samps * norm / (peak + 1e-7)
            writer.write(key, samps)
            meter.update(samps.shape[-1] / args.sr)
            num_done += 1
    meter.report()
    logger.info(f"Processed {num_done} utterances out of {len(reader)}")


def make_parser():
    parser = argparse.ArgumentParser(
        description="Run adaptive (mvdr/gevd/pmwf) beamformer",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Multi-channel wave scripts")
    parser.add_argument("tgt_mask", help="Target speech masks (scp/dir)")
    parser.add_argument("dst_dir", help="Output directory for wavs")
    parser.add_argument("--beamformer", default="mvdr", choices=BEAMFORMERS)
    parser.add_argument("--fmt", "--mask-format", dest="fmt",
                        default="numpy",
                        choices=["numpy", "kaldi", "exraw"],
                        help="Mask storage format")
    parser.add_argument("--itf-mask", default="",
                        help="Interference masks (optional)")
    parser.add_argument("--sr", "--sample-rate", dest="sr",
                        type=int, default=16000)
    parser.add_argument("--ban", type=strtobool, default=False,
                        help="Blind analytic normalization")
    parser.add_argument("--mask", "--post-masking", dest="mask",
                        type=strtobool, default=False,
                        help="Mask the beamformer output")
    parser.add_argument("--vad-proportion", type=float, default=1.0,
                        help="Energy proportion for VAD mask filtering")
    parser.add_argument("--pmwf-ref", type=int, default=-1,
                        help="PMWF reference channel (-1: by SNR)")
    parser.add_argument("--rank1-appro", default="",
                        choices=["", "eig", "gev"])
    parser.add_argument("--chunk-size", "--online.chunk-size",
                        dest="chunk_size", type=int, default=-1,
                        help=">0 enables online chunked processing")
    parser.add_argument("--alpha", "--online.alpha", dest="alpha",
                        type=float, default=0.8,
                        help="Online covariance EMA factor")
    parser.add_argument("--channels", "--online.channels",
                        dest="channels", type=int, default=4,
                        help="(accepted for recipe compatibility)")
    parser.add_argument("--batch-size", type=int, default=1,
                        help=">1 runs bucketed batches through the "
                        "executor (offline path only)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="Shard batches over the device mesh")
    parser.add_argument("--jax-profile-dir", default="",
                        help="Write a jax profiler trace (TensorBoard/"
                        "XProf) of the run to this directory")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
