#!/usr/bin/env python
"""WPE dereverberation CLI.

Parity: /root/reference/scripts/sptk/apply_wpe.py (taps/delay/context/
iters flags; the --nara-wpe switch is moot since our wpe IS the
vectorized GWPE).
"""

import argparse
from functools import lru_cache

import numpy as np

from setk_tpu.cli.common import (StftParser, stft_config_from_args,
                                 pad_to_bucket, strtobool)
from setk_tpu.enhance.wpe import wpe
from setk_tpu.dsp.stft import inverse_stft
from setk_tpu.io import SpectrogramReader, WaveWriter
from setk_tpu.utils import get_logger
from setk_tpu.utils.hostdev import put_complex

logger = get_logger(__name__)


@lru_cache(maxsize=None)
def _jit_wpe(taps, delay, context, iters, cfg):
    import jax
    import jax.numpy as jnp

    def pipeline(obs, nsamps):
        der = wpe(obs, taps=taps, delay=delay, context=context,
                  num_iters=iters)  # F x N x T
        return inverse_stft(jnp.transpose(der, (1, 2, 0)), cfg,
                            nsamps=nsamps)

    return jax.jit(pipeline, static_argnames=("nsamps",))


def _run_batched(args):
    """Throughput path: bucketed (B, N, S) batches through BatchWpe,
    optionally data-parallel over the device mesh."""
    from setk_tpu.io.prefetch import PrefetchWaveLoader
    from setk_tpu.parallel.executor import BatchWpe
    cfg = stft_config_from_args(args)
    reader = PrefetchWaveLoader(args.wav_scp, sr=args.sr)
    mesh = None
    if args.data_parallel:
        import jax
        from setk_tpu.parallel import make_mesh
        n = len(jax.devices())
        if n > 1:
            mesh = make_mesh(n, axis_sizes=(n, 1, 1))
    executor = BatchWpe(cfg, taps=args.taps, delay=args.delay,
                        context=args.context, num_iters=args.num_iters,
                        batch_size=args.batch_size, mesh=mesh)
    num_done = 0
    with WaveWriter(args.dst_dir, sr=args.sr) as writer:

        def emit(key, samps):
            nonlocal num_done
            if not np.isfinite(samps).all():
                logger.warning(f"{key}: non-finite output, skipping")
                return
            writer.write(key, samps)
            num_done += 1

        for key, wav in reader:
            if wav.ndim == 1:
                wav = wav[None]
            for done_key, samps in executor.add(key,
                                                wav.astype(np.float32)):
                emit(done_key, samps)
        for done_key, samps in executor.flush():
            emit(done_key, samps)
    logger.info(f"Processed {num_done} utterances (batched)")


def run(args):
    if args.batch_size > 1:
        _run_batched(args)
        return
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, transpose=False)
    pipeline = _jit_wpe(args.taps, args.delay, args.context, args.num_iters,
                        cfg)
    num_done = 0
    with WaveWriter(args.dst_dir, sr=args.sr) as writer:
        for key, stft_mat in reader:
            if stft_mat.ndim == 2:
                stft_mat = stft_mat[None]
            obs = stft_mat.transpose(1, 0, 2).astype(np.complex64)
            obs, _ = pad_to_bucket(obs, axis=-1, bucket=64)
            nsamps = reader.nsamps(key)
            samps = np.asarray(pipeline(put_complex(obs), nsamps))  # N x S
            if not np.isfinite(samps).all():
                # singular tap correlation: the reference skips on
                # np.linalg.LinAlgError (apply_wpe.py:54-56)
                logger.warning(f"{key}: non-finite output, skipping")
                continue
            writer.write(key, samps)
            num_done += 1
            if num_done % 100 == 0:
                logger.info(f"Processed {num_done} utterances...")
    logger.info(f"Processed {num_done} utterances over {len(reader)}")


def make_parser():
    parser = argparse.ArgumentParser(
        description="WPE dereverberation",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Multi-channel wave scripts")
    parser.add_argument("dst_dir", help="Output directory")
    parser.add_argument("--taps", type=int, default=10)
    parser.add_argument("--delay", type=int, default=3)
    parser.add_argument("--context", type=int, default=1)
    parser.add_argument("--num-iters", type=int, default=3)
    parser.add_argument("--sr", "--sample-rate", dest="sr",
                        type=int, default=16000)
    parser.add_argument("--nara-wpe", type=strtobool,
                        default=False,
                        help="Accepted for reference-CLI "
                        "compatibility: the built-in WPE "
                        "already implements the same GWPE "
                        "recursion (nara_wpe wpe_v6/v8)")
    parser.add_argument("--batch-size", type=int, default=1,
                        help="Bucketed batch execution (throughput path)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="Shard batches over the device mesh")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
