#!/usr/bin/env python
"""Unsupervised CACGMM mask estimation.

Parity: /root/reference/scripts/sptk/estimate_cacgmm_masks.py
(--cgmm-init, --update-alpha, permutation solving, resume-by-skip).
"""

import argparse
from pathlib import Path

import numpy as np

from setk_tpu.cli.common import StftParser, stft_config_from_args, strtobool
from setk_tpu.enhance.cluster import cacgmm_em, permu_aligner
from setk_tpu.io import MaskReader, SpectrogramReader, NumpyWriter
from setk_tpu.utils import get_logger
from setk_tpu.utils.hostdev import get_complex

logger = get_logger(__name__)


def _run(args):
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, transpose=False)
    init_reader = (MaskReader(args.fmt, args.init_mask)
                   if args.init_mask else None)
    import jax
    num_done = 0
    with NumpyWriter(args.dst_dir, args.scp) as writer:
        dst_dir = Path(args.dst_dir)
        for key, stft_mat in reader:
            if not args.force and (dst_dir / f"{key}.npy").exists():
                logger.info(f"Skip existing {key}.npy...")
                continue
            obs = stft_mat.transpose(1, 0, 2).astype(np.complex64)
            state = None
            if args.resume_model:
                mdl = Path(args.resume_model) / f"{key}.npz"
                if mdl.exists():
                    loaded = np.load(mdl)
                    state = {k: loaded[k] for k in loaded.files}
                    logger.info(f"Resumed EM state from {mdl}")
            gamma_init = None
            if init_reader is not None and key in init_reader:
                # reference semantics: init mask is K x T x F (or T x F
                # for the speech class of a 2-class model)
                im = np.asarray(init_reader[key])
                if im.ndim == 2:
                    im = np.stack([im, 1.0 - im])
                gamma_init = np.transpose(im, (0, 2, 1))
            gamma, q_hist, mdl_state = cacgmm_em(
                obs, args.num_classes, num_iters=args.num_iters,
                gamma_init=gamma_init,
                cgmm_init=args.cgmm_init, update_alpha=args.update_alpha,
                key=jax.random.PRNGKey(args.seed), state=state,
                return_state=True)
            if args.dump_model:
                mdl_dir = Path(args.dump_model)
                mdl_dir.mkdir(parents=True, exist_ok=True)
                np.savez(mdl_dir / f"{key}.npz",
                         **{k: get_complex(v) for k, v in mdl_state.items()})
            for i, q in enumerate(np.asarray(q_hist)):
                logger.info(f"{key}: iter {i + 1:2d}/{args.num_iters}: "
                            f"Q = {q:.4f}")
            masks = np.asarray(gamma).transpose(0, 2, 1)  # K x T x F
            if args.solve_permu:
                masks = permu_aligner(masks)
            writer.write(key, masks.astype(np.float32))
            num_done += 1
    logger.info(f"Processed {num_done} utterances")


def _run_batched(args):
    """Accelerator path: bucketed multi-utterance EM in one program."""
    from setk_tpu.parallel.executor import BatchClusterer
    cfg = stft_config_from_args(args)
    reader = SpectrogramReader(args.wav_scp, cfg=cfg, transpose=False)
    kwargs = dict(update_alpha=args.update_alpha)
    if "cacgmm" == "cacgmm":
        kwargs["cgmm_init"] = args.cgmm_init
    clusterer = BatchClusterer(algo="cacgmm",
                               num_classes=args.num_classes,
                               num_iters=args.num_iters,
                               batch_size=args.batch_size,
                               seed=args.seed, **kwargs)
    num_done = 0
    with NumpyWriter(args.dst_dir, args.scp) as writer:
        def emit(key, gamma):
            masks = np.ascontiguousarray(gamma.transpose(0, 2, 1))
            if args.solve_permu and args.num_classes > 2:
                masks = permu_aligner(masks)
            if args.num_classes == 2 and "cacgmm" == "cgmm":
                writer.write(key, masks[0].astype(np.float32))
            else:
                writer.write(key, masks.astype(np.float32))

        for key, stft_mat in reader:
            obs = stft_mat.transpose(1, 0, 2).astype(np.complex64)
            for done_key, gamma in clusterer.add(key, obs):
                emit(done_key, gamma)
                num_done += 1
        for done_key, gamma in clusterer.flush():
            emit(done_key, gamma)
            num_done += 1
    logger.info(f"Processed {num_done} utterances (batched)")


def run(args):
    if getattr(args, "batch_size", 1) > 1:
        if getattr(args, "init_mask", ""):
            logger.info("--init-mask given: using the per-utterance path")
        else:
            # batched accelerator path (jitted EM over utterance buckets)
            _run_batched(args)
            return
    from setk_tpu.utils.hostdev import on_host
    # eager utterance-loop command: pin compute to host CPU
    with on_host():
        _run(args)


def make_parser():
    parser = argparse.ArgumentParser(
        description="Estimate T-F masks via CACGMM spatial clustering",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[StftParser.parser])
    parser.add_argument("wav_scp", help="Multi-channel wave scripts")
    parser.add_argument("dst_dir", help="Output directory for .npy masks")
    parser.add_argument("--scp", default="", help="Also emit an index scp")
    parser.add_argument("--num-classes", type=int, default=2)
    parser.add_argument("--num-iters", type=int, default=20)
    parser.add_argument("--cgmm-init", type=strtobool, default=False)
    parser.add_argument("--update-alpha", type=strtobool, default=True)
    parser.add_argument("--solve-permu", type=strtobool, default=True)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--batch-size", type=int, default=1,
                        help=">1 runs bucketed multi-utterance EM on the "
                        "accelerator (frame-masked statistics)")
    parser.add_argument("--dump-model", default="",
                        help="Directory to save per-utt EM model state (.npz)")
    parser.add_argument("--resume-model", default="",
                        help="Directory with saved EM states to resume from")
    parser.add_argument("--force", type=strtobool, default=False)
    parser.add_argument("--init-mask", default="",
                        help="Initial speech masks to seed the EM "
                        "(K x T x F, or T x F for 2 classes)")
    parser.add_argument("--fmt", "--mask-format", dest="fmt",
                        default="numpy", choices=["numpy", "kaldi"],
                        help="Initial-mask container format")
    return parser


if __name__ == "__main__":
    run(make_parser().parse_args())
