#!/usr/bin/env bash
# CACGMM mask estimation -> adaptive beamforming (reference:
# scripts/run_cacgmm.sh + run_adapt_beamformer.sh chained).

set -eu

nj=1
num_classes=2
num_iters=20
beamformer=mvdr

. "$(dirname "$0")/parse_options.sh" || true

if [ $# -ne 2 ]; then
  echo "Usage: $0 [--nj N --num-classes K --num-iters I --beamformer B] <wav-scp> <exp-dir>"
  exit 1
fi

wav_scp=$1; exp_dir=$2
mkdir -p "$exp_dir"

if [ "$nj" -le 1 ]; then
  python -m setk_tpu.cli estimate_cacgmm_masks "$wav_scp" "$exp_dir/masks" \
    --scp "$exp_dir/masks.scp" --num-classes "$num_classes" \
    --num-iters "$num_iters"
else
  "$(dirname "$0")/run_sharded.sh" "$nj" "$wav_scp" \
    estimate_cacgmm_masks {SCP} "$exp_dir/masks" \
    --scp "$exp_dir/masks.{JOB}.scp" --num-classes "$num_classes" \
    --num-iters "$num_iters"
  cat "$exp_dir"/masks.*.scp > "$exp_dir/masks.scp"
fi

python -m setk_tpu.cli apply_adaptive_beamformer "$wav_scp" \
  "$exp_dir/masks.scp" "$exp_dir/enhan" --beamformer "$beamformer" \
  --fmt numpy
