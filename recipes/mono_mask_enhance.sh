#!/usr/bin/env bash
# Neural-mask mono enhancement pipeline (reference:
# steps/mono_mask_enhance.sh — nnet3 compute_output + wav-separate):
# run the trained estimator, then apply the masks.

set -eu

if [ $# -ne 3 ]; then
  echo "Usage: $0 <wav-scp> <checkpoint> <dst-dir>"
  exit 1
fi

wav_scp=$1; checkpoint=$2; dst_dir=$3

python -m setk_tpu.cli estimate_nn_masks "$wav_scp" "$checkpoint" \
  "$dst_dir/masks" --scp "$dst_dir/masks.scp"
python -m setk_tpu.cli wav_separate "$wav_scp" "$dst_dir/masks.scp" \
  "$dst_dir/enhan" --fmt numpy
