#!/usr/bin/env bash
# Mask-estimator training pipeline (reference: steps/train_dnn_mask.sh /
# train_rnn_mask.sh, which delegate to Kaldi nnet3): compute oracle
# targets, train natively on the accelerator.

set -eu

arch=dnn
mask=irm
epochs=10
batch_size=8

. "$(dirname "$0")/parse_options.sh" || true

if [ $# -ne 3 ]; then
  echo "Usage: $0 [--arch dnn|tdnn|lstm|blstm --mask irm|ibm|psm --epochs N] <clean-scp> <noisy-scp> <exp-dir>"
  exit 1
fi

clean_scp=$1; noisy_scp=$2; exp_dir=$3
mkdir -p "$exp_dir"

python -m setk_tpu.cli compute_mask "$clean_scp" "$noisy_scp" \
  "$exp_dir/target.ark" --scp "$exp_dir/target.scp" --mask "$mask"
python -m setk_tpu.cli train_mask_estimator "$noisy_scp" \
  "$exp_dir/target.scp" "$exp_dir/final.msgpack" --arch "$arch" \
  --epochs "$epochs" --batch-size "$batch_size" --data-parallel
echo "Model saved to $exp_dir/final.msgpack"
