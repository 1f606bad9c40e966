#!/usr/bin/env bash
# RNN ([b]lstm) mask-estimator training (reference: steps/train_rnn_mask.sh,
# which generates nnet3 [B]LSTM xconfigs) — delegates to the native TPU
# trainer with a recurrent architecture.
#
# Usage: train_rnn_mask.sh [--arch lstm|blstm] <clean-scp> <noisy-scp> <exp-dir>

set -eu

arch=blstm

. "$(dirname "$0")/parse_options.sh" || true

if [ $# -lt 3 ]; then
  echo "Usage: $0 [--arch lstm|blstm] <clean-scp> <noisy-scp> <exp-dir>"
  exit 1
fi

exec "$(dirname "$0")/train_mask.sh" --arch "$arch" "$@"
