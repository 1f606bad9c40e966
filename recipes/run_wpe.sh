#!/usr/bin/env bash
# WPE dereverberation recipe (reference: scripts/run_wpe.sh).

set -eu

nj=1
taps=10
delay=3
num_iters=3

. "$(dirname "$0")/parse_options.sh" || true

if [ $# -ne 2 ]; then
  echo "Usage: $0 [--nj N --taps T --delay D --num-iters I] <wav-scp> <dst-dir>"
  exit 1
fi

wav_scp=$1; dst_dir=$2

if [ "$nj" -le 1 ]; then
  python -m setk_tpu.cli apply_wpe "$wav_scp" "$dst_dir" \
    --taps "$taps" --delay "$delay" --num-iters "$num_iters"
else
  "$(dirname "$0")/run_sharded.sh" "$nj" "$wav_scp" \
    apply_wpe {SCP} "$dst_dir" --taps "$taps" --delay "$delay" \
    --num-iters "$num_iters"
fi
