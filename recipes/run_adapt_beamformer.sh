#!/usr/bin/env bash
# Mask-based adaptive beamforming recipe (reference:
# scripts/run_adapt_beamformer.sh) — same surface, backed by the
# batched jitted CLI; use --nj for host-process sharding.

set -eu

nj=1
beamformer=mvdr
mask_format=numpy
ban=false
chunk_size=-1
alpha=0.8
vad_proportion=1

. "$(dirname "$0")/parse_options.sh" || true

if [ $# -ne 3 ]; then
  echo "Usage: $0 [options] <wav-scp> <mask-scp> <dst-dir>"
  echo "  --nj --beamformer --mask-format --ban --chunk-size --alpha --vad-proportion"
  exit 1
fi

wav_scp=$1; mask_scp=$2; dst_dir=$3

if [ "$nj" -le 1 ]; then
  python -m setk_tpu.cli apply_adaptive_beamformer "$wav_scp" "$mask_scp" \
    "$dst_dir" --beamformer "$beamformer" --fmt "$mask_format" \
    --ban "$ban" --chunk-size "$chunk_size" --alpha "$alpha" \
    --vad-proportion "$vad_proportion"
else
  "$(dirname "$0")/run_sharded.sh" "$nj" "$wav_scp" \
    apply_adaptive_beamformer {SCP} "$mask_scp" "$dst_dir" \
    --beamformer "$beamformer" --fmt "$mask_format" --ban "$ban" \
    --chunk-size "$chunk_size" --alpha "$alpha" \
    --vad-proportion "$vad_proportion"
fi
