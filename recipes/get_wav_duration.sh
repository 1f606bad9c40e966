#!/usr/bin/env bash
# utt2dur from wav headers (reference: scripts/get_wav_duration.sh) — thin wrapper over
# `python -m setk_tpu.cli wav_duration`.  A leading --nj N shards the first
# scp over N local jobs (the run.pl/queue.pl analog); everything after
# the positionals passes through to the CLI.  For device-level
# parallelism prefer the CLI's batched/executor options in one process.

set -eu

nj=1

. "$(dirname "$0")/parse_options.sh" || true

if [ $# -lt 1 ]; then
  echo "Usage: $0 [--nj N] <scp> [cli positionals + flags...]"
  exit 1
fi

scp=$1; shift

if [ "$nj" -le 1 ]; then
  exec python -m setk_tpu.cli wav_duration "$scp" "$@"
fi
exec "$(dirname "$0")/run_sharded.sh" "$nj" "$scp" wav_duration {SCP} "$@"
