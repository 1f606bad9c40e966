#!/usr/bin/env bash
# Generic sharded runner: split an scp into N shards and run one
# setk_tpu CLI command per shard in parallel — the run.pl analog for
# host-level parallelism.  For device-level parallelism prefer the
# batched executor (setk_tpu.parallel.executor), which keeps one process
# and shards over the mesh instead.
#
# Usage: run_sharded.sh <nj> <wav_scp> <command> [args... with {SCP} and {JOB} placeholders]
# Example:
#   recipes/run_sharded.sh 4 data/wav.scp apply_wpe {SCP} exp/wpe/{JOB}

set -eu

nj=$1; shift
scp=$1; shift

workdir=$(mktemp -d)
trap 'rm -rf "$workdir"' EXIT

python - "$scp" "$nj" "$workdir" <<'EOF'
import sys
scp, nj, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
lines = [l for l in open(scp) if l.strip()]
for j in range(nj):
    with open(f"{workdir}/shard.{j + 1}.scp", "w") as f:
        f.writelines(lines[j::nj])
EOF

pids=()
for j in $(seq 1 "$nj"); do
  args=()
  for a in "$@"; do
    a=${a//\{SCP\}/$workdir/shard.$j.scp}
    a=${a//\{JOB\}/$j}
    args+=("$a")
  done
  python -m setk_tpu.cli "${args[@]}" &
  pids+=($!)
done

status=0
for pid in "${pids[@]}"; do
  wait "$pid" || status=1
done
exit $status
