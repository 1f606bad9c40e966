#!/usr/bin/env bash
# Split an scp manifest into N shards (reference: utils/split_scp.pl).
# Round-robin by line, same policy run_sharded.sh uses internally.
#
# Usage: split_scp.sh <scp> <out1.scp> <out2.scp> ...

set -eu

if [ $# -lt 2 ]; then
  echo "Usage: $0 <scp> <out1.scp> [out2.scp ...]"
  exit 1
fi

python - "$@" <<'EOF'
import sys
scp, outs = sys.argv[1], sys.argv[2:]
lines = [l for l in open(scp) if l.strip()]
for j, out in enumerate(outs):
    with open(out, "w") as f:
        f.writelines(lines[j::len(outs)])
EOF
