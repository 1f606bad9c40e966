#!/usr/bin/env bash
# Keep (or with --exclude true, drop) scp lines whose key appears in a
# filter list (reference: utils/filter_scp.pl).  The list's first field
# per line is the key.
#
# Usage: filter_scp.sh [--exclude true|false] <id-list> <in.scp> [out.scp]
# (out.scp defaults to stdout)

set -eu

exclude=false

. "$(dirname "$0")/parse_options.sh" || true

if [ $# -lt 2 ]; then
  echo "Usage: $0 [--exclude true|false] <id-list> <in.scp> [out.scp]"
  exit 1
fi

python - "$exclude" "$@" <<'EOF'
import sys
exclude = sys.argv[1] == "true"
ids = {l.split()[0] for l in open(sys.argv[2]) if l.strip()}
out = open(sys.argv[4], "w") if len(sys.argv) > 4 else sys.stdout
for line in open(sys.argv[3]):
    toks = line.split()
    if toks and (toks[0] in ids) != exclude:
        out.write(line)
EOF
