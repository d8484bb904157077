#!/usr/bin/env bash
# Standing multi-file layout gate (r10 verdict item 5): split every
# test table into an 8-file parquet directory, run the full Verify
# board against the SPLIT layout, and oracle-check it against the
# ORIGINAL single-file tables. The r10 round ran this by hand once and
# caught a real bug (the streaming source's single-file symlink
# assumption zeroed all 15 stream queries); this script makes the same
# check one command so layout regressions can't re-enter silently.
#
# Usage: tools/gate_split8.sh [sfDir] [query ...]
#   tools/gate_split8.sh                          # full board at sf0.01
#   tools/gate_split8.sh /root/testdata/sf0.1 q1  # subset at sf0.1
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
if [ $# -gt 0 ]; then shift; fi
DST=/tmp/graft_split8_$(basename "$SF")
OUT=/tmp/graft_split8_out_$(basename "$SF")
rm -rf "$DST" "$OUT"
python3 tools/split8.py "$SF" "$DST"
sbt -batch "runMain graft.Verify $DST $OUT $*"
python3 tools/check.py "$SF" "$OUT" "$@"
