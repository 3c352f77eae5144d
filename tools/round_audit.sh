#!/bin/sh
# Round gate (r16 VERDICT #5): run the driver-vs-board audit on a
# round's BENCH artifact and persist its full output + exit code to a
# committed round_audit_<name>.txt, so the audit provably RAN — the
# r16 round produced an 8x-skewed, box-contaminated artifact and
# nothing forced the audit that would have refused it.
#
# Protocol: at the START of round N+1, audit round N's BENCH_rN.json
# (the driver writes it after the builder's turns end) and commit the
# record alongside it. Extra args pass through to round_compare.py
# (e.g. a non-default board list).
#
# usage: tools/round_audit.sh BENCH_rN.json [BOARD.json,...]
set -u
if [ $# -lt 1 ]; then
  echo "usage: tools/round_audit.sh BENCH_rN.json [BOARD.json,...]" >&2
  exit 64
fi
artifact="$1"
name=$(basename "$artifact" .json | tr 'A-Z' 'a-z')
out="round_audit_${name#bench_}.txt"
python3 "$(dirname "$0")/round_compare.py" --driver "$@" > "$out" 2>&1
code=$?
echo "exit=$code" >> "$out"
cat "$out"
exit "$code"
