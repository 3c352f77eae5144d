#!/bin/sh
# Classifier replay selftest (r18 VERDICT #3 "done" criterion): the
# r18-evidence fixture (tail-recovered durations/t0 + judge-quoted
# probe series — the full artifact was lost to a scratch overwrite)
# must classify as a HOT-RUN with a bracketed residual window, and a
# synthetic evenly-spread inflation with clean probes must still
# classify SCATTERED. Run from the repo root; exit 0 = both hold.
set -u
cd "$(dirname "$0")/.." || exit 1
fail=0

out=$(python3 tools/round_compare.py --driver \
  tools/fixtures/bench_r18_evidence.json 2>&1)
echo "$out" | grep -q "HOT-RUN/TAIL-DEGRADED" || {
  echo "FAIL: r18 evidence fixture did not classify HOT-RUN"; fail=1; }
echo "$out" | grep -q "hot run + bracketed window" || {
  echo "FAIL: r18 evidence fixture residual not a bracketed window"; fail=1; }
echo "$out" | grep -q "tools/attribute.sh" || {
  echo "FAIL: r18 evidence fixture verdict does not route to attribute.sh"; fail=1; }

out=$(python3 tools/round_compare.py --driver \
  tools/fixtures/bench_scatter_synthetic.json 2>&1)
echo "$out" | grep -q "=> SCATTERED" || {
  echo "FAIL: synthetic scatter fixture did not classify SCATTERED"; fail=1; }
echo "$out" | grep -q "HOT-RUN" && {
  echo "FAIL: synthetic scatter fixture (clean probes) claimed HOT-RUN"; fail=1; }

[ "$fail" -eq 0 ] && echo "selftest OK: hot-run + scatter verdicts both hold"
exit "$fail"
