#!/bin/bash
# Round-closing gate check: run ALL THREE gate modes against the
# artifacts as committed, and print one summary line whose content is
# MECHANICAL - paste it into ROADMAP verbatim. Exists because round 10
# closed with a hand-written "ALL OK" that the committed artifacts
# contradicted (VERDICT r10, What's wrong #1): the claim must come from
# the gates, not from memory of an earlier in-session run.
#
# Usage: tools/close_round.sh <prev_bench_json>   (e.g. BENCH_r10.json)
set -u
cd "$(dirname "$0")/.."
PREV="${1:?usage: close_round.sh <prev BENCH_rN.json>}"

python3 tools/check_bench.py target/bench_last.json "$PREV" > target/gate_bench.txt 2>&1
B=$?
python3 tools/check_bench.py --scaling target/scaling.json > target/gate_scaling.txt 2>&1
S=$?
python3 tools/check_bench.py --recall target/ann_recall.json > target/gate_recall.txt 2>&1
R=$?

st() { if [ "$1" -eq 0 ]; then echo OK; else echo FAIL; fi; }
RATIO=$(grep -oE 'total: .*\(([0-9.]+)x\)' target/gate_bench.txt | grep -oE '[0-9.]+x' | tail -1)
echo "gates @ $(git rev-parse --short HEAD): BENCH $(st $B) vs $PREV ${RATIO:-?}, SCALING $(st $S), RECALL $(st $R)"
for f in gate_bench gate_scaling gate_recall; do
  echo "--- $f"
  grep -E 'REGRESS|SUPER|VAR |LOW |MISS|RECALL OK|SCALING OK|OK$' "target/$f.txt" | tail -8
done
exit $(( B + S + R ))
