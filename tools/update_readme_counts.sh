#!/bin/bash
# Regenerate hand-written counts in README.md from the actual sbt test run —
# round-3 verdict: artifact-vs-reality count drift (README said 87, suite had
# 97) is the same defect class that tripped BASELINE vs BENCH in rounds 1-2.
# Usage: tools/update_readme_counts.sh  (runs sbt test; ~3 min)
set -euo pipefail
cd "$(dirname "$0")/.."
out=$(sbt -batch test 2>&1 | grep -oE "Tests: succeeded [0-9]+, failed [0-9]+" | tail -1)
n=$(echo "$out" | grep -oE "succeeded [0-9]+" | grep -oE "[0-9]+")
fails=$(echo "$out" | grep -oE "failed [0-9]+" | grep -oE "[0-9]+")
if [ -z "$n" ] || [ "$fails" != "0" ]; then
  echo "test run not green ($out) — refusing to update README" >&2
  exit 1
fi
sed -i -E "s/\`sbt -batch test\` \([0-9]+ tests/\`sbt -batch test\` ($n tests/" README.md
if ! grep -q "\`sbt -batch test\` ($n tests" README.md; then
  echo "README phrasing drifted — count NOT updated; fix the sed pattern" >&2
  exit 1
fi
echo "README.md test count set to $n"
