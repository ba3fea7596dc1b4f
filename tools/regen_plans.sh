#!/usr/bin/env bash
# Regenerate PLANS.md's capture section over the WHOLE SparkEntry.queries
# surface (PlanLintSpec fails the build when any query key lacks a
# capture header here). Keeps the hand-written narrative — everything
# above the first capture header — intact.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"

sbt -batch "runMain graft.Explain $SF_DIR all" \
  | sed -n '/^========== /,$p' \
  | grep -v -e '^\[info\]' -e '^\[success\]' -e '^\[warn\]' \
            -e '^[0-9][0-9]/[0-9][0-9]/[0-9][0-9] ' \
  > /tmp/plans_captures.$$

awk '/^========== / { exit } { print }' PLANS.md > /tmp/plans_narrative.$$
cat /tmp/plans_narrative.$$ /tmp/plans_captures.$$ > PLANS.md
rm -f /tmp/plans_narrative.$$ /tmp/plans_captures.$$
echo "PLANS.md regenerated: $(grep -c '^========== ' PLANS.md) captures"
