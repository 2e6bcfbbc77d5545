#!/usr/bin/env bash
# Full verification gate, in dependency order. Each stage fails fast.
#
#   bash tools/ci.sh            # default: sf0.01 drive + plan audit + tests
#   bash tools/ci.sh --full     # adds the sf0.1 full-registry drive (slow)
#
# Stages:
#   1. oracle drive  — every registered query vs its DuckDB oracle (sf0.01,
#                      the driver's correctness gate)
#   2. plan audit    — pushdown/join-strategy/Python-stage anti-patterns,
#                      regenerates PLANS.md
#   3. pytest        — unit + pipeline + stress + model-based suites
#   4. (--full) sf0.1 drive — scale-dependent behavior (see ORACLE_SF01.md)
set -euo pipefail
cd "$(dirname "$0")/.."

SF001=${SPARK_GRAFT_SF001:-/root/testdata/sf0.01}
SF01=${SPARK_GRAFT_SF01:-/root/testdata/sf0.1}

echo "== 1/4 oracle drive @ ${SF001}"
python tools/check_oracle.py "${SF001}"

echo "== 2/4 plan audit @ ${SF01}"
python tools/audit_plans.py "${SF01}" --write-report

echo "== 3/4 pytest"
python -m pytest tests/ -q

if [[ "${1:-}" == "--full" ]]; then
  echo "== 4/4 oracle drive @ ${SF01} (full registry)"
  python tools/check_oracle.py "${SF01}"
  # the scale axis cuts both ways: tiny data exposes rank/boundary
  # conventions dense groups average away (see ORACLE_SF01.md's
  # sf0.001 sweep, which caught a percentile rank off-by-one)
  SF0001=${SPARK_GRAFT_SF0001:-/root/testdata/sf0.001}
  echo "== bonus: oracle drive @ ${SF0001} (small-data boundaries)"
  python tools/check_oracle.py "${SF0001}"
else
  echo "== 4/4 skipped (pass --full for the sf0.1 + sf0.001 registry drives)"
fi
echo "CI gate green"
