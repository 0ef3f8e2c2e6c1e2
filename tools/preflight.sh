#!/usr/bin/env bash
# Pre-commit / pre-snapshot guard (round-3 process fix, VERDICT.md r2 item 2).
#
# Round 2 shipped a snapshot whose TEST module did not compile, silently
# disabling all suites. This script is the checklist step that prevents that
# class of breakage: run it before every snapshot commit.
#
#   tools/preflight.sh          # compile main + test, run the full suite
#   tools/preflight.sh fast     # compile-only (mid-round sanity)
#
# Exits non-zero on any compile error or test failure.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[preflight] sbt Test/compile"
sbt -batch "Test/compile"

if [[ "${1:-}" != "fast" ]]; then
  echo "[preflight] sbt test"
  sbt -batch test
fi
echo "[preflight] OK"
