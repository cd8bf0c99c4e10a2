#!/bin/bash
# Run the test suite and record a CI-style log in tests/LAST_RUN.log
# (VERDICT r2 #8: a documented green run must live in the repo).
#
#   tools/run_suite.sh fast   -> -m "not slow" subset (default)
#   tools/run_suite.sh full   -> everything incl. e2e
set -u
cd "$(dirname "$0")/.."
MODE="${1:-fast}"
ARGS=(-q)
[ "$MODE" = fast ] && ARGS+=(-m "not slow")
LOG=tests/LAST_RUN.log
{
  echo "# pytest $MODE run @ $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "# commit: $(git rev-parse --short HEAD 2>/dev/null || echo '?')"
  python -m pytest tests/ "${ARGS[@]}" 2>&1
  echo "# exit: $?"
} | tee "$LOG"
