#!/usr/bin/env bash
# Canonical test-suite invocations (see CLAUDE.md "Commands").
#
# The slow shard must be run as TWO halves: each half fits one `timeout 580`
# on the 1-core box, the whole shard does not.  This script encodes the split
# so a fresh session can't foot-gun the timeout.
#
# Usage:
#   scripts/run_suite.sh fast    # CPU 8-device mesh, -m "not slow"
#   scripts/run_suite.sh slow    # both slow halves, sequentially
#   scripts/run_suite.sh all     # fast + slow
set -u
cd "$(dirname "$0")/.."

FUSED_SLOW="tests/test_fused_gru.py tests/test_fused_crnn.py tests/test_fused_mdrnn.py tests/test_fused_bwd.py"

run_fast() {
  timeout 580 python -m pytest tests/ -q -m "not slow"
}

run_slow() {
  # Half 1: the four fused-kernel files' slow capacity variants.
  timeout 580 python -m pytest $FUSED_SLOW -q -m slow || return $?
  # Half 2: everything else marked slow (tutorials, multihost, trainer e2e).
  timeout 580 python -m pytest tests/ -q -m slow \
    $(for f in $FUSED_SLOW; do printf -- "--ignore=%s " "$f"; done)
}

case "${1:-fast}" in
  fast) run_fast ;;
  slow) run_slow ;;
  all)  run_fast && run_slow ;;
  *) echo "usage: $0 {fast|slow|all}" >&2; exit 2 ;;
esac
