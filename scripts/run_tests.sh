#!/bin/bash
# Test tiers (VERDICT r2 #8). Timed evidence for both tiers lives in
# docs/PERF.md ("Test suite budget").
#
#   quick  — the default `pytest -q` subset; budget ~10 min on a 1-core box.
#   slow   — the @slow integration tier (train CLI subprocess runs, 2-process
#            jax.distributed, big-shape kernels); this is the release gate.
#   all    — everything.
set -e
cd "$(dirname "$0")/.."
case "${1:-quick}" in
  quick) time python -m pytest -q ;;
  slow)  time python -m pytest -q -m slow ;;
  all)   time python -m pytest -q -m "" ;;
  *) echo "usage: $0 [quick|slow|all]" >&2; exit 2 ;;
esac
