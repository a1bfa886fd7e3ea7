#!/bin/bash
# Test tiers (VERDICT r2 #8). Timed evidence for both tiers lives in
# docs/PERF.md ("Test suite budget").
#
#   quick  — the default `pytest -q` subset; budget ~10 min uncontended on a
#            1-core box (~20 min measured next to other CPU work).
#   slow   — the @slow integration tier (train CLI subprocess runs, 2-process
#            jax.distributed, big-shape kernels); this is the release gate.
#   all    — everything.
#
# The whole run holds the compile lock shared with bench.py
# (pcm_tpu/utils/compilelock.py): a pytest run next to an in-flight bench
# compile has SIGKILLed the axon compile helper twice on this 1-core box
# (docs/ROUND4_NOTES.md 16/19), so whichever starts second now waits.
set -e
cd "$(dirname "$0")/.."
LOCK="${PCM_COMPILE_LOCK:-/tmp/pcm_compile.lock}"
run() {
  flock "$LOCK" python -m pytest "$@"
}
case "${1:-quick}" in
  quick) time run -q ;;
  slow)  time run -q -m slow ;;
  all)   time run -q -m "" ;;
  *) echo "usage: $0 [quick|slow|all]" >&2; exit 2 ;;
esac
