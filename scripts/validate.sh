#!/usr/bin/env bash
# Mandatory end-of-round validation: run EVERY test (smoke + every slow
# proof suite) + the driver-artifact compile checks BEFORE any
# end-of-round snapshot. Round 3 shipped two red flagship tests, and
# round 4 shipped a red robustness test, because the forcing function
# was a hand-picked list that drifted from the test tree (VERDICT r4
# Weak #2). There is no enumerated list left to drift: the slow pass is
# `-m slow` over the whole tree, so a new proof test is inside the net
# the moment it is written.
#
# Usage:  scripts/validate.sh          # full: smoke + ALL slow (~1 h warm)
#         scripts/validate.sh --smoke  # fast subset only (~5 min warm)
#
# Exit code is nonzero if ANY gate fails.
set -u
cd "$(dirname "$0")/.."

FAILED=0
run() {
  echo "==== $*"
  "$@" || { echo "VALIDATE FAIL: $*"; FAILED=1; }
}

# Like `run`, but pytest exit code 5 (no tests collected — a file with
# no slow tests) counts as success.
run_pytest_ok5() {
  echo "==== $*"
  "$@"
  rc=$?
  if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then
    echo "VALIDATE FAIL: $*"; FAILED=1
  fi
}

# Smoke suite first (fast, broad).
run python -m pytest tests/ -q -m "not slow"

if [ "${1:-}" != "--smoke" ]; then
  # ALL slow proof suites — no enumerated list (the glob IS the list,
  # so a new proof test is inside the net the moment it is written).
  # One pytest PROCESS PER FILE: a single process accumulates every
  # suite's compiled XLA programs and has been observed to exhaust
  # 128 GB and segfault inside LLVM mid-run.
  for f in tests/test_*.py; do
    run_pytest_ok5 python -m pytest "$f" -q -m slow
  done
fi

# Driver artifacts compile-check (CPU; the real-chip numbers come from
# the round driver).
run python - <<'EOF'
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import __graft_entry__ as g
fn, args = g.entry()
import jax
jax.jit(fn).lower(*args).compile()
g.dryrun_multichip(8)
print("graft entry + dryrun_multichip OK")
EOF

if [ $FAILED -ne 0 ]; then
  echo "VALIDATION FAILED — do not snapshot this commit."
else
  echo "ALL VALIDATION GATES GREEN."
fi
exit $FAILED
