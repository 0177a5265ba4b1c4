#!/bin/bash
# Chunked test-suite runner: one pytest process per test file.
#
# A monolithic `pytest tests/` run accumulates every compiled XLA
# executable of every scene/test in one CPU client; after ~30 min the
# process can die with a segfault (observed in test_polarization after
# 33% of the suite — the same file passes standalone). Fresh processes
# bound the compilation-cache footprint and make one file's crash
# non-fatal to the rest.
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
  echo "=== $f"
  timeout "${PER_FILE_TIMEOUT:-2400}" python -m pytest "$f" -q 2>&1 | tail -2
  rc=${PIPESTATUS[0]}
  if [ "$rc" != 0 ]; then echo "FAILED: $f (rc=$rc)"; fail=1; fi
done
exit $fail
