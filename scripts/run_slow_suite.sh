#!/bin/sh
# The B2M_SLOW_TESTS-gated heavyweight tests. The canonical runner (and the
# per-round committed artifact SLOW_r{N}.json) is scripts/run_slow_suite.py;
# this wrapper just delegates so the test list lives in ONE place.
set -e
cd "$(dirname "$0")/.."
exec python scripts/run_slow_suite.py "$@"
