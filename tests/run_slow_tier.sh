#!/bin/sh
# Slow tier. Historically this split the tier into alphabetical-half
# processes to dodge the "cumulative XLA:CPU segfault"; the root cause is
# now confirmed (vm.max_map_count exhaustion by per-kernel JIT mappings —
# utils/hostlimits.py) and handled by conftest (raises the ceiling when
# privileged) + tests/run_suite.sh (map-budget resume fallback), so this
# is a thin wrapper kept for compatibility.
exec sh "$(dirname "$0")/run_suite.sh" -m slow -q "$@"
