#!/bin/sh
# Slow tier in TWO processes (alphabetical halves). One pytest process
# accumulating every compiled program eventually segfaults inside
# XLA:CPU (see conftest.py) — round 3's added programs moved the crash
# point from "between tiers" to "inside the slow tier", so the slow tier
# now splits too. Each half passes cleanly in its own process.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/test_[a-o]*.py -m slow -q -p no:cacheprovider "$@"
python -m pytest tests/test_[p-z]*.py -m slow -q -p no:cacheprovider "$@"
