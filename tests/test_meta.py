"""Meta checks: keep the documentation's suite-size claims honest.

VERDICT r4 item 8: README/RESULTS drifted from the live suite twice
(rounds 3 and 4). The docs now carry the count ONLY in the exact phrase
"NNN-test suite"; this test compares every occurrence against the real
collected size (stashed by conftest before any -m/-k/mapguard
filtering), so adding a test without updating the docs fails loudly.
"""

import os
import re

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DOCS = ("README.md", "RESULTS.md",
         os.path.join(".claude", "skills", "verify", "SKILL.md"))


def test_documented_suite_count_matches_collected(request):
    cfg = request.config
    if cfg.getoption("-m") or cfg.getoption("-k"):
        pytest.skip("subset run; checked on full-suite collections only")
    # invocations naming individual files/nodes are subset runs too
    for a in cfg.args:
        if not os.path.isdir(a.split("::")[0]):
            pytest.skip("subset run (file/node args)")
    if getattr(cfg, "_mapguard_resumed", False):
        pytest.skip("mapguard resume segment (partial collection)")
    collected = getattr(cfg, "_full_collection_count", None)
    if collected is None:
        pytest.skip("collection count not recorded")

    claims = []
    for rel in _DOCS:
        path = os.path.join(_ROOT, rel)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            text = f.read()
        for m in re.finditer(r"(\d+)-test suite", text):
            claims.append((rel, int(m.group(1))))
    assert claims, "no 'NNN-test suite' claim found in the docs"
    wrong = [(rel, n) for rel, n in claims if n != collected]
    assert not wrong, (
        f"suite is {collected} tests but docs claim {wrong}; update the "
        f"'NNN-test suite' phrases (README.md, verify skill)")
