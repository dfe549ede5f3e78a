"""Freeze the round-5 determinism invariants (SCALE.md §9).

Engine-native ``round(x, n>=1)`` decides on a non-representable decimal
boundary and can differ by one ULP across engines/versions — the r4
``snap_to_segments`` driver-hash failure class. Round 5 eliminated the
class engine-wide; these tests keep it eliminated:

- no registered oracle may contain ``round(expr, n)`` with n >= 1
  (scale-0 fixed-point quantizers are the cross-engine-safe form and
  remain allowed);
- no query-path source file may call ``F.round(expr, n)`` with n >= 1
  (``_rfloor`` is the sanctioned replacement).
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

_QUERY_SOURCES = [
    "filda_spark/relational.py",
    "filda_spark/training.py",
    "filda_spark/fire_queries.py",
]


def _balanced(s, start):
    depth, i = 1, start
    while depth:
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
        i += 1
    return s[start : i - 1], i


def _n_digit_rounds(text, pattern):
    """Occurrences of <pattern>(expr, n) with literal n >= 1."""
    hits = []
    pos = 0
    while True:
        m = re.search(pattern, text[pos:])
        if not m:
            return hits
        inner, after = _balanced(text, pos + m.end())
        work = inner.rstrip()
        if work.endswith(","):
            work = work[:-1]
        depth, comma = 0, -1
        for k, ch in enumerate(work):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                comma = k
        nd = work[comma + 1 :].strip() if comma >= 0 else None
        if nd and nd.isdigit() and nd != "0":
            hits.append(text[pos + m.start() : pos + m.start() + 80])
        pos = after


def test_no_native_round_in_oracles():
    bad = {}
    for name, sql in entry.oracle_sql().items():
        hits = _n_digit_rounds(re.sub(r"\s+", " ", sql), r"\bround\(")
        if hits:
            bad[name] = hits[:2]
    assert not bad, bad


def test_no_f_round_in_query_sources():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bad = {}
    for rel in _QUERY_SOURCES:
        src = open(os.path.join(root, rel)).read()
        hits = _n_digit_rounds(src, r"F\.round\(")
        if hits:
            bad[rel] = hits[:2]
    assert not bad, bad
