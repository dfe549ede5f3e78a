"""Enforced replica of the driver's 50-row correctness window (r4 ADVICE
item 3: the full-registry ``scripts/check_parity.py`` replays were a
*procedural* compensating control for the oversubscribed rotation window —
this wires the window itself into CI so a regression in any query the NEXT
driver run will score cannot land silently).

Runs each of the first 50 ``__spark_entry__.queries()`` entries (the exact
set the driver will gate this round, by construction of ``_ordered``)
against its DuckDB oracle at sf0.01 — the driver's correctness scale —
using the dtype-class-sensitive ``filda_spark.compare.compare``.  The full
348-query replica stays in ``scripts/check_parity.py`` (too slow for every
CI run); this test covers the scored subset on every ``pytest`` invocation.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from filda_spark.compare import compare, duckdb_con  # noqa: E402

_WINDOW = 50


def _window_names():
    return list(entry.queries())[:_WINDOW]


@pytest.fixture(scope="module")
def oracle_con(sf_correct):
    con = duckdb_con(sf_correct)
    yield con
    con.close()


@pytest.mark.parametrize("name", _window_names())
def test_driver_window_parity(name, spark, sf_correct, oracle_con):
    fn = entry.queries()[name]
    sql = entry.oracle_sql().get(name)
    if sql is None:
        n = fn(spark, sf_correct).count()
        assert n >= 0  # rows-only entry: smoke the plan end-to-end
        return
    issues = compare(fn(spark, sf_correct), oracle_con.sql(sql).df())
    assert not issues, f"{name}: {issues[:3]}"
