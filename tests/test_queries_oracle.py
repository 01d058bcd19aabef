"""Every inventory query with an oracle must hash-match DuckDB at smoke SF.

This mirrors the driver's t2 gate (see __spark_entry__.py docstring) so a
red test here means a red CORRECTNESS_r{N}.json entry.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare, duck_con

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    res = compare(df, con, ORACLES[name])
    assert res["colnames_match"], res
    assert res["rowcount_match"], res
    assert res["values_match"], res
