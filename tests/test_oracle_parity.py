"""Differential test: every registered query with an oracle must match
DuckDB exactly at sf0.01 — the same gate the driver runs."""

import pytest

import __spark_entry__ as entry_mod

from .oracle_util import compare_query

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, sf_oracle, name):
    compare_query(spark, _QUERIES[name], _ORACLES[name], sf_oracle)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, sf_oracle, name):
    df = _QUERIES[name](spark, sf_oracle)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
