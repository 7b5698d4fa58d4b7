"""Driver-contract smoke tests for __spark_entry__."""

import __spark_entry__ as E

from conftest import SF_SMOKE


def test_entry_runs(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"query_set_id", "rank", "data_set_id", "score"} <= set(df.columns)


def test_queries_and_oracles_aligned(spark):
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query at least runs and returns a stable schema at smoke scale
    for name, fn in qs.items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        assert df.count() >= 0, name
