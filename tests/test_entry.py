"""Driver-contract smoke: entry() + registry completeness."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_runs_and_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"addr_id", "FULLADDR", "Join_Count"} <= set(df.columns)
    assert all(r.Join_Count == 1 for r in rows)


def test_every_oracle_key_has_query(spark):
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
    assert len(os_) >= 25
