"""Driver-contract registry invariants (no SparkSession needed).

Round-2 lesson: the driver's correctness harness evaluates exactly the
first 50 registry entries; 56 were registered and 6 shipped unverified.
These checks fail pytest before that can happen again.
"""

import __spark_entry__ as entry


def test_registry_fits_driver_window():
    qs = entry.queries()
    assert len(qs) <= entry.DRIVER_WINDOW


def test_priority_queries_lead_the_registry():
    names = list(entry.queries())
    assert names[: len(entry.PRIORITY)] == entry.PRIORITY


def test_every_query_has_an_oracle():
    qs, sqls = entry.queries(), entry.oracle_sql()
    missing = [n for n in qs if n not in sqls]
    # every registered query is DuckDB-oracled (none rely on the weaker
    # rows-only check); keep it that way
    assert not missing


def test_queries_and_oracles_align():
    qs, sqls = entry.queries(), entry.oracle_sql()
    assert set(sqls) <= set(qs)
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in sqls.values())
