"""Driver-contract smoke: every registered query must RUN.

The driver imports ``__ray_entry__`` with an ambient Ray session and
calls each ``queries()`` entry at small scale; a single broken registry
entry fails the whole correctness gate, so this sweep is the cheapest
high-value test in the suite.  Value correctness is covered by
``tools/sqlcheck.py`` / the driver's DuckDB comparison."""

import sys

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_every_registered_query_runs():
    import importlib

    import ray.data as rd

    e = importlib.import_module("__ray_entry__")
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query"
    failures = {}
    for name, fn in qs.items():
        try:
            res = fn(SF)
            if isinstance(res, rd.Dataset):
                n = res.count()
            elif isinstance(res, pa.Table):
                n = res.num_rows
            else:
                assert isinstance(res, pd.DataFrame), type(res)
                n = len(res)
            assert n >= 0
        except Exception as exc:            # noqa: BLE001 — collect all
            failures[name] = repr(exc)[:200]
    assert not failures, failures


def test_oracle_sql_entries_are_nonempty_select_statements():
    import importlib

    e = importlib.import_module("__ray_entry__")
    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
