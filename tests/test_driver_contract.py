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
    dataset_names = set()
    for name, fn in qs.items():
        try:
            res = fn(SF)
            if isinstance(res, rd.Dataset):
                dataset_names.add(name)
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
    # scale-shape pin: queries whose OUTPUT scales with the corpus must
    # return lazy Datasets (distributed sort; the harness materializes),
    # never a driver-side DataFrame — a regression here reintroduces a
    # corpus-sized driver collect
    corpus_sized = {
        "doc_tokens", "doc_quality", "lang_id", "pii_mask", "fingerprint",
        "sample_docs", "stratified_sample", "tfidf_topk", "decontamination",
        "exact_dedup", "jaccard_pairs", "shingle_pairs", "minhash_pairs",
        "simhash_pairs", "dedup_clusters", "events_hourly", "user_sessions",
        "event_followers", "asof_latest_order", "running_spend",
        "customers_without_orders", "parts_ordered_large",
        "embed_ann_lsh", "embed_ann_ivf", "embed_kmeans", "media_features",
    }
    missing = corpus_sized - set(qs)
    assert not missing, f"pinned queries vanished: {missing}"
    not_lazy = corpus_sized - dataset_names
    assert not not_lazy, f"corpus-sized queries not lazy Datasets: {not_lazy}"


def test_oracle_sql_entries_are_nonempty_select_statements():
    import importlib

    e = importlib.import_module("__ray_entry__")
    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_gate_order_covers_every_query():
    """Every registered query must appear in the cheapest-first gate
    order (a new query left out of _GATE_ORDER silently runs LAST,
    which is usually wrong for an SQL-checked query), and the order
    must not name queries that no longer exist."""
    import importlib

    e = importlib.import_module("__ray_entry__")
    qs = set(e.queries())
    order = e._GATE_ORDER
    assert len(order) == len(set(order)), "duplicate names in _GATE_ORDER"
    missing = qs - set(order)
    assert not missing, f"queries missing from _GATE_ORDER: {sorted(missing)}"
    stale = set(order) - qs
    assert not stale, f"_GATE_ORDER names unknown queries: {sorted(stale)}"
    # SQL-checked queries must enumerate before every rows-only query
    oracles = set(e.oracle_sql())
    seen_rows_only = False
    for name in order:
        if name in oracles:
            assert not seen_rows_only, \
                f"SQL-checked {name!r} enumerates after a rows-only query"
        else:
            seen_rows_only = True


def test_gate_order_matches_registry(ray_session) -> None:
    """Every _GATE_ORDER name is a registered query and every registered
    query has a gate position — a misspelled registration would
    silently fall to the tail of the driver gate otherwise."""
    import __ray_entry__ as e

    qs = set(e.queries())
    gate = list(e._GATE_ORDER)
    assert len(gate) == len(set(gate)), "duplicate gate entries"
    missing_from_registry = set(gate) - qs
    assert not missing_from_registry
    unordered = qs - set(gate)
    assert not unordered, f"queries missing a gate position: {unordered}"


def test_oracles_are_subset_of_queries(ray_session) -> None:
    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    assert set(sql) <= set(qs)
    # every oracle is non-trivial SQL mentioning at least one table/view
    for k, s in sql.items():
        assert isinstance(s, str) and "SELECT" in s.upper(), k
