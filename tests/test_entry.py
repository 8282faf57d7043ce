"""Smoke tests for the driver contract module."""

from __future__ import annotations

import importlib


def _entry_module():
    return importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"sum_qty", "count_order", "l_returnflag"} <= set(df.columns)


def test_queries_and_oracles_aligned(spark):
    mod = _entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 10
    assert set(oracles) <= set(qs)
    # every callable has the right signature (spark, sf_dir)
    for name, fn in qs.items():
        assert callable(fn), name
