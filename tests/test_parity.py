"""Differential oracle parity: every registered query with an oracle must
match DuckDB on the same parquet inputs (mirrors the driver's t2 gate)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinejobs_indexer_spark import registry  # noqa: E402

from parity import assert_frames_match  # noqa: E402

registry.load_all()
ORACLE_NAMES = sorted(registry.ORACLE)
ROWS_ONLY_NAMES = sorted(set(registry.QUERIES) - set(registry.ORACLE))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, ddb, sf_dir, name):
    sdf = registry.QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    duck_pdf = ddb.execute(registry.ORACLE[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only(spark, sf_dir, name):
    sdf = registry.QUERIES[name](spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_entry(spark):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    keys = set(e.queries())
    oracle = e.oracle_sql()
    assert set(oracle) <= keys
