"""The core correctness gate, run locally: every registered query with an
oracle must value-match DuckDB exactly (replicating the driver's check).
Queries without an oracle (ddl_* behavioral) must run and return rows."""

from __future__ import annotations

import pytest

from data_warehouse_hive_spark.registry import load_all

REGISTRY = load_all()
ORACLE_IDS = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_IDS = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_IDS)
def test_oracle_match(name, spark, sf_dir, duck):
    from data_warehouse_hive_spark.testing import compare_to_oracle

    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    result = compare_to_oracle(
        name, df, spec.oracle, duck, float_rtol=1e-9 if spec.approx else 0.0
    )
    assert result.ok, str(result)


@pytest.mark.parametrize("name", ROWS_ONLY_IDS)
def test_rows_only_runs(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 1, f"{name} returned no rows"
