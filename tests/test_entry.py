"""Driver-contract tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_contract_shapes():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 70
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_queries_accept_sf_dir(spark, sf_dir):
    qs = entry_mod.queries()
    df = qs["q_count_star"](spark, sf_dir)
    assert df.collect()[0]["n_rows"] > 0


def test_parameterized_sql(spark, sf_dir):
    """Parameterized spark.sql (named placeholders) — the injection-safe
    templating surface for programmatic query construction; equals the
    literal-inlined query."""
    from data_warehouse_hive_spark.tables import t

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_param")
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM orders_param "
        "WHERE o_orderstatus = :status AND o_totalprice > :floor",
        args={"status": "F", "floor": 1000.0},
    ).collect()[0]["n"]
    want = spark.sql(
        "SELECT COUNT(*) AS n FROM orders_param "
        "WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0"
    ).collect()[0]["n"]
    assert got == want and got > 0


def test_ddl_results_survive_reexecution(spark, sf_dir):
    """Every ddl_* fn tears down its scratch tables/views before
    returning; the returned DataFrame must therefore be LOCALIZED (not a
    lazy plan over the dropped objects), because the external driver
    re-executes it (.count()) after the fn returned.  Regression for
    ddl_view_masked, which returned a lazy aggregate over a dropped
    managed table and died with FILE_NOT_EXIST on re-execution."""
    qs = entry_mod.queries()
    for name in sorted(n for n in qs if n.startswith("ddl_view")):
        df = qs[name](spark, sf_dir)
        assert df.count() == df.count() >= 1, name


def test_driver_sim_list_lockstep():
    """r6 verdict item 6: the in-repo driver-sim must derive its driven
    list FROM the registry (every queries() id), not from a hardcoded
    tuple, so a future id can never silently miss both the external
    driver's 50-id alphabetical window and the local sim gate."""
    import pathlib

    sim = (
        pathlib.Path(__file__).resolve().parents[1]
        / ".claude"
        / "skills"
        / "verify"
        / "drive_entry.py"
    )
    src = sim.read_text()
    assert "driven = sorted(n for n in qs if n in os_)" in src
    assert "rows_only = sorted(n for n in qs if n not in os_)" in src
    # no stale hardcoded id tuple may drive the loop
    assert 'for name in ("q_' not in src
