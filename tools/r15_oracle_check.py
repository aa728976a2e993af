#!/usr/bin/env python
"""Exact-oracle spot check for a list of registry ids at one SF.

Usage:
  python tools/r15_oracle_check.py <sf_dir> <id> [<id> ...]

Uses the same compare the full verify drive applies
(testing.compare_to_oracle) on a vanilla-ish session.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = sys.argv[1]
ids = sys.argv[2:]

from data_warehouse_hive_spark.registry import load_all  # noqa: E402
from data_warehouse_hive_spark.session import get_spark  # noqa: E402
from data_warehouse_hive_spark.testing import (  # noqa: E402
    compare_to_oracle,
    duckdb_connection,
)

spark = get_spark(app_name="r15-oracle-check")
registry = load_all()
con = duckdb_connection(sf_dir)
fail = 0
for name in ids:
    spec = registry[name]
    t0 = time.perf_counter()
    if spec.oracle is None:
        df = spec.fn(spark, sf_dir)
        n = df.count()
        print(f"[ROWS-ONLY] {name}: {n} rows "
              f"({time.perf_counter()-t0:.2f}s)", flush=True)
        continue
    res = compare_to_oracle(name, spec.fn(spark, sf_dir), spec.oracle, con)
    dt = time.perf_counter() - t0
    if res.ok:
        print(f"[PASS] {name} ({dt:.2f}s)", flush=True)
    else:
        fail += 1
        print(f"[FAIL] {name} ({dt:.2f}s): {'; '.join(res.problems)[:400]}",
              flush=True)
sys.exit(1 if fail else 0)
