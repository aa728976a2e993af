#!/usr/bin/env python
"""Capture .explain('formatted') for a list of registry ids into
plans/r15/<id>_<suffix>.txt.

Usage:
  python tools/r15_capture_plans.py <repo_root> <suffix> <id> [<id> ...]

<repo_root> lets the same script snapshot BEFORE plans from a HEAD
archive (e.g. /tmp/repo_head) and AFTER plans from the working tree —
the captured package is whichever root is first on sys.path.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

root = sys.argv[1]
suffix = sys.argv[2]
ids = sys.argv[3:]
sys.path.insert(0, root)

from data_warehouse_hive_spark.registry import load_all  # noqa: E402
from data_warehouse_hive_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = "/root/repo/plans/r15"
os.makedirs(OUT_DIR, exist_ok=True)

spark = get_spark(app_name=f"r15-plans-{suffix}")
registry = load_all()
for name in ids:
    df = registry[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(f"# {name} — {suffix} ({root}) @ {SF_DIR}\n")
        f.write(buf.getvalue())
    print("wrote", path, flush=True)
