"""Oracle-comparison harness — a local replica of the driver's check.

For each registered query: run the Spark plan and the DuckDB oracle on the
same parquet fixtures, then compare row count, column names/order-
insensitive schema, and exact values (rows sorted by a total order).  Used
by tests/ so any cross-engine mismatch is caught before the driver runs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pandas as pd

from data_warehouse_hive_spark.tables import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the fixture tables registered as views, mirroring
    the driver's pre-registered view names."""
    import os

    con = duckdb.connect()
    for name in TABLES:
        path = table_path(sf_dir, name)
        # Spark sinks write `<name>.parquet` as a DIRECTORY of part files
        # (e.g. the tools/scale_step.py sf1 fixtures); the driver's own
        # fixtures are single files.  DuckDB needs the glob form for dirs.
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_cell(v):
    """Normalize one value to a comparable, hashable form."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, datetime):
        # dates and midnight-timestamps normalize identically: DuckDB's
        # pandas bridge widens DATE → datetime64, so a Spark DateType column
        # otherwise never compares equal to its oracle DATE column.
        return ("t", v.replace(tzinfo=None).isoformat(timespec="microseconds"))
    if isinstance(v, date):
        return ("t", datetime(v.year, v.month, v.day).isoformat(timespec="microseconds"))
    if isinstance(v, bytes):
        return ("b", v.hex())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("arr", tuple(_norm_cell(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _norm_cell(x)) for k, x in v.items())))
    return v


def _normalize(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return cols, rows


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    problems: list[str] = field(default_factory=list)

    def __str__(self) -> str:  # pragma: no cover
        status = "OK" if self.ok else "MISMATCH"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for p in self.problems:
            msg += f"\n    {p}"
        return msg


def compare_to_oracle(
    name: str,
    spark_df,
    oracle: str,
    con: duckdb.DuckDBPyConnection,
    float_rtol: float = 0.0,
) -> CompareResult:
    spark_pdf = spark_df.toPandas()
    oracle_pdf = con.execute(oracle).fetchdf()

    problems: list[str] = []
    s_cols, s_rows = _normalize(spark_pdf)
    o_cols, o_rows = _normalize(oracle_pdf)

    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
    else:
        # int-vs-float dtype drift (e.g. DuckDB widening SUM to HUGEINT,
        # which its pandas bridge lands as float64) passes a value-equal
        # compare (448 == 448.0) but can fail a strict schema check —
        # surface it here.  Only the i/f kind pair is flagged: other kind
        # differences (object vs datetime64 bridges) are legitimate.
        for c in s_cols:
            ks, ko = spark_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind
            if {ks, ko} == {"i", "f"}:
                problems.append(
                    f"dtype drift on {c!r}: spark={spark_pdf[c].dtype} "
                    f"oracle={oracle_pdf[c].dtype} — cast the wider side"
                )
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    if not problems:
        # Driver-hasher replica: its pandas sort_values canonicalization
        # must neither crash (unhashable cells) nor disagree.  Skipped when
        # a float tolerance is in play — bit-differing floats legitimately
        # hash apart there.
        if float_rtol == 0.0:
            try:
                s_hash = _driver_canon(spark_pdf)
                o_hash = _driver_canon(oracle_pdf)
            except TypeError as exc:
                problems.append(f"driver-canon crash: {exc!r}")
            else:
                if s_hash != o_hash:
                    problems.append("driver-canon hash mismatch")
    if not problems:
        n_bad = 0
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            if sr == orow:
                continue
            if float_rtol > 0 and _rows_close(sr, orow, float_rtol):
                continue
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={sr!r} oracle={orow!r}")
        if n_bad > 3:
            problems.append(f"... {n_bad} mismatched rows total")
    return CompareResult(
        name=name,
        ok=not problems,
        spark_rows=len(s_rows),
        oracle_rows=len(o_rows),
        problems=problems,
    )


def _driver_canon(df: pd.DataFrame) -> int:
    """Replica of the external driver's canonicalization: sort the frame by
    every column with pandas ``sort_values`` (which factorizes object
    columns — any unhashable cell raises, exactly as observed in the
    driver), then hash the canonical cell sequence.  Run on both sides so
    hazards surface locally before the driver hits them."""
    cols = sorted(df.columns)
    canon = df[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    acc = []
    for row in canon.itertuples(index=False, name=None):
        acc.append(tuple(_norm_cell(v) for v in row))
    return hash(tuple(acc))


def _rows_close(a: tuple, b: tuple, rtol: float) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=rtol, abs_tol=rtol):
                return False
        elif x != y:
            return False
    return True
