"""Catalog operations — the reference's table-management surface, on
`spark.catalog` / `spark.sql` (reference citations per function).

These are metadata-only operations: none of them touch data files except
`table_info`'s row count (which the reference also runs — the only real
query its backend ever issues, backend/hive_manager.py:400-401).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


def show_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """SHOW TABLES (reference backend/app.py:186-195)."""
    return [t.name for t in spark.catalog.listTables(database)]


def table_exists(spark: SparkSession, name: str) -> bool:
    """SHOW TABLES LIKE '<name>' existence check
    (reference backend/hive_manager.py:105-118)."""
    return spark.catalog.tableExists(name)


def drop_table(spark: SparkSession, name: str, if_exists: bool = True) -> bool:
    """DROP TABLE [IF EXISTS] — for external tables this removes metadata
    only, data files stay (reference backend/hive_manager.py:120-133)."""
    existed = table_exists(spark, name)
    clause = "IF EXISTS " if if_exists else ""
    spark.sql(f"DROP TABLE {clause}`{name}`")
    return existed


def describe(spark: SparkSession, name: str) -> list[dict[str, str]]:
    """DESCRIBE — column name/type/comment rows
    (reference backend/hive_manager.py:396-407)."""
    return [
        {"col_name": c.name, "data_type": c.dataType, "comment": c.description or ""}
        for c in spark.catalog.listColumns(name)
    ]


def repair_table(spark: SparkSession, name: str) -> None:
    """MSCK REPAIR TABLE / partition re-sync after external file changes
    (reference backend/hive_manager.py:334-349, invoked backend/app.py:98).
    For unpartitioned external tables REFRESH drops the stale file-listing
    cache; for partitioned ones recoverPartitions re-syncs the metastore."""
    try:
        spark.catalog.recoverPartitions(name)
    except Exception:
        # unpartitioned tables: only the file cache needs refreshing
        pass
    spark.sql(f"REFRESH TABLE `{name}`")


@dataclass
class TableInfo:
    name: str
    columns: list[dict[str, str]]
    row_count: int
    is_external: bool
    location: str | None


def table_info(spark: SparkSession, name: str) -> TableInfo:
    """Schema + row count + external flag (reference
    backend/app.py:204-216 → backend/hive_manager.py:386-418: DESCRIBE,
    SELECT COUNT(*), DESCRIBE FORMATTED + 'EXTERNAL' scrape)."""
    cols = describe(spark, name)
    row_count = spark.table(name).count()
    detail = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED `{name}`").collect()
        if r["col_name"]
    }
    table_type = (detail.get("Type") or "").upper()
    return TableInfo(
        name=name,
        columns=cols,
        row_count=row_count,
        is_external=table_type == "EXTERNAL",
        location=detail.get("Location"),
    )


def health_check(spark: SparkSession) -> dict[str, bool]:
    """Connectivity self-check: SELECT 1 + catalog reachability (reference
    backend/app.py:120-147, backend/hive_manager.py:150-154)."""
    ok_engine = spark.sql("SELECT 1 AS ok").collect()[0]["ok"] == 1
    ok_catalog = isinstance(spark.catalog.currentDatabase(), str)
    return {"engine": ok_engine, "catalog": ok_catalog}
