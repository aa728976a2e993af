"""data_warehouse_hive_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the capabilities of
rendiriz/data-warehouse-hive (a CSV-ingestion + catalog layer over Apache
Hive 4.1.0) as an idiomatic PySpark library, plus the full HiveQL query
surface the reference delegates to Hive, re-expressed as DataFrame/SQL
plans that Catalyst optimizes, plus large-scale training-data-pipeline
extensions (dedup, similarity search, multimodal columns, text analysis).

Layout:
    session      — SparkSession builder tuned for the target scale
    tables       — test-fixture table loaders
    registry     — the query registry (one entry per SURVEY.md §2 operator)
    operators/   — relational operators (filters, joins, aggs, windows, ...)
    functions/   — scalar function families + text analysis
    sources/     — CSV ingestion, catalog DDL, stats profiling, multimodal
    extensions/  — dedup, similarity search
    streaming/   — batch time-windows + structured-streaming helpers
"""

from data_warehouse_hive_spark.registry import REGISTRY, QuerySpec, query

__all__ = ["REGISTRY", "QuerySpec", "query"]
