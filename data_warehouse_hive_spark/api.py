"""Endpoint-parity facade — the reference's REST API as library calls.

The reference exposes six HTTP routes on a Sanic service
(reference backend/app.py): POST /process-csv (:32-118),
GET /health (:120-147), GET /schema/<key> (:149-180),
GET /tables (:182-202), GET /table/<name>/info (:204-216), and
DELETE /table/<name> (:218-234).  SURVEY §7 collapses that 3-process
HTTP/Thrift topology into in-process library calls; this module closes
the last parity gap by exposing each route under its own name with the
reference's exact RESPONSE SHAPE (same top-level keys, same nesting), so
a client of the reference can port by swapping the HTTP call for a
function call and keep its response handling unchanged.

No HTTP server is started — transport was never the product; the
payloads were.  Each function delegates to the library twin that the
registry/tests already exercise (sources/csv_ingest.py, sources/stats.py,
sources/catalog.py).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession

from data_warehouse_hive_spark.sources import catalog as _catalog
from data_warehouse_hive_spark.sources.csv_ingest import (
    infer_csv_schema,
    ingest_csv,
)
from data_warehouse_hive_spark.sources.stats import column_stats

# Spark → Hive DDL type names (SURVEY §1.2 map, reference
# backend/hive_manager.py:42-67; Spark simpleString values on the left).
_SPARK_TO_HIVE = {
    "tinyint": "TINYINT",
    "smallint": "SMALLINT",
    "int": "INT",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "string": "STRING",
}


def _hive_type(spark_type: str) -> str:
    return _SPARK_TO_HIVE.get(spark_type, "STRING")


def process_csv(
    spark: SparkSession,
    path: str,
    table_name: str | None = None,
    *,
    has_header: bool = True,
    validate: bool = True,
    strict: bool = False,
    drop_if_exists: bool = False,
) -> dict[str, Any]:
    """POST /process-csv twin (reference backend/app.py:32-118, success
    payload :100-111): ingest a CSV into an external table and return the
    reference-shaped response.

    Like the reference's pipeline (which runs Pandera validation between
    inference and table creation, backend/app.py:61-98 step comments),
    the payload carries a `validation` block — per-column nullability +
    type-domain conformance over the declared schema.  `strict=True`
    aborts on violations the way a pandera SchemaError aborts the
    reference's processing.

    `drop_if_exists` mirrors the reference's request field of the same
    name (backend/app.py:51, applied at :80-84): True drops and
    re-creates, so a re-uploaded CSV with a corrected schema is served
    fresh.  False (the default, as in the reference) fails loudly on an
    existing table.  One deliberate divergence stays documented here: on
    DDL failure the reference retries under a generated
    `csv_data_<timestamp>` name (backend/hive_manager.py:194-217); we
    raise instead — fail-fast beats nondeterministic table names (the
    bug family SURVEY §1.3 documents)."""
    result = ingest_csv(
        spark, path, table_name, header=has_header,
        validate=validate, strict=strict, replace=drop_if_exists,
    )
    size_mb = None
    try:
        size_mb = round(os.path.getsize(path) / (1024 * 1024), 2)
    except OSError:
        pass
    return {
        "status": "success",
        "message": f"Successfully created external table for {path}",
        "table_name": result.table_name,
        "table_type": "external",
        "location": result.location,
        "schema_columns": len(result.columns),
        "columns": [
            {"name": c["name"], "type": c["spark_type"]} for c in result.columns
        ],
        "sample_file_size_mb": size_mb,
        "has_header": has_header,
        "validation": result.validation,
    }


def health(spark: SparkSession) -> dict[str, Any]:
    """GET /health twin (reference backend/app.py:120-147): per-backend
    connection statuses under a `connections` map.  The reference probes
    S3 + Hive; here the two backends are the execution engine (SELECT 1)
    and the catalog."""
    checks = _catalog.health_check(spark)
    return {
        "status": "healthy" if all(checks.values()) else "degraded",
        "service": "data-warehouse-hive-spark",
        "connections": {
            k: "connected" if ok else "error" for k, ok in checks.items()
        },
    }


def schema_preview(
    spark: SparkSession,
    path: str,
    *,
    has_header: bool = True,
    sample_rows: int = 1000,
) -> dict[str, Any]:
    """GET /schema/<key> twin (reference backend/app.py:149-180):
    bounded-sample schema inference + per-column type map + statistics.
    The sample cap mirrors MAX_SAMPLE_SIZE (reference backend/config.py:26)."""
    schema, delim = infer_csv_schema(spark, path, header=has_header)
    sample = (
        spark.read.csv(path, header=has_header, sep=delim, schema=schema)
        .limit(sample_rows)
    )
    n_sample = sample.count()
    stats = column_stats(sample)
    return {
        "key": path,
        "sample_rows": n_sample,
        "columns": len(schema.fields),
        "schema": {
            f.name: {
                "spark_type": f.dataType.simpleString(),
                "hive_type": _hive_type(f.dataType.simpleString()),
            }
            for f in schema.fields
        },
        "statistics": stats,
    }


def table_info(spark: SparkSession, table_name: str) -> dict[str, Any]:
    """GET /table/<name>/info twin (reference backend/app.py:204-216 →
    backend/hive_manager.py:386-418): DESCRIBE + COUNT(*) + external
    flag, keyed exactly like the reference's payload."""
    info = _catalog.table_info(spark, table_name)
    return {
        "table_name": table_name,
        "sanitized_name": info.name,
        # reference emits [{"name", "type"}] pairs (hive_manager.py:410)
        "columns": [
            {"name": c.get("col_name", c.get("name")),
             "type": c.get("data_type", c.get("type"))}
            for c in info.columns
        ],
        "row_count": info.row_count,
        "is_external": info.is_external,
    }


def list_tables(spark: SparkSession) -> dict[str, Any]:
    """GET /tables twin (reference backend/app.py:182-202): the table
    names in the current database under the reference's exact keys —
    `database` (reference config.HIVE_DATABASE, backend/config.py:22;
    here the session's current catalog database), `tables`, `count`.
    Error branch mirrors :197-202 ({"error": "Failed to list tables:
    ..."})."""
    try:
        names = _catalog.show_tables(spark)
        return {
            "database": spark.catalog.currentDatabase(),
            "tables": names,
            "count": len(names),
        }
    except Exception as ex:  # noqa: BLE001 — the error IS the payload
        return {"error": f"Failed to list tables: {ex}"}


def drop_table(spark: SparkSession, table_name: str) -> dict[str, Any]:
    """DELETE /table/<name> twin (reference backend/app.py:218-234 →
    backend/hive_manager.py:120-139): drop and return the reference's
    success payload verbatim; failures map to the :229-234 error shape.
    Like the reference's `DROP TABLE IF EXISTS`, dropping a missing
    table is a success."""
    try:
        _catalog.drop_table(spark, table_name, if_exists=True)
        return {
            "status": "success",
            "message": f"Table {table_name} dropped successfully",
        }
    except Exception as ex:  # noqa: BLE001 — the error IS the payload
        return {"error": f"Failed to drop table: {ex}"}


# ---------------------------------------------------------------------------
# Upload-status polling twin
# (reference frontend/apps/web/src/app/api/upload-status/[id]/route.ts:1-60:
# the tus S3 store's upload metadata carries processing_status /
# processing_error / processing_completed_at; the route maps them to
# success / error / unknown payloads).  Here the store is in-process —
# the transport was never the product — with the same states and the
# same response shapes.
# ---------------------------------------------------------------------------

_UPLOADS: dict[str, dict[str, Any]] = {}


def process_csv_tracked(
    spark: SparkSession,
    path: str,
    table_name: str | None = None,
    *,
    upload_id: str | None = None,
    has_header: bool = True,
) -> str:
    """POST /process-csv with status tracking: registers the upload,
    runs the ingest, and records success (with completion timestamp) or
    the failure message — poll with `upload_status(upload_id)`.
    Returns the upload id."""
    import time as _time
    import uuid as _uuid

    uid = upload_id or _uuid.uuid4().hex
    _UPLOADS[uid] = {"processing_status": "processing"}
    try:
        result = process_csv(
            spark, path, table_name, has_header=has_header
        )
        _UPLOADS[uid] = {
            "processing_status": "success",
            "processing_completed_at": _time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", _time.gmtime()
            ),
            "result": result,
        }
    except Exception as ex:  # noqa: BLE001 — the error IS the payload
        _UPLOADS[uid] = {
            "processing_status": "error",
            "processing_error": str(ex),
        }
    return uid


def upload_status(upload_id: str) -> dict[str, Any]:
    """GET /api/upload-status/<id> twin — same branch order as the
    reference route: not-found error, processing_error, success with
    completedAt, else unknown."""
    meta = _UPLOADS.get(upload_id)
    if meta is None:
        return {"error": "Upload not found"}
    if meta.get("processing_error"):
        return {
            "status": "error",
            "error": meta["processing_error"],
            "uploadId": upload_id,
        }
    if meta.get("processing_status") == "success":
        return {
            "status": "success",
            "uploadId": upload_id,
            "completedAt": meta.get("processing_completed_at"),
        }
    return {
        "status": "unknown",
        "uploadId": upload_id,
        "message": "Processing status unknown",
    }
