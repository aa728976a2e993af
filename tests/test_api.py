"""Endpoint-parity facade: each reference route's library twin returns
the reference's response SHAPE (top-level keys + nesting), so a client
ports by swapping the HTTP call for a function call."""

from __future__ import annotations

import os

from data_warehouse_hive_spark import api


def _write_csv(tmp_path):
    p = str(tmp_path / "people.csv")
    with open(p, "w") as f:
        f.write("id,name,score,joined\n")
        f.write("1,alice,9.5,2024-01-02\n")
        f.write("2,bob,7.25,2024-02-03\n")
        f.write("3,carol,8.0,2024-03-04\n")
    return p


def test_process_csv_response_shape(spark, tmp_path):
    p = _write_csv(tmp_path)
    out = api.process_csv(spark, p, "api_people")
    # reference success payload keys (backend/app.py:100-111)
    assert out["status"] == "success"
    assert out["table_name"] == "api_people"
    assert out["table_type"] == "external"
    assert out["schema_columns"] == 4
    assert {c["name"] for c in out["columns"]} == {"id", "name", "score", "joined"}
    assert out["has_header"] is True and out["sample_file_size_mb"] is not None
    # and the table actually answers queries
    assert spark.table("api_people").count() == 3
    spark.sql("DROP TABLE IF EXISTS api_people")


def test_health_shape(spark):
    out = api.health(spark)
    assert out["status"] == "healthy"
    assert set(out["connections"]) == {"engine", "catalog"}
    assert all(v == "connected" for v in out["connections"].values())


def test_schema_preview_shape(spark, tmp_path):
    p = _write_csv(tmp_path)
    out = api.schema_preview(spark, p)
    assert out["sample_rows"] == 3 and out["columns"] == 4
    assert out["schema"]["id"]["hive_type"] in ("INT", "BIGINT")
    assert out["schema"]["score"]["hive_type"] == "DOUBLE"
    assert out["schema"]["name"]["hive_type"] == "STRING"
    assert out["schema"]["joined"]["hive_type"] == "DATE"
    assert "id" in out["statistics"] and "null_count" in str(out["statistics"]["id"]) or out["statistics"]["id"]


def test_table_info_shape(spark, tmp_path):
    p = _write_csv(tmp_path)
    api.process_csv(spark, p, "api_info_t")
    try:
        out = api.table_info(spark, "api_info_t")
        assert out["row_count"] == 3
        assert out["is_external"] is True
        assert {c["name"] for c in out["columns"]} >= {"id", "name"}
        assert out["sanitized_name"] == "api_info_t"
    finally:
        spark.sql("DROP TABLE IF EXISTS api_info_t")


def test_upload_status_lifecycle(spark, tmp_path):
    """Reference upload-status contract: success path carries
    completedAt, failure path carries the error, unknown id 404-shapes
    (frontend .../upload-status/[id]/route.ts:1-60)."""
    from data_warehouse_hive_spark import api

    csv = tmp_path / "ok.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    uid = api.process_csv_tracked(spark, str(csv), "upload_ok_t")
    st = api.upload_status(uid)
    assert st["status"] == "success" and st["uploadId"] == uid
    assert st["completedAt"]

    bad_uid = api.process_csv_tracked(spark, str(tmp_path / "missing.csv"))
    st_bad = api.upload_status(bad_uid)
    assert st_bad["status"] == "error" and st_bad["error"]

    assert api.upload_status("nope") == {"error": "Upload not found"}
    spark.sql("DROP TABLE IF EXISTS upload_ok_t")


def test_list_tables_shape(spark, tmp_path):
    """GET /tables twin (reference backend/app.py:182-202): payload is
    {database, tables, count} with count == len(tables) and a created
    table visible in the list."""
    p = _write_csv(tmp_path)
    api.process_csv(spark, p, "api_list_t")
    try:
        out = api.list_tables(spark)
        assert set(out) == {"database", "tables", "count"}
        assert out["count"] == len(out["tables"])
        assert "api_list_t" in out["tables"]
        assert isinstance(out["database"], str) and out["database"]
    finally:
        spark.sql("DROP TABLE IF EXISTS api_list_t")


def test_drop_table_shape(spark, tmp_path):
    """DELETE /table/<name> twin (reference backend/app.py:218-234):
    success payload is {status, message}; the table is really gone; a
    second drop of the now-missing table still succeeds (DROP TABLE IF
    EXISTS semantics, reference hive_manager.py:120-139)."""
    p = _write_csv(tmp_path)
    api.process_csv(spark, p, "api_drop_t")
    out = api.drop_table(spark, "api_drop_t")
    assert out == {
        "status": "success",
        "message": "Table api_drop_t dropped successfully",
    }
    assert "api_drop_t" not in api.list_tables(spark)["tables"]
    again = api.drop_table(spark, "api_drop_t")
    assert again["status"] == "success"
