"""Subpackage of data_warehouse_hive_spark."""
