"""Batch source builders (streaming sources live in rlink_rs_spark.streaming.sources).

The reference has no file formats at all (SURVEY.md §2.1); spark.read
provides parquet/csv/json/orc with pushdown and pruning for free. Fixture
loading is in rlink_rs_spark.tables."""
