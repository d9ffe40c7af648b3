"""mysqldatasynctool_spark — a PySpark-native analytics & sync engine.

A from-scratch re-expression of the capabilities of
iverycd/mysqlDataSyncTool (a multi-threaded MySQL->MySQL migration CLI,
see /root/reference) as an idiomatic PySpark library:

- the reference's migration semantics (catalog discovery, schema
  replication, parallel partitioned copy, count/checksum verification)
  re-built on ``spark.read.jdbc`` / ``DataFrame.write`` primitives
  (SURVEY.md section 2A), and
- the full relational operator surface plus LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal columns) the
  reference delegates to MySQL or lacks entirely (SURVEY.md section 2B),
  designed for 100 TB scale: declarative plans for Catalyst, broadcast
  for dims, partial aggregation, no driver-side row loops.
"""

__version__ = "0.1.0"
