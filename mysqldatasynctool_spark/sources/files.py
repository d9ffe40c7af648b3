"""File sources beyond parquet: CSV and JSON-lines (SURVEY.md §2B
"Scans/sources").

Production rules baked in:
- explicit schema always (inferSchema double-reads the data and
  guesses types — never in a pipeline);
- corrupt-record capture (PERMISSIVE + a quarantine column) instead of
  failing the job or silently dropping rows at TB scale;
- both readers parallelize by file splits exactly like parquet
  (``maxPartitionBytes``), so the scan scales with executors.

Caveat: aggregating over a filter on ``_corrupt_record`` can be wrong
— column pruning re-parses rows with a reduced schema, so counts see
raw lines. Select the data columns (or cache) before counting
good/bad splits; tests/test_file_sources.py pins the behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    keep_corrupt: bool = True,
) -> DataFrame:
    schema = _with_corrupt(schema) if keep_corrupt else schema
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = True,
) -> DataFrame:
    schema = _with_corrupt(schema) if keep_corrupt else schema
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in [f.name for f in schema.fields]:
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC scan (columnar like parquet: predicate pushdown, column
    pruning, and split-by-stripe parallelism all apply). Schema is
    optional — ORC is self-describing — but passing one pins the
    contract the same way the CSV/JSONL readers do."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)
