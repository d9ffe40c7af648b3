"""Physical-layout and job-control utilities.

- Bucketing: pre-shuffle a table ONCE at write time so every later
  join/agg on the bucket key is exchange-free — the lakehouse answer
  to the reference's per-run repartitioning cost. At 100 TB, bucket
  the fact table by its dominant join key (orderkey) and repeated
  joins skip their largest shuffle entirely.
- Salting: explicit skew-splitting for the case AQE can't fix (a
  single hot key inside one partition of a shuffle join): spread the
  hot side over ``salt`` sub-keys and replicate the other side.
- Job groups: the Spark-native version of the reference's query
  tagging + cooperative cancel (``/* goapp */`` comment + PROCESSLIST
  kill, /root/reference/cmd/app.go:161-191, root.go:380):
  ``setJobGroup`` tags, ``cancelJobGroup`` kills.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table; ``path``
    makes it external (the warehouse dir is static session config)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the (large, skewed) left side gets a
    deterministic salt from its OTHER columns' hash; the right side is
    replicated ``salt`` times. Join key becomes (key, salt) — the hot
    key's rows spread over ``salt`` reducers.

    Cost model: right side inflates x salt (use only when right is the
    small-but-not-broadcastable side and a single left key dominates).
    Only left-side-preserving joins are valid: an outer-preserved
    replicated right row would appear once per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "cross"):
        raise ValueError(
            f"salted_join cannot preserve unmatched rows of the replicated "
            f"side; how={how!r} is unsupported (use inner/left/semi/anti)"
        )
    salted_left = left.withColumn(
        "_salt", (F.abs(F.xxhash64(*left.columns)) % salt).cast("int")
    )
    replicate = F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    salted_right = right.withColumn("_salt", replicate)
    out = salted_left.join(
        salted_right,
        (salted_left[left_key] == salted_right[right_key])
        & (salted_left["_salt"] == salted_right["_salt"]),
        how,
    )
    return out.drop("_salt")


@contextmanager
def job_group(spark: SparkSession, group_id: str, description: str = ""):
    """Tag every job submitted in this block (reference op #16). Any
    other thread can ``cancel_job_group(spark, group_id)`` — the
    cooperative-cancel the reference implements with PROCESSLIST
    scraping comes built-in."""
    sc = spark.sparkContext
    sc.setJobGroup(group_id, description or group_id, interruptOnCancel=True)
    try:
        yield
    finally:
        sc.setJobGroup("", "")


def cancel_job_group(spark: SparkSession, group_id: str) -> None:
    spark.sparkContext.cancelJobGroup(group_id)
