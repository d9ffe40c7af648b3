"""Tests for bucketing (exchange-free joins), salting (skew), and job
groups (tag + cancel)."""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import functions as F

from mysqldatasynctool_spark.plans.layout import (
    cancel_job_group,
    job_group,
    salted_join,
    write_bucketed,
)
from mysqldatasynctool_spark.sources.fixtures import load

SF = "/root/testdata/sf0.001"


def _plan(spark, df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        write_bucketed(
            load(spark, SF, "orders"),
            "orders_b",
            "o_orderkey",
            4,
            path=str(tmp_path / "orders_b"),
        )
        write_bucketed(
            load(spark, SF, "lineitem").select("l_orderkey", "l_quantity"),
            "lineitem_b",
            "l_orderkey",
            4,
            path=str(tmp_path / "lineitem_b"),
        )
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(spark, joined)
        # both sides pre-bucketed on the key → the join needs NO shuffle
        assert "Exchange hashpartitioning" not in plan, plan[:500]
        assert joined.count() == load(spark, SF, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_join_matches_plain_join(spark):
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(li, orders, "l_orderkey", "o_orderkey", salt=4)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_job_group_cancel(spark):
    """A tagged long-running job is killed by cancel_job_group — the
    reference's SIGINT → PROCESSLIST-kill path (app.go:161-191),
    engine-native."""
    err = []

    def run():
        try:
            big = spark.range(0, 1 << 36, 1, 8)
            with job_group(spark, "cancellable", "long cartesian-ish job"):
                big.select(F.sum(F.sha2(F.col("id").cast("string"), 256).substr(1, 2).cast("long"))).collect()
        except Exception as e:  # noqa: BLE001
            err.append(e)

    t = threading.Thread(target=run)
    t.start()
    time.sleep(3)  # let the job start
    cancel_job_group(spark, "cancellable")
    t.join(timeout=60)
    assert not t.is_alive(), "job did not terminate after cancel"
    assert err, "cancelled job should raise in the submitting thread"
