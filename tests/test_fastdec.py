"""Equivalence gates for the r18 unscaled-long decimal fast path
(functions/fastdec.py) and the digest fast sums (operators/compare.py).

Every helper must be BIT-IDENTICAL (values AND dtypes) to the
BigDecimal-path original on its contract classes — these tests compare
both paths side by side on randomized in-contract data, including
negatives, NULLs, empty frames and the fixture tables themselves.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mysqldatasynctool_spark.functions.fastdec import (
    dec_min,
    dec_sum,
    dec_sum_over,
    dec_sum_over_bounded,
    dec_sum_when,
    unscaled_long,
)


def _dec(col, scale=2, prec=22):
    return col.cast(f"decimal({prec},{scale})")


@pytest.fixture(scope="module")
def money_df(spark):
    """Randomized in-contract frame: exact 2-decimal doubles (money),
    positive and negative, with NULLs and a few groups."""
    rng = random.Random(18)
    rows = []
    for i in range(5000):
        cents = rng.randint(-10_000_000, 10_000_000)
        disc_bp = rng.randint(0, 10)  # 0.00..0.10 like l_discount
        rows.append(
            (
                i,
                i % 7,
                None if i % 97 == 0 else cents / 100.0,
                disc_bp / 100.0,
            )
        )
    return spark.createDataFrame(rows, "id long, g int, x double, d double")


def test_unscaled_long_matches_cast(spark, money_df):
    """Per-row contract: unscaled_long == UnscaledValue(CAST(x AS
    DECIMAL)) for exact-2dp doubles, both signs, at scales 2 and 6."""
    for scale in (2, 6):
        bad = money_df.select(
            (
                unscaled_long(F.col("x"), scale)
                != (_dec(F.col("x"), scale, 22) * F.lit(10**scale)).cast("long")
            ).alias("diff")
        ).filter("diff").count()
        assert bad == 0, f"scale {scale}: {bad} rows diverge"


def test_dec_sum_value_and_dtype(spark, money_df):
    both = money_df.groupBy("g").agg(
        F.sum(_dec(F.col("x"))).alias("slow"),
        dec_sum(F.col("x")).alias("fast"),
    )
    assert dict(both.dtypes)["slow"] == dict(both.dtypes)["fast"]
    assert both.filter("slow IS DISTINCT FROM fast").count() == 0


def test_dec_sum_product_class(spark, money_df):
    """Class 2: products of 2-decimal doubles cast at scale >= total
    scale — disc_price-style (x·(1-d)) and charge-style 3-factor."""
    pos = money_df.filter("x IS NOT NULL AND x >= 0")
    disc_price = F.col("x") * (1 - F.col("d"))
    charge = disc_price * (1 + F.col("d"))
    both = pos.groupBy("g").agg(
        F.sum(_dec(disc_price, 6)).alias("s1"),
        dec_sum(disc_price, 6).alias("f1"),
        F.sum(_dec(charge, 6)).alias("s2"),
        dec_sum(charge, 6).alias("f2"),
    )
    assert both.filter(
        "s1 IS DISTINCT FROM f1 OR s2 IS DISTINCT FROM f2"
    ).count() == 0


def test_dec_sum_all_null_group_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (1, None), (2, 3.25)], "g int, x double"
    )
    both = df.groupBy("g").agg(
        F.sum(_dec(F.col("x"))).alias("slow"), dec_sum(F.col("x")).alias("fast")
    )
    assert both.filter("slow IS DISTINCT FROM fast").count() == 0


def test_dec_sum_when(spark, money_df):
    cond = F.col("g") < 3
    both = money_df.agg(
        F.sum(
            F.when(cond, _dec(F.col("x"), 6)).otherwise(
                F.lit(0).cast("decimal(22,6)")
            )
        ).alias("slow"),
        dec_sum_when(cond, F.col("x"), 6).alias("fast"),
    )
    assert dict(both.dtypes)["slow"] == dict(both.dtypes)["fast"]
    assert both.filter("slow IS DISTINCT FROM fast").count() == 0


def test_dec_min(spark, money_df):
    both = money_df.groupBy("g").agg(
        F.min(_dec(F.col("x"))).alias("slow"), dec_min(F.col("x")).alias("fast")
    )
    assert dict(both.dtypes)["slow"] == dict(both.dtypes)["fast"]
    assert both.filter("slow IS DISTINCT FROM fast").count() == 0


def test_dec_sum_over_sliding_and_bounded(spark, money_df):
    w = W.partitionBy("g").orderBy("id").rowsBetween(-20, -1)
    both = money_df.select(
        F.sum(_dec(F.col("x"), 6)).over(w).alias("slow"),
        dec_sum_over(F.col("x"), w, 6).alias("fast"),
        dec_sum_over_bounded(F.col("x"), w, 6).alias("fastb"),
    )
    assert dict(both.dtypes)["slow"] == dict(both.dtypes)["fast"]
    assert both.filter(
        "slow IS DISTINCT FROM fast OR slow IS DISTINCT FROM fastb"
    ).count() == 0


def test_dec_sum_over_range_frame(spark, money_df):
    w = W.partitionBy("g").orderBy("id").rangeBetween(-50, 0)
    both = money_df.select(
        F.sum(_dec(F.col("x"))).over(w).alias("slow"),
        dec_sum_over(F.col("x"), w).alias("fast"),
    )
    assert both.filter("slow IS DISTINCT FROM fast").count() == 0


def test_digest_sum_matches_decimal_sum(spark, money_df):
    from mysqldatasynctool_spark.operators.compare import digest_sum
    from mysqldatasynctool_spark.functions.hashing import md5_low60

    d = md5_low60(F.col("id"))
    both = money_df.groupBy("g").agg(
        F.sum(d.cast("decimal(38,0)")).alias("slow"),
        digest_sum(d).alias("fast"),
    )
    assert dict(both.dtypes)["slow"] == dict(both.dtypes)["fast"]
    assert both.filter("slow IS DISTINCT FROM fast").count() == 0


def test_norm_col_double_fast_path(spark):
    """The %.4f digest rendering must equal the decimal-cast rendering
    on in-contract values and the pinned edge cases (negative zero,
    NULL, NaN, ±Inf, giant magnitudes)."""
    from mysqldatasynctool_spark.operators.compare import _norm_col

    vals = [
        0.0, -0.0, 1.0, -1.0, 1234.56, -846.69, 104999.91, 0.07, -0.01,
        None, float("nan"), float("inf"), float("-inf"), 1e16, -1e16,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    slow = F.coalesce(
        F.col("x").cast("decimal(24,4)").cast("string"), F.lit("\\N")
    )
    both = df.select(slow.alias("s"), _norm_col("x", "double").alias("f"))
    rows = both.collect()
    diffs = [(r.s, r.f) for r in rows if r.s != r.f]
    assert not diffs, diffs


def test_fixture_tables_are_in_contract(spark):
    """The class-1 premise itself, as a gate: every double column the
    converted operators aggregate is exactly 2-decimal at the test SF
    (rint(x*100)/100 == x bitwise)."""
    from mysqldatasynctool_spark.sources.fixtures import load

    sf_dir = "/root/testdata/sf0.01"
    checks = {
        "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "orders": ["o_totalprice"],
        "events": ["value"],
        "part": ["p_retailprice"],
        "customer": ["c_acctbal"],
        "supplier": ["s_acctbal"],
    }
    for t, cols in checks.items():
        df = load(spark, sf_dir, t)
        for c in cols:
            x = F.col(c)
            k = F.round(x * 100)
            bad = df.filter(x.isNotNull() & (x != k / 100)).count()
            assert bad == 0, f"{t}.{c}: {bad} non-2dp rows"
