"""Oracle-gate tests for the core relational operators."""

from __future__ import annotations

import pytest

from mysqldatasynctool_spark.operators import relational
from tests.conftest import assert_matches_oracle

ORACLE_KEYS = sorted(relational.ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_matches_oracle(spark, duck, name):
    df = relational.QUERIES[name](spark, "/root/testdata/sf0.01")
    assert_matches_oracle(df, relational.ORACLES[name], duck)


def test_approx_distinct_runs(spark):
    df = relational.QUERIES["agg_approx_distinct"](spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r.n_parts > 0 for r in rows)
    # the HLL estimate must sit inside the 5% bound the oracle asserts
    assert all(r.within_tol for r in rows)


def test_q1_fast_twin_approximates_exact(spark):
    exact = {
        (r.l_returnflag, r.l_linestatus): r
        for r in relational.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.01").collect()
    }
    # the raw float twin (what bench.py times under this name)
    fast = {
        (r.l_returnflag, r.l_linestatus): r
        for r in relational.q1_pricing_summary_fast_raw(spark, "/root/testdata/sf0.01").collect()
    }
    assert exact.keys() == fast.keys()
    for k in exact:
        assert exact[k].count_order == fast[k].count_order
        assert abs(exact[k].sum_charge - fast[k].sum_charge) / exact[k].sum_charge < 1e-9
    # the registry entry is the gated form: it carries the exact
    # decimal values plus the in-query float-vs-exact bound
    gated = relational.QUERIES["q1_pricing_summary_fast"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert {(r.l_returnflag, r.l_linestatus) for r in gated} == set(exact)
    for r in gated:
        assert r.within_tol
        assert r.sum_charge == exact[(r.l_returnflag, r.l_linestatus)].sum_charge


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_fuzzy_ed1_blocking_has_full_recall(spark):
    """Deletion-neighborhood blocking must find EVERY true ed<=1 pair
    (substitution, insertion, deletion, plus near-miss ed=2 excluded)
    — verified against a brute-force levenshtein sweep on a crafted
    set, through the same join machinery but a tiny in-memory frame."""
    from pyspark.sql import functions as F

    names = [
        (1, "alpha"),   # sub of 2 ("alpho"), del of 4 ("alpha"->"alph")
        (2, "alpho"),
        (3, "alph"),
        (4, "aalpha"),  # insertion
        (5, "beta"),    # isolated
        (6, "alpXa"),   # substitution mid-string
    ]
    df = spark.createDataFrame(names, "id long, name string")
    keys = df.select(
        "id",
        "name",
        F.explode(
            F.concat(
                F.array(F.col("name")),
                F.expr(
                    "transform(sequence(1, length(name)),"
                    " i -> concat(substr(name, 1, i - 1), substr(name, i + 1)))"
                ),
            )
        ).alias("key"),
    )
    a = keys.select(F.col("id").alias("ida"), F.col("name").alias("na"), "key")
    b = keys.select(F.col("id").alias("idb"), F.col("name").alias("nb"), "key")
    got = {
        (r["ida"], r["idb"])
        for r in a.join(b, "key")
        .filter(F.col("ida") < F.col("idb"))
        .select("ida", "na", "idb", "nb")
        .distinct()
        .filter(F.levenshtein("na", "nb") <= 1)
        .collect()
    }
    import itertools

    def lev(s, t):
        d = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            prev, d[0] = d[0], i
            for j, ct in enumerate(t, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (cs != ct))
        return d[-1]

    want = {
        (x[0], y[0])
        for x, y in itertools.combinations(names, 2)
        if lev(x[1], y[1]) <= 1
    }
    assert got == want and len(want) >= 4


def test_fuzzy_ed1_plan_no_nested_loop(spark):
    plan = (
        relational.join_fuzzy_ed1(spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_prefilter_no_false_negatives_and_prunes(spark):
    """The bloom prefilter must pass EVERY true match (no false
    negatives) and prune the vast majority of non-matching fact rows
    (fp ~0.7% at 16 bits/key)."""
    from pyspark.sql import functions as F

    from mysqldatasynctool_spark.sources.fixtures import load

    sf = "/root/testdata/sf0.01"
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-03-08").cast("timestamp"))
    )
    li = load(spark, sf, "lineitem")
    keys = orders.select("o_orderkey")
    survivors = relational.bloom_prefilter(spark, keys, li, "l_orderkey")
    true_matches = li.join(
        keys, li.l_orderkey == F.col("o_orderkey"), "left_semi"
    ).count()
    n_surv, n_total = survivors.count(), li.count()
    assert n_surv >= true_matches  # no false negatives
    # pruning is real: survivors are a small fraction of the fact side
    assert n_surv <= true_matches + max(50, int(0.02 * n_total))


def test_bloom_join_plan_broadcast_no_nested_loop(spark):
    plan = (
        relational.join_bloom_pruned_semi(spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
    )
    assert "CartesianProduct" not in plan
    # the bitmap attaches as a 1-row broadcast whose probe predicate
    # Catalyst pushes into the join condition (allowlisted BNLJ — a
    # broadcast map-side filter); the exact semi join must be a
    # broadcast hash join
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "shiftright" in plan  # the bloom probe reached the plan


def test_bloom_prefilter_random_keys_property(spark):
    """Seeded randomized property: for arbitrary bigint key sets the
    bloom prefilter NEVER drops a true match."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(20260814)
    dim_keys = sorted(rng.sample(range(10**12), 200))
    fact_keys = dim_keys + [rng.randrange(10**12) for _ in range(5000)]
    rng.shuffle(fact_keys)
    dim = spark.createDataFrame([(k,) for k in dim_keys], "key bigint")
    fact = spark.createDataFrame([(k,) for k in fact_keys], "fkey bigint")
    surv = {
        r["fkey"]
        for r in relational.bloom_prefilter(spark, dim, fact, "fkey").collect()
    }
    assert set(dim_keys) <= surv  # zero false negatives, any key set


def test_fuzzy_ed1_blocking_random_strings_property(spark):
    """Seeded randomized property: blocking == brute force on random
    short strings over a dense alphabet (worst case for collisions)."""
    import itertools
    import random

    from pyspark.sql import functions as F

    rng = random.Random(42)
    names = list(
        {"".join(rng.choice("ab") for _ in range(rng.randint(2, 5))) for _ in range(60)}
    )
    rows = [(i, n) for i, n in enumerate(sorted(names))]
    df = spark.createDataFrame(rows, "id long, name string")
    keys = df.select(
        "id",
        "name",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("name")),
                    F.expr(
                        "transform(sequence(1, length(name)),"
                        " i -> concat(substr(name, 1, i - 1), substr(name, i + 1)))"
                    ),
                )
            )
        ).alias("key"),
    )
    a = keys.select(F.col("id").alias("ida"), F.col("name").alias("na"), "key")
    b = keys.select(F.col("id").alias("idb"), F.col("name").alias("nb"), "key")
    got = {
        (r["ida"], r["idb"])
        for r in a.join(b, "key")
        .filter(F.col("ida") < F.col("idb"))
        .filter(F.levenshtein("na", "nb") <= 1)
        .select("ida", "idb")
        .distinct()
        .collect()
    }

    def lev(s, t):
        d = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            prev, d[0] = d[0], i
            for j, ct in enumerate(t, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (cs != ct))
        return d[-1]

    want = {
        (x[0], y[0])
        for x, y in itertools.combinations(rows, 2)
        if lev(x[1], y[1]) <= 1
    }
    assert got == want and len(want) > 10


def test_bloom_prefilter_rejects_reserved_column_clash(spark):
    """A fact frame already carrying a helper-column name must fail
    loudly (it would otherwise be silently overwritten and dropped)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mysqldatasynctool_spark.operators.relational import bloom_prefilter

    dim = spark.range(5).select(F.col("id").alias("k"))
    fact = spark.range(10).select(
        F.col("id").alias("k"), F.lit(1).alias("__h1")
    )
    with _pytest.raises(ValueError, match="reserved helper"):
        bloom_prefilter(spark, dim, fact, "k")
