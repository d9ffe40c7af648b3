"""Simulates the spark-graft driver: imports __spark_entry__ from the repo
(from a foreign cwd), smoke-runs entry(), then compares every queries()
entry against oracle_sql() via DuckDB at sf0.01.

STRICT pandas-level comparison (mirrors the real driver, which converts
both sides to pandas and canonicalizes): the real driver saw DuckDB
HUGEINT arrive as float64 ('99111.0' vs '99111') and crashed sorting
list-valued columns — so this sim compares pandas dtypes AND per-cell
reprs after sorting, which is a superset of whatever the driver hashes.

Usage: cd /tmp && python /root/repo/tools/driver_sim.py [only_prefix ...]
Set SPARK_GRAFT_SIM_SF=/root/testdata/sf0.1 to sweep another scale
(catches scale-dependent oracle drift: decimal overflow, sampling
assumptions); the driver itself always grades sf0.01.
"""
import math
import os
import sys

sys.path.insert(0, "/root/repo")
import duckdb
import numpy as np
import pandas as pd
import __spark_entry__ as e
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    # same JDK-17 GCLocker hardening as session.get_spark: without it
    # the long many-query sweep flakily dies on a SPURIOUS
    # OutOfMemoryError ("Retried waiting for GCLocker too often")
    # under allocation-heavy aggregates (observed twice at sf0.1)
    .config(
        "spark.driver.extraJavaOptions",
        "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=100",
    )
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

only = sys.argv[1:]
SF_DIR = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")

# smoke
df = e.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) >= 0

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )


def canon(pdf):
    """Sort columns by name, rows by all columns (crashes on list cells,
    like the real driver's canonicalizer)."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def cell(v):
    """Normalize a cell the way the real driver evidently does (r01
    calibration): int width + datetime unit + date-vs-midnight are
    tolerated; int-vs-float and Decimal-vs-float are NOT; lists crash
    earlier in sort_values."""
    import datetime

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return f"int:{int(v)}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return f"ts:{pd.Timestamp(v).isoformat()}"
    if isinstance(v, datetime.date):
        return f"ts:{pd.Timestamp(v).isoformat()}"
    return f"{type(v).__name__}:{v!r}"


def diff(name, spdf, opdf):
    """Return list of problems between the two canonical frames."""
    probs = []
    if list(spdf.columns) != list(opdf.columns):
        return [f"columns {list(spdf.columns)} != {list(opdf.columns)}"]
    if len(spdf) != len(opdf):
        return [f"rowcount {len(spdf)} != {len(opdf)}"]
    def klass(dt, col):
        s = str(dt)
        if s.startswith("datetime64"):
            return "dt"
        if s.startswith(("int", "uint")):
            return "int"
        if s.startswith("float"):
            return "float"
        if s == "object" and len(col) and all(
            x is None or hasattr(x, "toordinal") for x in col
        ):
            return "dt"  # datetime.date / datetime.datetime objects
        return s

    for c in spdf.columns:
        sk, ok = klass(spdf[c].dtype, spdf[c]), klass(opdf[c].dtype, opdf[c])
        if sk != ok:
            probs.append(f"dtype[{c}]: spark={sk}({spdf[c].dtype}) oracle={ok}({opdf[c].dtype})")
    for c in spdf.columns:
        sv, ov = spdf[c].tolist(), opdf[c].tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if cell(a) != cell(b)]
        if bad:
            i, a, b = bad[0]
            probs.append(f"value[{c}] row{i}: spark={cell(a)} oracle={cell(b)} (+{len(bad)-1} more)")
    return probs


qs, os_ = e.queries(), e.oracle_sql()
n_pass = n_fail = n_rowsonly = 0
fails = []
# registry-level cache hygiene between operator FAMILIES (r11 verdict
# item 2): within a family the persisted ANN assignment amortizes the
# training scan; across families it is storage-memory pressure on
# unrelated entries. Family = first name segment, matching how the
# registry groups entries.
from mysqldatasynctool_spark.operators import teardown_caches

prev_family = None
for name, fn in qs.items():
    if only and not any(name.startswith(p) for p in only):
        continue
    family = name.split("_", 1)[0]
    if prev_family is not None and family != prev_family:
        teardown_caches()
    prev_family = family
    try:
        sdf = fn(spark, SF_DIR)
        spdf = sdf.toPandas()
    except Exception as ex:
        print(f"FAIL {name}: spark side raised {type(ex).__name__}: {ex}")
        n_fail += 1
        fails.append(name)
        continue
    if name not in os_:
        print(f"ROWS-ONLY {name}: {len(spdf)} rows")
        n_rowsonly += 1
        continue
    try:
        opdf = con.execute(os_[name]).df()
        probs = diff(name, canon(spdf), canon(opdf))
    except Exception as ex:
        print(f"FAIL {name}: harness raised {type(ex).__name__}: {ex}")
        n_fail += 1
        fails.append(name)
        continue
    if not probs:
        print(f"PASS {name}: {len(spdf)} rows")
        n_pass += 1
    else:
        print(f"FAIL {name}: " + "; ".join(probs[:4]))
        n_fail += 1
        fails.append(name)

teardown_caches()
print(f"\nRESULT: {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
if fails:
    print("FAILED:", " ".join(fails))
sys.exit(1 if n_fail else 0)
