"""Migration-semantics queries — the reference's own operator surface
(SURVEY.md §2A) expressed as oracle-checkable DataFrame queries over
the fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import FIXTURE_PRIMARY_KEYS, apply_exclusion, catalog_dataframe
from ..plans.partitioning import composite_pk_predicates, plan_table
from ..sources.fixtures import TABLES, load

PAGE_SIZE = 10_000


def migration_catalog_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog scan + NOT IN exclusion (ops #1-#2, root.go:222-241):
    discovered fixture tables minus an exclude list."""
    catalog = catalog_dataframe(spark, list(TABLES))
    return apply_exclusion(catalog, ("events", "documents", "embeddings")).orderBy(
        "table_name"
    )


MIGRATION_CATALOG_EXCLUDE_ORACLE = """
SELECT table_name FROM (
  VALUES ('region'), ('nation'), ('customer'), ('supplier'), ('part'),
         ('orders'), ('lineitem'), ('events'), ('documents'), ('embeddings')
) AS t(table_name)
WHERE table_name NOT IN ('events', 'documents', 'embeddings')
ORDER BY table_name
"""


def migration_page_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The plan-phase scalar aggregate (op #4, root.go:359-364):
    ``ceil(count(*)/pageSize) as total_page_num`` per table."""
    out = None
    for t in ("orders", "lineitem", "customer"):
        df = (
            load(spark, sf_dir, t)
            .agg(
                F.lit(t).alias("table_name"),
                F.count("*").alias("row_cnt"),
                F.ceil(F.count("*") / F.lit(PAGE_SIZE)).alias("total_page_num"),
            )
        )
        out = df if out is None else out.unionByName(df)
    return out.orderBy("table_name")


MIGRATION_PAGE_COUNT_ORACLE = f"""
SELECT table_name, row_cnt, CAST(CEIL(row_cnt / {PAGE_SIZE}.0) AS BIGINT) AS total_page_num
FROM (
  SELECT 'orders' AS table_name, COUNT(*) AS row_cnt FROM orders
  UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
  UNION ALL SELECT 'customer', COUNT(*) FROM customer
) t
ORDER BY table_name
"""


def migration_pagination_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal emulation of one page of the reference's deferred-join
    pagination (op #5, root.go:321-372): rows 2000..2999 of lineitem
    in composite-PK order, narrow-key page joined back to full rows.

    In production the engine uses range predicates instead
    (plans/partitioning.py) — this query exists to pin the exact page
    semantics the reference produces.
    """
    li = load(spark, sf_dir, "lineitem")
    w = W.orderBy("l_orderkey", "l_linenumber")
    page = (
        li.select("l_orderkey", "l_linenumber")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 2000) & (F.col("rn") <= 3000))
        .drop("rn")
    )
    return (
        page.join(li, ["l_orderkey", "l_linenumber"], "left")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    )


MIGRATION_PAGINATION_PAGE_ORACLE = """
WITH page AS (
  SELECT l_orderkey, l_linenumber
  FROM (
    SELECT l_orderkey, l_linenumber,
           ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
    FROM lineitem
  ) t
  WHERE rn > 2000 AND rn <= 3000
)
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_returnflag
FROM page p LEFT JOIN lineitem l
  ON p.l_orderkey = l.l_orderkey AND p.l_linenumber = l.l_linenumber
ORDER BY l.l_orderkey, l.l_linenumber
"""


def migration_stringify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's all-values-to-string transport compat op
    (root.go:418-431: nil→NULL, BLOB→bytes, else→string). Kept as an
    explicit opt-in operator — the engine itself stays natively typed
    (SURVEY.md §1.3). Doubles stringify via exact DECIMAL, timestamps
    via epoch seconds, so the repr is engine-portable."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_orderkey").cast("string").alias("o_orderkey"),
            F.col("o_custkey").cast("string").alias("o_custkey"),
            F.col("o_orderstatus").alias("o_orderstatus"),
            F.col("o_totalprice").cast("decimal(24,4)").cast("string").alias("o_totalprice"),
            F.col("o_orderdate").cast("timestamp").cast("long").cast("string").alias("o_orderdate"),
            F.col("o_orderpriority").alias("o_orderpriority"),
        )
        .orderBy(F.col("o_orderkey").cast("long"))
    )


MIGRATION_STRINGIFY_ORACLE = """
SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
       CAST(o_custkey AS VARCHAR) AS o_custkey,
       o_orderstatus,
       CAST(CAST(o_totalprice AS DECIMAL(24,4)) AS VARCHAR) AS o_totalprice,
       CAST(CAST(floor(epoch(o_orderdate)) AS BIGINT) AS VARCHAR) AS o_orderdate,
       o_orderpriority
FROM orders
ORDER BY CAST(o_orderkey AS BIGINT)
"""


def migration_pk_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK lookup, composite-aware, ordered by ordinal position (op #3,
    root.go:327-340): the fixture PK catalog as
    (table_name, ordinal_position, pk_column) — lineitem is the
    two-column composite case."""
    cat = spark.createDataFrame(
        [(t, cols) for t, cols in FIXTURE_PRIMARY_KEYS.items()],
        "table_name string, pk_cols array<string>",
    )
    return (
        cat.select(
            "table_name", F.posexplode("pk_cols").alias("pos", "pk_column")
        )
        .select(
            "table_name",
            (F.col("pos") + 1).alias("ordinal_position"),
            "pk_column",
        )
        .orderBy("table_name", "ordinal_position")
    )


MIGRATION_PK_CATALOG_ORACLE = (
    "SELECT table_name, CAST(ordinal_position AS INT) AS ordinal_position, pk_column\n"
    "FROM (VALUES "
    + ", ".join(
        f"('{t}', {i + 1}, '{c}')"
        for t, cols in FIXTURE_PRIMARY_KEYS.items()
        for i, c in enumerate(cols)
    )
    + ") AS t(table_name, ordinal_position, pk_column)\n"
    "ORDER BY table_name, ordinal_position"
)


def migration_full_scan_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-PK fallback (op #6, root.go:341-345): a table without a PK
    gets ONE full-scan partition — plan_table returns mode='single'
    and the keyspace tiling degenerates to the single always-true
    predicate, which this query actually applies."""
    plan = plan_table("documents", [], page_size=10_000, max_parallel=8)
    assert plan.mode == "single"
    (pred,) = composite_pk_predicates([], [])
    return (
        load(spark, sf_dir, "documents")
        .filter(F.expr(pred))
        .select("doc_id", "lang", F.length("text").alias("n_chars"))
        .orderBy("doc_id")
    )


MIGRATION_FULL_SCAN_FALLBACK_ORACLE = """
SELECT doc_id, lang, CAST(length(text) AS INT) AS n_chars
FROM documents
WHERE 1 = 1
ORDER BY doc_id
"""


#: engine type name → engine-neutral class, so a schema diff compares
#: MEANING (is this column still an integer?) rather than dialect
#: spellings (Spark "long" vs MySQL "bigint" vs DuckDB "BIGINT")
def _canonical_type(type_name: str) -> str:
    t = type_name.lower()
    if t.startswith("array") or t.endswith("[]"):
        return "array"
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("timestamp"):
        return "timestamp"
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return "integer"
    if t in ("float", "real", "double"):
        return "float"
    if t in ("string", "varchar", "text", "char"):
        return "text"
    if t in ("binary", "blob"):
        return "binary"
    return t


def migration_schema_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift audit: every (table, column, position, canonical
    type) across the catalog — the check a migration runs BEFORE
    copying so a silently-altered source column (renamed, retyped,
    reordered) fails loudly instead of corrupting the dest. Extends
    the reference's compareDb (which compares only row counts,
    root.go:600-650) to the schema plane.

    Driver-side by nature: schemas are metadata (one lazy .schema probe
    per table — the same zero-row probe as sources/jdbc.probe_schema);
    no data is scanned. Types are canonicalized (``_canonical_type``)
    so the comparison is dialect-neutral.
    """
    rows = []
    for t in TABLES:
        for pos, field in enumerate(load(spark, sf_dir, t).schema.fields, start=1):
            rows.append(
                (t, field.name, pos, _canonical_type(field.dataType.simpleString()))
            )
    return spark.createDataFrame(
        rows, "table_name string, column_name string, position int, canonical_type string"
    ).orderBy("table_name", "position")


MIGRATION_SCHEMA_AUDIT_ORACLE = """
SELECT table_name, column_name,
       CAST(ordinal_position AS INT) AS position,
       CASE
         WHEN lower(data_type) LIKE '%[]' THEN 'array'
         WHEN lower(data_type) LIKE 'decimal%' THEN 'decimal'
         WHEN lower(data_type) LIKE 'timestamp%' THEN 'timestamp'
         WHEN lower(data_type) IN ('tinyint','smallint','int','integer','bigint') THEN 'integer'
         WHEN lower(data_type) IN ('float','real','double') THEN 'float'
         WHEN lower(data_type) IN ('varchar','text','char') THEN 'text'
         WHEN lower(data_type) IN ('blob','binary') THEN 'binary'
         ELSE lower(data_type)
       END AS canonical_type
FROM information_schema.columns
WHERE table_schema = current_schema()
  AND table_name IN ('region','nation','customer','supplier','part',
                     'orders','lineitem','events','documents','embeddings')
ORDER BY table_name, position
"""


def migration_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of the fact table — the ATTRIBUTION
    companion to the content checksum: when compare goes red, the
    profile diff (null counts, distinct cardinality, min/max) says
    WHICH column drifted (truncation, encoding, lost precision)
    without re-reading either side twice.

    One scan: the numeric columns unpivot (stack) into (column, value)
    rows map-side, then a single grouped aggregate. Min/max stay exact
    (doubles compared, not summed); distinct counts are exact here and
    would flip to approx_count_distinct at 100 TB (the audited HLL
    twin — see agg_approx_distinct).
    """
    li = load(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    stack_expr = "stack({n}, {pairs}) as (col_name, value)".format(
        n=len(cols), pairs=", ".join(f"'{c}', {c}" for c in cols)
    )
    return (
        li.selectExpr(stack_expr)
        .groupBy("col_name")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_nulls"),
            F.countDistinct("value").alias("n_distinct"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("col_name")
    )


MIGRATION_COLUMN_PROFILE_ORACLE = """
WITH unp AS (
  SELECT 'l_quantity' AS col_name, l_quantity AS value FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT col_name,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT value) AS n_distinct,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM unp
GROUP BY col_name
ORDER BY col_name
"""


QUERIES = {
    "migration_catalog_exclude": migration_catalog_exclude,
    "migration_pk_catalog": migration_pk_catalog,
    "migration_full_scan_fallback": migration_full_scan_fallback,
    "migration_page_count": migration_page_count,
    "migration_pagination_page": migration_pagination_page,
    "migration_stringify": migration_stringify,
    "migration_schema_audit": migration_schema_audit,
    "migration_column_profile": migration_column_profile,
}

ORACLES = {
    "migration_catalog_exclude": MIGRATION_CATALOG_EXCLUDE_ORACLE,
    "migration_pk_catalog": MIGRATION_PK_CATALOG_ORACLE,
    "migration_full_scan_fallback": MIGRATION_FULL_SCAN_FALLBACK_ORACLE,
    "migration_page_count": MIGRATION_PAGE_COUNT_ORACLE,
    "migration_pagination_page": MIGRATION_PAGINATION_PAGE_ORACLE,
    "migration_stringify": MIGRATION_STRINGIFY_ORACLE,
    "migration_schema_audit": MIGRATION_SCHEMA_AUDIT_ORACLE,
    "migration_column_profile": MIGRATION_COLUMN_PROFILE_ORACLE,
}
