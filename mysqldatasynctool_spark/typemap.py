"""MySQL type-name → Catalyst type mapping.

The reference probes types at runtime and collapses everything except
exact-"BLOB" to Go strings (/root/reference/cmd/root.go:302-317,
423-427 — note TINYBLOB/MEDIUMBLOB/LONGBLOB/VARBINARY fall into the
string branch there, a latent binary-corruption hazard). The new
engine keeps native Catalyst types instead (SURVEY.md §1.3); this map
is the explicit contract.

Type names arrive upper-cased (the reference upper-cases them at
root.go:315); parameters like DECIMAL(10,2) are parsed here.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# Exact-name map for parameterless types.
_SIMPLE: dict[str, T.DataType] = {
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "MEDIUMINT": T.IntegerType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "REAL": T.DoubleType(),
    "BIT": T.BinaryType(),
    "BOOLEAN": T.BooleanType(),
    "DATE": T.DateType(),
    "TIME": T.StringType(),  # Spark has no standalone TIME type
    "YEAR": T.IntegerType(),
    "CHAR": T.StringType(),
    "VARCHAR": T.StringType(),
    "TINYTEXT": T.StringType(),
    "TEXT": T.StringType(),
    "MEDIUMTEXT": T.StringType(),
    "LONGTEXT": T.StringType(),
    "ENUM": T.StringType(),
    "SET": T.StringType(),
    # All binary family → BinaryType (fixes the reference's exact-match
    # "BLOB" test, root.go:423-427)
    "BINARY": T.BinaryType(),
    "VARBINARY": T.BinaryType(),
    "TINYBLOB": T.BinaryType(),
    "BLOB": T.BinaryType(),
    "MEDIUMBLOB": T.BinaryType(),
    "LONGBLOB": T.BinaryType(),
    # JSON transported as string; parse on demand with from_json
    "JSON": T.StringType(),
    "GEOMETRY": T.BinaryType(),
}

_PARAM_RE = re.compile(r"^([A-Z]+)\s*\((\s*\d+\s*(?:,\s*\d+\s*)?)\)(\s+UNSIGNED)?$")


def mysql_to_catalyst(type_name: str) -> T.DataType:
    """Map an upper-cased MySQL type name (optionally parameterized)
    to a Catalyst DataType."""
    name = type_name.strip().upper()
    unsigned = name.endswith(" UNSIGNED")
    if unsigned:
        name = name[: -len(" UNSIGNED")].strip()

    if name.startswith("DATETIME") or name.startswith("TIMESTAMP"):
        return T.TimestampType()

    m = _PARAM_RE.match(name)
    if m:
        base, params = m.group(1), [int(p) for p in m.group(2).split(",")]
        if base in ("DECIMAL", "NUMERIC"):
            prec = params[0]
            scale = params[1] if len(params) > 1 else 0
            return T.DecimalType(min(prec, 38), min(scale, 38))
        name = base  # e.g. VARCHAR(255), INT(11), BIGINT(20)

    if unsigned:
        # widen unsigned integral types one step so values always fit
        widen = {
            "TINYINT": T.ShortType(),
            "SMALLINT": T.IntegerType(),
            "MEDIUMINT": T.IntegerType(),
            "INT": T.LongType(),
            "INTEGER": T.LongType(),
            "BIGINT": T.DecimalType(20, 0),
        }
        if name in widen:
            return widen[name]

    if name in ("DECIMAL", "NUMERIC"):
        return T.DecimalType(10, 0)
    return _SIMPLE.get(name, T.StringType())


def schema_from_mysql(columns: list[tuple[str, str]]) -> T.StructType:
    """Build a StructType from (name, mysql_type) pairs — the typed
    replacement for the reference's parallel name/type string slices
    (root.go:302-317). Names are lower-cased exactly as the reference
    does (root.go:312-314)."""
    return T.StructType(
        [
            T.StructField(name.lower(), mysql_to_catalyst(ty), nullable=True)
            for name, ty in columns
        ]
    )
