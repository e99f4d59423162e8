"""Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
row count + column names + order-insensitive value comparison, plus an
Arrow-level dtype conformance check.

The value comparison below normalizes Decimal to its string form, which
is exactly the normalization the driver's value hash does NOT do — an
un-cast DuckDB window ``SUM`` typed as HUGEINT (Arrow decimal128(38,0))
hash-mismatches a Spark int64 even when every value is identical (the
round-2 ``sessionize`` red row). ``assert_arrow_schema_matches`` closes
that gap locally: it compares the Spark result schema with the oracle's
Arrow schema under the same equivalence classes the driver tolerates
(int widths collapse, tz/unit collapse) while keeping decimal distinct
from integer and float."""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any


def _norm(v: Any) -> Any:
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    return v


def spark_rows(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=repr)


def duck_rows(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(_norm(row[i]) for i in order) for row in cur.fetchall()]
    return cols, sorted(rows, key=repr)


def _norm_spark_type(dt) -> Any:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return ("dec", dt.scale)
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "bin"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.ArrayType):
        return ("list", _norm_spark_type(dt.elementType))
    if isinstance(dt, T.MapType):
        return ("map", _norm_spark_type(dt.keyType), _norm_spark_type(dt.valueType))
    if isinstance(dt, T.StructType):
        return ("struct", tuple((f.name, _norm_spark_type(f.dataType)) for f in dt.fields))
    return ("other", dt.simpleString())


def _norm_arrow_type(t) -> Any:
    import pyarrow.types as pat

    if pat.is_integer(t):
        return "int"
    if pat.is_floating(t):
        return "float"
    if pat.is_decimal(t):
        return ("dec", t.scale)
    if pat.is_string(t) or pat.is_large_string(t):
        return "str"
    if pat.is_boolean(t):
        return "bool"
    if pat.is_binary(t) or pat.is_large_binary(t):
        return "bin"
    if pat.is_date(t):
        return "date"
    if pat.is_timestamp(t):
        return "ts"
    if pat.is_list(t) or pat.is_large_list(t):
        return ("list", _norm_arrow_type(t.value_type))
    if pat.is_map(t):
        return ("map", _norm_arrow_type(t.key_type), _norm_arrow_type(t.item_type))
    if pat.is_struct(t):
        return ("struct", tuple((f.name, _norm_arrow_type(f.type)) for f in t))
    return ("other", str(t))


def assert_arrow_schema_matches(df, con, sql: str, name: str = "?") -> None:
    """Spark result dtypes must match the oracle's Arrow dtypes.

    Cheap: the oracle runs under ``LIMIT 0`` (types survive, no rows
    scanned) and the Spark side is never executed. Catches un-cast
    HUGEINT/DECIMAL oracle columns before the driver hashes them."""
    probe = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").fetch_arrow_table().schema
    duck_types = {f.name: _norm_arrow_type(f.type) for f in probe}
    spark_types = {f.name: _norm_spark_type(f.dataType) for f in df.schema.fields}
    assert spark_types == duck_types, (
        f"{name}: dtype mismatch\n  spark={spark_types}\n  duck ={duck_types}"
    )


def assert_matches_oracle(df, con, sql: str, name: str = "?") -> int:
    """Assert parity and return the (matching) row count."""
    s_cols, s_rows = spark_rows(df)
    d_cols, d_rows = duck_rows(con, sql)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"{name}: row {i} differs:\n  spark={a}\n  duck ={b}"
    return len(s_rows)
