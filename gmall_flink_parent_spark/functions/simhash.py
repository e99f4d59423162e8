"""SimHash-32 signature expressions — leaf module (no registry import)
so both ``functions.dedup`` (pair generation) and ``functions.text``
(per-doc profile column) can use them without import cycles.

Signature: per-token 32-bit integer hash (first 8 md5 hex chars — md5 is
the one hash Spark and DuckDB compute identically), then a per-bit
majority vote over the document's distinct-token hash list. Pure integer
higher-order expressions: per-row, shuffle-free, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SIMHASH_BITS = 32

# per-token 32-bit integer hash (first 8 md5 hex chars) — DuckDB spelling
_TOK32_DUCK = "CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)"


def _simhash_value_sql_duckdb() -> str:
    """SimHash32 over the integer `hashes` list, as a DuckDB expression."""
    bit_terms = []
    for b in range(SIMHASH_BITS):
        vote = (
            f"list_sum(list_transform(hashes, h -> CASE WHEN (h >> {b}) & 1 = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        bit_terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << b} ELSE 0 END)")
    return "CAST(" + " + ".join(bit_terms) + " AS BIGINT)"


def _simhash_value_col() -> Column:
    """Same SimHash32, as a generated Spark SQL expression over `hashes`."""
    terms = []
    for b in range(SIMHASH_BITS):
        vote = (
            f"aggregate(hashes, 0, (acc, h) -> acc + (CASE WHEN "
            f"(shiftright(h, {b}) & 1) = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << b} ELSE 0 END)")
    return F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")


def token_hashes_col() -> Column:
    """Distinct-token 32-bit hash list over a ``text`` column (Spark)."""
    return F.transform(
        F.array_distinct(F.split("text", " ")),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
