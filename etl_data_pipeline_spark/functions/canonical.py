"""Cross-engine determinism helpers.

Problem: double-precision sums depend on accumulation order, and the two
engines (Spark vs the DuckDB oracle) also disagree on ROUND tie-breaking
(Spark rounds the shortest decimal repr HALF_UP; DuckDB rounds the binary
value), so ``ROUND(SUM(money), 2)`` is NOT reproducible across engines —
money data sits exactly on decimal-grid tie points.

Solution: make the output double itself deterministic instead of rounding
it. Money columns (2 decimals exact, verified in-repo) are summed as
``DECIMAL(38, p)`` — exact, associative, order-insensitive, no overflow
below 1e38 — then cast once to double (a single correctly-rounded
conversion, identical in every engine). Derived money expressions carry
p = their exact decimal precision (price*(1-disc) → 4, *(1+tax) → 6).

Scale note: decimal aggregation stays inside whole-stage codegen and
vectorized parquet reads; at 100 TB it is also the overflow-safe path
(a bigint sum of 1e6-unit cents overflows around 1e12 rows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(col: Column, scale: int) -> Column:
    """Deterministic SUM of a decimal-grid double, returned as double.

    Oracle-SQL counterpart (textual convention used by every plan):
    ``CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE)``.
    """
    return F.sum(col.cast(f"decimal(38,{scale})")).cast("double")


def dec_avg(col: Column, scale: int) -> Column:
    """Deterministic AVG of a decimal-grid double: exact decimal sum,
    single double division by the group count.

    Oracle counterpart: ``CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE)
    / COUNT(*)`` — note COUNT(*) must match the aggregate's null scope,
    so only use on non-null columns.
    """
    return dec_sum(col, scale) / F.count(F.lit(1))
