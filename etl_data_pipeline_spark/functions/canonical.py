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


def grid_sum(col: Column, micro: int = 1_000_000) -> Column:
    """Order-independent SUM of a CONTINUOUS double (no decimal grid to
    exploit, so ``dec_sum``'s exact-cast trick doesn't apply — and
    CAST-to-decimal of an arbitrary double rounds, which the engines
    tie-break differently).

    Instead: floor each value onto a 1/micro grid — one IEEE multiply
    plus floor, bit-identical in every engine — then sum exactly as
    BIGINT (associative, order-insensitive) and divide once. The result
    is a deterministic fixed-point total, not a rounded float sum.

    Oracle-SQL counterpart (textual convention used by every plan):
    ``SUM(CAST(FLOOR(x * 1000000) AS BIGINT)) / 1000000.0``.
    """
    return F.sum(F.floor(col * F.lit(micro))) / F.lit(float(micro))


def grid_avg(col: Column, micro: int = 1_000_000) -> Column:
    """Order-independent AVG of a continuous double: grid_sum divided by
    the group count (only use on non-null columns — COUNT(*) scope).

    Oracle counterpart:
    ``SUM(CAST(FLOOR(x * 1000000) AS BIGINT)) / 1000000.0 / COUNT(*)``.
    """
    return grid_sum(col, micro) / F.count(F.lit(1))


def dec_avg(col: Column, scale: int) -> Column:
    """Deterministic AVG of a decimal-grid double: exact decimal sum,
    single double division by the group count.

    Oracle counterpart: ``CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE)
    / COUNT(*)`` — note COUNT(*) must match the aggregate's null scope,
    so only use on non-null columns.
    """
    return dec_sum(col, scale) / F.count(F.lit(1))
