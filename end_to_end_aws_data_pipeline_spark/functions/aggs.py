"""Exact, order-independent numeric aggregation helpers.

Floating-point ``SUM`` is not associative: Spark's partial/final hash
aggregation and DuckDB's aggregation visit rows in different orders, so
two correct engines produce sums differing in the last few ulps — enough
to break an exact cross-engine value-hash comparison, and enough to flip
a rounded digit at scale.

The fix is to aggregate in an exact domain: quantize each input to a
DECIMAL with a fixed scale (prices have 2 true decimal digits; derived
products ≤4; rates ≤4), sum exactly (decimal addition is associative),
and cast the final value back to DOUBLE. Both engines then compute
bit-identical results regardless of row order or plan shape. This also
holds at 100 TB: DECIMAL(38, s) accumulators give Spark map-side partial
aggregation exactly as for doubles, with no extra shuffle.

Helpers come in pairs: a PySpark Column builder and the equivalent SQL
text for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# input quantization precision/scale: wide enough for sf-scaled TPC-H
# money columns, exact for <= `scale` true decimal digits
_PREC = 18


def dsum(col: Column | str, scale: int = 2, out_scale: int | None = None) -> Column:
    """Exact sum of a double column with `scale` true decimal digits."""
    c = F.col(col) if isinstance(col, str) else col
    out_scale = scale if out_scale is None else out_scale
    return F.round(F.sum(c.cast(f"decimal({_PREC},{scale})")).cast("double"), out_scale)


def dsum_sql(expr: str, scale: int = 2, out_scale: int | None = None) -> str:
    out_scale = scale if out_scale is None else out_scale
    return (
        f"round(CAST(sum(CAST(({expr}) AS DECIMAL({_PREC},{scale}))) AS DOUBLE),"
        f" {out_scale})"
    )


def davg(col: Column | str, scale: int = 2, out_scale: int = 6) -> Column:
    """Exact-sum-based average, rounded to ``out_scale`` digits.

    sum is exact (decimal) and count is exact (long), so the final
    double division is identical across engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    exact = F.sum(c.cast(f"decimal({_PREC},{scale})")).cast("double")
    return F.round(exact / F.count(c), out_scale)


def davg_sql(expr: str, scale: int = 2, out_scale: int = 6) -> str:
    return (
        f"round(CAST(sum(CAST(({expr}) AS DECIMAL({_PREC},{scale}))) AS DOUBLE)"
        f" / count({expr}), {out_scale})"
    )


def lsum(col: Column | str) -> Column:
    """Integer sum as BIGINT (DuckDB widens to HUGEINT; align on int64)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast("long")


def lsum_sql(expr: str) -> str:
    return f"CAST(sum({expr}) AS BIGINT)"
