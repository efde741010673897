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
    """Exact sum of a double column with `scale` true decimal digits.

    Publish order matters at scale (found by the sf1 full-registry
    sweep): round IN THE DECIMAL DOMAIN first (exact, identical
    half-away-from-zero ties in both engines), THEN convert to double.
    The old round-after-cast diverged by 1 ulp past ~9e9·10^-scale:
    DuckDB's ``round(double, s)`` multiplies by 10^s in double space
    (inexact past 2^53), and its decimal→double cast double-rounds via
    int128/10^s — the SQL twin below routes the conversion through
    VARCHAR, whose strtod is correctly rounded, matching Spark's
    BigDecimal.doubleValue exactly at any magnitude.
    """
    c = F.col(col) if isinstance(col, str) else col
    out_scale = scale if out_scale is None else out_scale
    return F.round(
        F.sum(c.cast(f"decimal({_PREC},{scale})")), out_scale
    ).cast("double")


def dsum_sql(expr: str, scale: int = 2, out_scale: int | None = None) -> str:
    out_scale = scale if out_scale is None else out_scale
    return (
        f"CAST(CAST(round(sum(CAST(({expr}) AS DECIMAL({_PREC},{scale}))),"
        f" {out_scale}) AS VARCHAR) AS DOUBLE)"
    )


def davg(col: Column | str, scale: int = 2, out_scale: int = 6) -> Column:
    """Exact-sum-based average, published to ``out_scale`` digits.

    sum is exact (decimal) and count is exact (long); the conversion to
    double uses the correctly-rounded path (see dsum) so the division
    inputs are bit-identical, and the final publish uses the tie-free
    floor(x·10^s + 0.5)/10^s stabilizer instead of round(double, s)
    (see scale-lessons: round-on-double diverges on expansion ties).
    """
    c = F.col(col) if isinstance(col, str) else col
    exact = F.sum(c.cast(f"decimal({_PREC},{scale})")).cast("double")
    x = exact / F.count(c)
    p = 10**out_scale
    return F.floor(x * p + 0.5) / p


def davg_sql(expr: str, scale: int = 2, out_scale: int = 6) -> str:
    p = 10**out_scale
    x = (
        f"CAST(CAST(sum(CAST(({expr}) AS DECIMAL({_PREC},{scale}))) AS VARCHAR)"
        f" AS DOUBLE) / count({expr})"
    )
    return f"floor(({x}) * {p} + 0.5) / {p}"


def stable_round(col: Column | str, out_scale: int = 6) -> Column:
    """Tie-free publish of a double to ``out_scale`` decimal digits:
    floor(x·10^s + 0.5)/10^s. Every step is one correctly-rounded IEEE
    op, so the result is bit-identical in Spark and DuckDB — unlike
    round(double, s), where Spark rounds the double's exact decimal
    expansion (BigDecimal HALF_UP) and DuckDB rounds in double space,
    diverging by one last-digit ulp on expansion ties (~1e-4 of rows at
    sf0.1; see scale-lessons). Use for every float-valued publish —
    ratios, differences, cosines — paired with stable_round_sql in the
    oracle."""
    c = F.col(col) if isinstance(col, str) else col
    p = 10**out_scale
    return F.floor(c * p + 0.5) / p


def stable_round_sql(expr: str, out_scale: int = 6) -> str:
    p = 10**out_scale
    return f"floor(({expr}) * {p} + 0.5) / {p}"


def lsum(col: Column | str) -> Column:
    """Integer sum as BIGINT (DuckDB widens to HUGEINT; align on int64)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast("long")


def lsum_sql(expr: str) -> str:
    return f"CAST(sum({expr}) AS BIGINT)"
