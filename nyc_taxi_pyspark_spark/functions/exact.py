"""Deterministic floating-point aggregation.

Problem: ``SUM(double)`` accumulates in partition order, which is
nondeterministic under parallel execution — the same query can return values
differing in the last bits run-to-run, and Spark vs DuckDB (the correctness
oracle) will generally disagree in those bits too.

Solution used throughout the engine's aggregate queries: round each input to
a fixed decimal scale, sum exactly in decimal (associative and commutative ⇒
order-independent), then cast the exact total back to double. As long as the
per-row value is bit-identical across engines (it is: same parquet doubles,
same IEEE-754 scalar ops), the aggregate is bit-identical too — across runs,
across partitionings, and across engines. Derived averages divide that exact
double by the group count, which is again deterministic IEEE arithmetic.

This is also the right call at 100 TB: the decimal sum is a plain hash
aggregate with map-side partial aggregation; no extra shuffle, no ordering
requirement, no single-threaded reduction.

Choosing the scale: pick the quantity's EXACT rational scale when it has one
(a 2dp money column → 2; 2dp×2dp product → 4; 2dp×2dp×2dp → 6). Then both
engines recover the exact rational from the nearby double and never hit a
rounding boundary. Rounding at a scale *below* the exact scale can land
exactly on a .5 boundary where Spark (HALF_UP on the double's shortest
decimal repr) and DuckDB (nearest on the binary value) disagree — observed
as a 3-in-1500-rows drift before sum_charge moved from scale 4 to its exact
scale 6. For quantities with no finite decimal scale (divisions, float
products), use scale ~12 with magnitude < 1e6: boundary hits are then
~1e-12-probability events.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# decimal(28,scale) leaves ~10^(28-scale) of headroom for the total; per-row
# casts use decimal(18,scale) and Spark widens the sum to decimal(28,scale).
_ROW_PRECISION = 18


def _to_decimal(col: Column | str, scale: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({_ROW_PRECISION},{scale})")


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM over a double column, returned as double.

    Oracle twin (DuckDB): ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.
    """
    return F.sum(_to_decimal(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum / count, in double.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def dstddev(col: Column | str, scale: int = 4) -> Column:
    """Order-independent sample standard deviation.

    Uses exact decimal sums of x and x² (x² computed in double first — the
    same IEEE product on every engine — then rounded to decimal):
    sqrt((Σx² − (Σx)²/n) / (n−1)).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    sx = dsum(c, scale)
    sxx = dsum(c * c, scale)
    return F.sqrt((sxx - (sx * sx) / n) / (n - F.lit(1.0)))


def oracle_dsum(expr: str, scale: int = 4) -> str:
    """DuckDB SQL text twin of :func:`dsum` for oracle queries."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int = 4) -> str:
    return f"({oracle_dsum(expr, scale)} / COUNT({expr}))"


def oracle_dstddev(expr: str, scale: int = 4) -> str:
    sx = oracle_dsum(expr, scale)
    sxx = oracle_dsum(f"({expr})*({expr})", scale)
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    return f"SQRT(({sxx} - ({sx})*({sx})/{n}) / ({n} - 1.0))"
