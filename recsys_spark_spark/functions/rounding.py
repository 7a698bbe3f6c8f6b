"""Cross-engine-stable float quantization.

Spark's ``round()`` on doubles goes through BigDecimal of the SHORTEST
decimal representation and applies HALF_UP — so the double nearest
0.13645 (= 0.13644999999999998) rounds to 0.1365.  DuckDB rounds the
actual double value → 0.1364.  Any query whose output is hash-compared
across the two engines therefore must NOT use either engine's round().

``qround`` / ``qround_sql`` instead compute ``floor(x·10ⁿ + 0.5)/10ⁿ``
— the identical IEEE-754 op sequence in both engines, so identical
input doubles quantize identically, always.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qround(col: Column | str, digits: int) -> Column:
    """floor(x·10ⁿ + 0.5)/10ⁿ as a Spark column (round-half-up,
    engine-stable)."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**digits)
    return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def qround_sql(expr: str, digits: int) -> str:
    """The same quantization as a SQL expression string (DuckDB)."""
    scale = f"{float(10 ** digits):.1f}"
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
