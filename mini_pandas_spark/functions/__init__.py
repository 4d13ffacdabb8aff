"""Column-level helper functions shared by operators.

Everything here returns native Column expressions (JVM-side, codegen'd) —
no Python UDFs in the hot path (SURVEY.md §2.4).

Determinism contract: the driver compares Spark results against DuckDB by
value hash, so floating-point aggregates must be bit-identical across both
engines.  Sums of parquet doubles are order-dependent in the last bits, so
money aggregates go through DECIMAL(18,2) (exact, associative) and cast
back to double — both engines then produce the same IEEE value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

MONEY = DecimalType(18, 2)


def money_sum(col: Column | str) -> Column:
    """Order-independent exact sum of a 2-decimal money column, as double.

    DuckDB oracle equivalent: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast("double")


def money_avg(col: Column | str, count: Column | None = None) -> Column:
    """Exact-sum-based average (sum as decimal, one double division).

    DuckDB: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = count if count is not None else F.count(F.lit(1))
    return F.sum(c.cast(MONEY)).cast("double") / n


def decimal_sum(expr: Column, scale: int = 4) -> Column:
    """Exact sum of an expression with ≤``scale`` decimal digits, as double."""
    return F.sum(expr.cast(DecimalType(28, scale))).cast("double")


def round_scaled(expr: Column, k: int) -> Column:
    """k-dp round of a double in SCALED-INTEGER space:
    ``bigint(round(x·10^k)) / 10^k``.

    Spark rounds a double's shortest decimal repr (HALF_UP) while DuckDB
    rounds the binary value, so a plain ``round(x, k)`` of a computed
    quotient can split the engines at a non-binary-exact .5 boundary;
    integer±.5 IS binary-exact, so rounding at integer scale agrees
    everywhere (CLAUDE.md invariant 6 — the streaming_anomaly_windows
    fix, generalized).  Mirror in oracles as
    ``CAST(round(x * 10^k) AS BIGINT) / 10^k.0``.  Only valid while
    ``|x|·10^k < 2^63`` — fine for losses/weights/ratios at k ≤ 9."""
    s = float(10**k)
    return F.round(expr * F.lit(s)).cast("bigint").cast("double") / F.lit(s)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; matches DuckDB
    regexp_split_to_array(trim(x), '\\s+')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """Number of whitespace-separated tokens, as bigint (matches DuckDB
    len(regexp_split_to_array(...)) which returns BIGINT)."""
    return F.size(tokens(col)).cast("long")


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right dot product of two array<float> columns in
    double precision (order matters for float determinism — both this and
    the DuckDB oracle accumulate in array order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sq_norm(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))


def cents(col: Column | str) -> Column:
    """Exact integer cents of a 2-decimal money double (long arithmetic —
    Spark keeps it in compact primitives instead of BigDecimal)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def disc_price(price_col: str, disc_col: str) -> Column:
    """Per-row price·(1-discount) as an exact long in 1e-4 currency units
    (cent-product).  Feed to decimal_sum(scale=0); divide the final sum by
    10000.0 — or take a ratio of two such sums, where the unit cancels.

    DuckDB mirror: CAST(round(p*100) AS BIGINT) * (100 - CAST(round(d*100)
    AS BIGINT)).
    """
    p, d = cents(price_col), cents(disc_col)
    return p * (F.lit(100) - d)


def disc_price_sum(price_col: str, disc_col: str) -> Column:
    """Σ price·(1-discount) computed as per-row long cent-products summed
    under DECIMAL(38,0) (overflow-safe at any scale), divided back to a
    double.  ~40% faster than decimal×decimal per row because the row-level
    multiply stays in long registers; only the sum is wide.

    DuckDB mirror (ops must match exactly, not just the math):
    CAST(SUM(CAST(CAST(round(p*100) AS BIGINT) * (100 - CAST(round(d*100)
    AS BIGINT)) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
    """
    p, d = cents(price_col), cents(disc_col)
    return (
        F.sum((p * (F.lit(100) - d)).cast("decimal(38,0)")).cast("double") / 10000.0
    )
