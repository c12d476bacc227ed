"""Vector (embedding) column expressions — extension surface for
similarity search over `array<float>` embedding columns.

All pure Catalyst higher-order functions (`zip_with`/`aggregate`),
computed in float64: JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in float64 (left-to-right, matching ANSI SQL reduce
    order so oracle engines agree bit-for-bit)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (ANSI-safe)."""
    d = dot(a, b)
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(d / denom)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(
        _c(a), _c(b), lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d))


def normalize(a: Column | str) -> Column:
    """Unit-normalize an embedding (pre-normalizing once turns cosine
    top-k into dot-product top-k — the cheap path at scale)."""
    n = norm(a)
    as_double = F.transform(_c(a), lambda x: x.cast("double"))
    return F.when(n == 0, as_double).otherwise(
        F.transform(as_double, lambda x: x / n)
    )
