"""Vector (embedding) column expressions — extension surface for
similarity search over `array<float>` embedding columns.

All pure Catalyst higher-order functions (`zip_with`/`aggregate`),
computed in float64: JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# When both inputs are plain column NAMES (every hot caller), the
# expressions below are assembled as ONE parsed SQL string instead of
# py4j Column objects: each lambda-built HOF costs ~10-30 driver⇄JVM
# roundtrips (30-70 ms per call, re-paid on every query build — the
# same serial-driver-time tax `hyperplane_signature` and ivf_pq's
# distance table shed). The string parses to the IDENTICAL expression
# tree (same casts, same left-to-right fold order), so executed plans
# and values are bit-for-bit unchanged; Column inputs keep the lambda
# path. The fast path is gated on SIMPLE identifiers: a dotted name
# ('a.b') means a nested struct field under F.col but a backtick-
# quoted literal column in SQL — semantics would silently diverge
# (round-11 ADVICE), so anything that is not a plain identifier
# falls back to the Column path.


def _simple(*names) -> bool:
    return all(isinstance(n, str) and n.isidentifier() for n in names)


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with(`{a}`, `{b}`, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, p) -> acc + p)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(aggregate(`{a}`, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in float64 (left-to-right, matching ANSI SQL reduce
    order so oracle engines agree bit-for-bit)."""
    if _simple(a, b):
        return F.expr(_dot_sql(a, b))
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def norm(a: Column | str) -> Column:
    if _simple(a):
        return F.expr(_norm_sql(a))
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (ANSI-safe)."""
    if _simple(a, b):
        denom = f"({_norm_sql(a)} * {_norm_sql(b)})"
        return F.expr(
            f"CASE WHEN {denom} = 0 THEN CAST(0.0 AS DOUBLE) "
            f"ELSE {_dot_sql(a, b)} / {denom} END"
        )
    d = dot(a, b)
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(d / denom)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    if _simple(a, b):
        return F.expr(
            f"sqrt(aggregate(zip_with(`{a}`, `{b}`, "
            "(x, y) -> power(CAST(x AS DOUBLE) - CAST(y AS DOUBLE), 2)), "
            "CAST(0.0 AS DOUBLE), (acc, d) -> acc + d))"
        )
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


def cosine_batch(a: Column | str, b: Column | str) -> Column:
    """Cosine via a vectorized Arrow `pandas_udf` — the Python-side
    twin of `cosine` for workloads where per-batch numpy beats the
    interpreted HOF fold.

    When to use which — MEASURED (2M pairs × 64 dims, local[32]):
    HOF fold 3.25 s, pandas_udf 3.34 s over a 0.44 s generation
    floor — a wash; the Arrow boundary costs about what numpy's
    batched einsum saves at this dim count. So the HOF `cosine`
    stays the default everywhere (JVM-side, zero serialization, no
    Python-worker memory), and this variant is the template for
    where the trade flips: when each shipped vector amortizes MANY
    scorings (brute-force query×corpus scoring inside one batch) or
    per-element math gets heavier than multiply-add. Float caveat:
    numpy's summation order differs from a sequential fold, so
    results differ from `cosine` in the last ~2 ulps — round before
    comparing across engines, and don't mix the two variants inside
    one ranking."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(xs: pd.Series, ys: pd.Series) -> pd.Series:
        xa = np.stack(xs.to_numpy()).astype("float64")
        ya = np.stack(ys.to_numpy()).astype("float64")
        dots = np.einsum("ij,ij->i", xa, ya)
        denom = np.linalg.norm(xa, axis=1) * np.linalg.norm(ya, axis=1)
        out = np.where(denom == 0, 0.0, dots / np.where(denom == 0, 1.0, denom))
        return pd.Series(out)

    return _cos(_c(a), _c(b))
