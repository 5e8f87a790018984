"""Vector math over ArrayType(FloatType) embedding columns using
built-in higher-order functions (zip_with / aggregate) — JVM-side,
sequential left-fold accumulation in DOUBLE (deterministic and
mirrorable in DuckDB's list_dot_product).

UDF-free by design: at 100 TB the dot products run inside codegen;
a Pandas-UDF variant would pay Arrow serialization for no gain on
64-dim vectors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in DOUBLE."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (||a|| * ||b||) — norms multiplied separately (match
    the oracle formula exactly; sqrt(na)*sqrt(nb) != sqrt(na*nb) in fp)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
