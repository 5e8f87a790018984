"""Vector math over ArrayType(FloatType) embedding columns using
built-in higher-order functions (zip_with / aggregate) — JVM-side,
sequential left-fold accumulation in DOUBLE (deterministic and
mirrorable in DuckDB's list_dot_product).

UDF-free by design: at 100 TB the dot products run inside codegen;
a Pandas-UDF variant would pay Arrow serialization for no gain on
64-dim vectors.
"""

from __future__ import annotations

import pandas as pd
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


def _fold_sum(P):
    """Strict left-fold-from-0.0 row sums of a float64 matrix: the last
    column of a cumulative sum IS the sequential fold (cumsum must emit
    every prefix, so it cannot reassociate the way pairwise np.sum
    does), and the prepended 0.0 column reproduces ``aggregate``'s
    F.lit(0.0) seed exactly (0.0 + (-0.0) is +0.0; a seedless cumsum
    would keep -0.0 for an all-(-0.0) row)."""
    import numpy as np

    Z = np.empty((P.shape[0], P.shape[1] + 1), dtype=np.float64)
    Z[:, 0] = 0.0
    Z[:, 1:] = P
    return np.cumsum(Z, axis=1)[:, -1]


def cosine_arrow(a: Column | str, b: Column | str) -> Column:
    """Arrow-batched EXACT twin of ``cosine``: bit-identical doubles,
    vectorized instead of interpreted.

    The HOF ``cosine`` evaluates its zip_with/aggregate lambdas
    INTERPRETED per element (~190 expression evals per 64-dim pair), so
    scoring joins that touch 10^5+ pairs pay seconds at sf0.1 and the
    same per-byte tax at 100 TB (guide §4.2: hand whole batches to
    vectorized native code).  This twin reproduces the identical IEEE
    arithmetic — float->double widening is exact, the elementwise
    products are the same, the summation is the same left fold from 0.0
    (see _fold_sum), the final expression is the same
    dot / (sqrt(na) * sqrt(nb)) tree — so results are bit-identical BY
    CONSTRUCTION to the HOF path and to DuckDB's list_dot_product
    replay (both fold sequentially), not merely close.

    Zero-norm rows: emitted as null (NaN in the Arrow batch — Spark's
    Arrow reader maps float NaN to null).  The HOF twin's behavior
    there depends on spark.sql.ansi.enabled (NULL when off, a
    DIVIDE_BY_ZERO error under Spark 4's default ANSI mode — measured
    r15), so the kernel is the strictly-more-robust side; no fixture
    carries a zero-norm vector, which is why the HOF sites never threw.
    NULL input arrays yield null, matching the HOF's null propagation.
    Precondition (same as the HOF + oracle surface): finite components.
    Bit-exactness is asserted over the full sf0.1 query x corpus cross
    (99,950 pairs, zero mismatches, r15) and pinned by
    tests/test_similarity.py::test_cosine_arrow_bit_exact.
    """
    import numpy as np

    @F.pandas_udf("double")
    def _cos(sa: pd.Series, sb: pd.Series) -> pd.Series:
        if len(sa) == 0:
            return pd.Series([], dtype="float64")
        out = np.full(len(sa), np.nan, dtype=np.float64)
        valid = (~sa.isna()) & (~sb.isna())
        if valid.any():
            A = np.stack(sa[valid].to_numpy()).astype(np.float64)
            B = np.stack(sb[valid].to_numpy()).astype(np.float64)
            d = _fold_sum(A * B)
            den = np.sqrt(_fold_sum(A * A)) * np.sqrt(_fold_sum(B * B))
            with np.errstate(divide="ignore", invalid="ignore"):
                r = d / den
            r[den == 0.0] = np.nan  # Spark double /0.0 -> NULL
            out[valid.to_numpy()] = r
        return pd.Series(out)

    return _cos(_c(a), _c(b))
