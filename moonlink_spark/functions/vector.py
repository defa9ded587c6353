"""Vector arithmetic for embedding columns: two interchangeable engines.

``dot_fold`` / ``cosine_fold`` — pure-SQL ``aggregate(zip_with(...))``
folds. Sequential left-to-right accumulation, bit-identical to DuckDB's
``list_dot_product``: the ONLY correct choice wherever results feed an
oracle hash-check or a threshold whose two sides must agree exactly.

``dot_np`` / ``cosine_np`` — Arrow-batched pandas UDFs over numpy
``einsum``. Measured on this box at sf0.1 (64-dim, 2.5M pairs, warm):
fold 5.5 s vs numpy 2.5 s — ~2.2x, and the gap widens with pair count
because the per-batch Arrow transfer amortizes while the fold stays
interpreted per element. Accumulation order differs from the fold
(pairwise/blocked), so values can differ in the last ulps: use for
production similarity/dedup hot paths where a 1e-15 wobble is
irrelevant, never for oracle-gated comparisons.

This split is deliberate engine design, not duplication: correctness
surfaces pin bit-exact arithmetic; throughput surfaces take the
vectorized path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def dot_fold(a: str, b: str) -> Column:
    """Sequential-fold dot product (oracle-exact)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    )


def norm_fold(a: str) -> Column:
    """Sequential-fold L2 norm (oracle-exact)."""
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * "
            f"CAST(x AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
        )
    )


def cosine_fold(a: str, b: str) -> Column:
    """Sequential-fold cosine similarity (oracle-exact)."""
    return dot_fold(a, b) / (norm_fold(a) * norm_fold(b))


@pandas_udf(DoubleType())
def _np_dot(ea: pd.Series, eb: pd.Series) -> pd.Series:
    import numpy as np

    A = np.stack(ea.values)
    B = np.stack(eb.values)
    return pd.Series(np.einsum("ij,ij->i", A, B))


@pandas_udf(DoubleType())
def _np_cosine(ea: pd.Series, eb: pd.Series) -> pd.Series:
    import numpy as np

    A = np.stack(ea.values)
    B = np.stack(eb.values)
    num = np.einsum("ij,ij->i", A, B)
    den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    return pd.Series(num / den)


def dot_np(a, b) -> Column:
    """Vectorized dot product (Arrow-batched numpy; ~2x the fold on the
    pair-scoring hot path, last-ulp differences possible)."""
    return _np_dot(a, b)


def cosine_np(a, b) -> Column:
    """Vectorized cosine similarity (Arrow-batched numpy)."""
    return _np_cosine(a, b)
