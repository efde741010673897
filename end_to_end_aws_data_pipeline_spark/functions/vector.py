"""Vector math over ``array<float|double>`` columns.

Two implementations of the same semantics:
- expression form (zip_with/aggregate folds): JVM-side, codegen'd,
  deterministic left-to-right accumulation — used by every
  oracle-checked operator;
- Arrow-batched Pandas UDF form (numpy): the escape hatch pattern for
  math that built-ins cannot express; numpy's pairwise summation makes
  results differ from the fold in the last ulps, so it is used only
  where bit-exactness doesn't matter (tests assert 1e-9 closeness).

Elements are cast to DOUBLE before arithmetic so float32 storage widens
identically everywhere.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def fsum(arr: Column) -> Column:
    """Sequential left fold sum of an array<double> (deterministic order)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return fsum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def l2_norm(a: Column) -> Column:
    return F.sqrt(fsum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def dot_raw(a: Column, b: Column) -> Column:
    """Dot product of two already-double arrays (no per-element cast) —
    for pre-normalized vectors where cosine ≡ plain dot."""
    return fsum(F.zip_with(a, b, lambda x, y: x * y))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize (cosine on normalized vectors ≡ monotone in
    euclidean distance — the trick that lets euclidean LSH answer
    cosine queries)."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


@F.pandas_udf(T.DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine: numpy vectorized over the batch."""
    import numpy as np

    # widen to float64 first — Arrow hands over raw float32 storage and
    # numpy would otherwise accumulate in float32
    av = np.stack(a.to_numpy()).astype(np.float64)
    bv = np.stack(b.to_numpy()).astype(np.float64)
    num = (av * bv).sum(axis=1)
    den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
    return pd.Series(num / den)
