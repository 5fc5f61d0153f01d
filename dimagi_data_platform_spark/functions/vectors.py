"""Vector math over `array<float>` embedding columns — JVM-side only.

Two forms:
- ``dot``/``cosine``: higher-order-function fold (any dim) — flexible
  but interpreted per element; fine for one-off projections.
- ``dot_fixed``/``cosine_fixed``: explicit unrolled sum for a known
  dim — pure whole-stage-codegen arithmetic, ~50x faster in pairwise
  joins, and left-associated exactly like the oracle SQL's term chain
  so results are bitwise identical.

Both fold sequentially in double: ((0.0 + t1) + t2) + ...

Scale: per-row codegen expressions; no UDF, no Arrow transfer. Callers
doing pairwise work precompute norms per side (see operators/similarity)
instead of per pair.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a, b) -> Column:
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_fixed(a, b, dim: int) -> Column:
    a, b = _c(a), _c(b)
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a.getItem(i).cast("double") * b.getItem(i).cast("double")
    return acc


def norm_fixed(a, dim: int) -> Column:
    return F.sqrt(dot_fixed(a, a, dim))


def cosine_fixed(a, b, dim: int) -> Column:
    return dot_fixed(a, b, dim) / (norm_fixed(a, dim) * norm_fixed(b, dim))
