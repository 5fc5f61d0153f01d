"""Vector math over `array<float>` embedding columns — JVM-side only.

Dot products fold sequentially in array order in double precision
(`F.aggregate` over `F.zip_with`), which the oracle mirrors with an
explicit left-associated sum — bitwise-identical IEEE results.

Scale: these are per-row projections inside codegen; no UDF, no Arrow
transfer. Brute-force KNN broadcasts the (small) query side; the LSH
operator in operators/similarity.py is the 100 TB path.
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
