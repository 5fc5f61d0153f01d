"""Skew-mitigation: salted joins.

AQE's skew-join split handles most skew automatically (enabled in
session.py); salting is the explicit fallback for pathological keys or
for engines/stages AQE cannot split (e.g. aggregations feeding a join).

``salted_join``: the big (skewed) side gets a deterministic salt from
its row content; the small side is exploded n_salts times so every
(key, salt) bucket finds its match. Result is row-identical to the
plain join, but the hot key's rows spread over n_salts reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SALTED_JOIN_HOWS = ("inner", "left", "left_outer", "left_semi", "left_anti")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the big side salted across n_salts.

    The salt is derived from a deterministic hash of the big side's
    full row (stable across retries — no rand()).

    ``how`` is restricted to big-side-preserving variants
    (inner/left/left_semi/left_anti): with ``right`` or ``full``, every
    unmatched small-side row would surface once per salt replica.
    """
    if how not in SALTED_JOIN_HOWS:
        raise ValueError(
            f"salted_join supports {SALTED_JOIN_HOWS}, got {how!r}: "
            "right/full would emit unmatched small-side rows n_salts times"
        )
    big_cols = [c for c in big.columns]
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big_cols]), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    salted_small = small.withColumn("__salt", salts)
    joined = salted_big.join(salted_small, [on, "__salt"], how)
    return joined.drop("__salt")
