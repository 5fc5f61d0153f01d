"""Z-order data layout — multi-column data skipping for parquet lakes.

A table sorted on one column prunes scans filtered on that column only;
interleaving the bits of several columns' quantized ranks (a Z-order /
Morton curve) yields a sort key under which every output file holds a
small hyper-rectangle of the combined key space — per-file min/max
footer stats stay tight on EVERY participating column, so predicates
on any of them skip most files. This is the OPTIMIZE ZORDER BY of
Delta/Iceberg expressed with vanilla Spark primitives:
repartitionByRange + sortWithinPartitions on the computed z-value.

Scale: quantization bounds come from one metadata-scale aggregate (2N
scalars to the driver); the layout write is a single range shuffle —
the same cost as any global sort — paid once at write time and repaid
on every subsequent scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per column in the interleave; n_cols * ZBITS must stay < 63.
ZBITS = 16


def quantize(col: Column, lo, hi, bits: int = ZBITS) -> Column:
    """Map a numeric column into [0, 2^bits) by linear rank between the
    observed bounds (degenerate domains map to 0)."""
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(
        F.lit(top).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.floor(scaled * top).cast("long")),
    )


def zorder_value(qcols: list[Column], bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` of each quantized column into one
    long: bit b of column j lands at position b * n + j. Pure JVM bit
    math — whole-stage codegen, no UDF."""
    n = len(qcols)
    assert n * bits < 63, "z-value must fit a signed long"
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, q in enumerate(qcols):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + j)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = ZBITS,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``.

    repartitionByRange on the z-value splits the curve into ``n_files``
    contiguous segments (one range shuffle); sortWithinPartitions
    orders rows inside each file so row-group stats are tight too.
    """
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    qs = [
        quantize(F.col(c), bounds[f"lo_{c}"], bounds[f"hi_{c}"], bits) for c in cols
    ]
    z = zorder_value(qs, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
