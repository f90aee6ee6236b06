"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

The reference writes its output as date-partitioned CSV (P:26-30, P:381)
— a single-dimension layout. At 100 TB, queries filter on more than one
key (part AND supplier, user AND time); a Z-order clustered layout lets
parquet min/max stats prune files for predicates on ANY interleaved
dimension, where a lexicographic sort only prunes its leading key.

Everything here is pure JVM bit arithmetic on Columns (whole-stage
codegen keeps it in the scan's projection); the layout itself is applied
with plain ``repartitionByRange(zval).sortWithinPartitions(zval)`` +
``write`` — no custom committer, no RDDs.

Classic Morton spreading (bit-twiddling hacks, public domain): spread the
low 16 bits of each key to the even bit positions of a 32-bit word, then
OR the second key's spread shifted left by one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to even bit positions (0,2,..30)."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton_interleave(x: Column, y: Column) -> Column:
    """32-bit Morton code of two 16-bit keys: x on even bits, y on odd.

    Adjacent z-values differ in few low bits of either key, so contiguous
    z-ranges cover bounded rectangles of the (x, y) key space — the
    property that makes range-partitioned z-sorted files prunable by
    min/max stats on both columns.
    """
    return spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1))


def zorder_by(df: DataFrame, x: str, y: str, n_files: int = 64) -> DataFrame:
    """Cluster ``df`` for writing: range-partition + sort by the Morton
    code of (x, y). The caller writes the result with
    ``.write.parquet(...)``; each output file then carries narrow min/max
    spans on BOTH x and y (see catalog op-zorder-layout for the produced
    stats), so scans filtered on either column skip most files.

    Keys wider than 16 bits: pre-quantize (rank-bucket or right-shift)
    before interleaving — pruning needs only monotone bucketing, not the
    full key.
    """
    z = morton_interleave(F.col(x).bitwiseAND(F.lit(0xFFFF)),
                          F.col(y).bitwiseAND(F.lit(0xFFFF)))
    return (df.withColumn("_zval", z)
              .repartitionByRange(n_files, "_zval")
              .sortWithinPartitions("_zval"))
