"""Z-order (Morton) interleaving as a pure JVM-side expression — the
multi-dimensional clustering key behind data-skipping layouts
(Delta/Iceberg OPTIMIZE ZORDER BY): sorting by the interleaved key
keeps files tight in BOTH dimensions, so a 2-D box predicate prunes
most files by footer min/max stats instead of scanning one dimension
well and the other not at all.

No UDF: the bit interleave is a higher-order fold over bit positions
(same construction as the SimHash packer), so it runs inside
whole-stage codegen and costs nothing extra at write time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    Returns a long usable as a sort/range-partition key."""
    shr = lambda h, i: F.call_function("shiftright", h, i)  # noqa: E731
    shl = lambda h, i: F.call_function("shiftleft", h, i)  # noqa: E731
    al = a.cast("long")
    bl = b.cast("long")
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + shl(shr(al, i).bitwiseAND(F.lit(1)), 2 * i)
        + shl(shr(bl, i).bitwiseAND(F.lit(1)), 2 * i + 1),
    )
