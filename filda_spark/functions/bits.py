"""Bit-field packing/decoding column functions.

Mirrors the reference's 32-bit Algorithm_QA assembly (FILDA.py:2373-2567:
left-shift + OR accumulation, then bit reversal) and QA decode
(FILDA_IO.py:1567-1610: (qa >> i) & 1). All JVM-side expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pack_bits(*flags: Column) -> Column:
    """Pack boolean columns into an int, first flag = most significant bit
    (the reference packs test flags as 4*f1 + 2*f2 + f3, FILDA.py:978-997)."""
    out = F.lit(0)
    for flag in flags:
        out = out * F.lit(2) + flag.cast("int")
    return out


def unpack_bit(qa: Column, bit: int) -> Column:
    """(qa >> bit) & 1 (FILDA_IO.py:1567-1610)."""
    return F.floor(qa / F.lit(1 << bit)).cast("long") % F.lit(2)


def reverse_bits(qa: Column, width: int = 32) -> Column:
    """Bit-reverse within ``width`` bits (FILDA.py:2560-2567 emits QA with
    bit order reversed). Pure arithmetic so it runs in codegen."""
    out = F.lit(0).cast("long")
    for i in range(width):
        out = out + unpack_bit(qa, i) * F.lit(1 << (width - 1 - i))
    return out


def pack_bits_sql(*flag_exprs: str) -> str:
    out = "0"
    for fe in flag_exprs:
        out = f"(({out}) * 2 + (CASE WHEN {fe} THEN 1 ELSE 0 END))"
    return out


def morton_key(
    lat: Column,
    lon: Column,
    bits: int = 16,
    lat_range: tuple[float, float] = (-90.0, 90.0),
    lon_range: tuple[float, float] = (-180.0, 180.0),
) -> Column:
    """Z-order (Morton) key: interleave the top ``bits`` of the quantized
    lat/lon so byte-range-close rows are spatially close — the sort key for
    Iceberg-style data-file clustering. Pure shift/or column algebra (a
    flat ~4*bits-term expression; no nesting, so codegen stays small)."""
    from pyspark.sql import functions as F

    la0, la1 = lat_range
    lo0, lo1 = lon_range
    scale = (1 << bits) - 1
    qlat = F.least(
        F.lit(scale),
        F.greatest(F.lit(0), F.floor((lat - la0) / (la1 - la0) * scale)),
    ).cast("long")
    qlon = F.least(
        F.lit(scale),
        F.greatest(F.lit(0), F.floor((lon - lo0) / (lo1 - lo0) * scale)),
    ).cast("long")
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(qlat, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(qlon, i).bitwiseAND(F.lit(1)), 2 * i))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out
