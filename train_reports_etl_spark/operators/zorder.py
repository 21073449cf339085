"""Z-order (Morton) clustering keys — the multi-dimensional sort key
behind data-skipping layouts (Delta OPTIMIZE ZORDER, Hudi/Iceberg
clustering): interleaving the bits of two columns produces a single
sort key whose contiguous ranges bound BOTH dimensions, so min/max
file statistics prune on either predicate.

Pure integer bit arithmetic (shiftleft/and/or composed per bit) — no
UDF, no shuffle; the key is a narrow per-row expression you feed to a
range-partitioned sorted write (``sinks/sorted_write.py``). 16 bits
per dimension (the usual truncation: z-order clusters on the high
bits; ties within a 2^k cell are fine because file skipping works on
ranges, not exact keys).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative integer
    columns: bit i of x lands at position 2i, bit i of y at 2i+1.

    Built as a balanced tree of bitwise ORs over per-bit shifted masks
    — 2·bits leaf terms, all inside whole-stage codegen. Inputs are
    masked to ``bits`` first (callers hash or bucket wider domains
    down; z-order on high-cardinality raw values wastes bits on the
    constant prefix)."""
    xs = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ys = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftrightunsigned(xs, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftrightunsigned(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton key as portable SQL text (DuckDB oracle
    twin): ``//`` and ``%`` arithmetic instead of shift operators so
    the same string parses in both dialects if ever needed."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} // {1 << i}) % 2) * {1 << (2 * i)})")
        terms.append(f"((({y} // {1 << i}) % 2) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"
