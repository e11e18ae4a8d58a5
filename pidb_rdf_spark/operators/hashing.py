"""Shared deterministic hash plumbing.

One home for the md5-prefix-to-long idiom every replayable operator
builds on (dedup base hashes, Bloom bit positions, KMV unit hashes,
winnowing k-gram hashes): any engine with md5 + hex parsing
recomputes the value bit-for-bit, which is what lets the SQL oracles
replay candidate generation exactly. Collision-sensitive code should
import from here rather than re-rolling the expression — the 52-bit
variants rely on the value being exact in a double, and keeping that
reasoning in one place keeps the Spark side and the oracles in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["md5_prefix_long"]


def md5_prefix_long(col: Column, bits: int = 32) -> Column:
    """First ``bits`` (≤60) bits of md5 as a non-negative long — the
    cross-engine-reproducible base hash. The 60-bit cap keeps the
    value inside a signed 64-bit integer everywhere; 52 bits and
    below are additionally exact in a double (hex chars are 4 bits,
    so 52 → the first 13 hex chars with no shift)."""
    if bits > 60:
        raise ValueError("md5 hash slice must fit a signed long: bits <= 60")
    nhex = (bits + 3) // 4
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, nhex), 16, 10).cast(
        "long"
    )
    if nhex * 4 > bits:
        h = F.shiftright(h, nhex * 4 - bits)
    return h
