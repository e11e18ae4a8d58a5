"""Bloom-filter membership: the 100 TB incremental-dedup pattern.

The reference engine has no membership surface; this is the scale
extension a growing corpus needs — build a compact bitset over
yesterday's corpus once, broadcast it, and probe today's shard with a
zero-shuffle projection (classic Bloom 1970; the same shape Spark's
own runtime-filter joins and Parquet bloom indexes use).

Determinism contract: bit positions come from md5(value ':' i) — the
first 8 hex digits as an integer, mod the filter size. The identical
math runs in DuckDB (``('0x' || substr(md5(..),1,8))::BIGINT``), so
even hash COLLISIONS reproduce bit-for-bit and the oracle can replay
false positives exactly.

Scale shape:
- build: per-row bit positions (k md5 calls, all codegen'd) exploded
  to (word, mask) pairs, ``bit_or`` aggregated — map-side combinable,
  ONE shuffle whose size is min(corpus, m_bits/32) rows.
- probe: the filter is collected into a broadcast MAP column
  (m_bits/32 entries — 32-bit words so the mask arithmetic never
  overflows a signed 64-bit lane in any engine); each probe row
  tests its k bits with ``element_at`` lookups. Zero shuffle, scan
  speed.
- sizing: m_bits/n ≈ 10 bits per element with k=5 gives ~1% false
  positives; ``bloom_fp_rate`` computes the expected rate for audit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32  # signed-overflow-safe in every engine's BIGINT


def _bit_position(col: Column, i: int, m_bits: int) -> Column:
    """Deterministic i-th hash: first 32 bits of md5(value ':' i)."""
    from pidb_rdf_spark.operators.hashing import md5_prefix_long

    return md5_prefix_long(
        F.concat(col.cast("string"), F.lit(f":{i}")), 32
    ) % m_bits


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> DataFrame:
    """Build the filter: (word, bits) rows — the sparse 32-bit-word
    bitset with every member's ``k_hashes`` bits set. ``m_bits`` is
    capped at 2^32: bit positions come from a 32-bit md5 prefix, so a
    larger m would silently leave the upper bits unreachable and
    ``bloom_fp_rate`` would over-promise."""
    if not 0 < m_bits <= (1 << 32):
        raise ValueError(
            f"m_bits must be in (0, 2^32] (positions are 32-bit md5 "
            f"prefixes); got {m_bits}"
        )
    positions = F.array(
        *[_bit_position(F.col(col), i, m_bits) for i in range(k_hashes)]
    )
    return (
        df.select(F.explode(positions).alias("__pos"))
        .select(
            (F.col("__pos") / WORD_BITS).cast("long").alias("word"),
            _mask(F.col("__pos")).alias("__mask"),
        )
        .groupBy("word")
        .agg(
            # build parameters ride as column METADATA (survives
            # parquet round-trips) so a probe can verify it uses the
            # same (m_bits, k_hashes) — a mismatch would silently
            # break the no-false-negatives contract
            F.expr("bit_or(__mask)").alias(
                "bits", metadata={"m_bits": m_bits, "k_hashes": k_hashes}
            )
        )
    )


def _mask(pos: Column) -> Column:
    """2^(pos % 32) as a long — exact in the double domain (< 2^52),
    and expressible where ``shiftleft`` cannot take a column shift."""
    return F.pow(F.lit(2.0), pos % WORD_BITS).cast("long")


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    col: str,
    m_bits: int | None = None,
    k_hashes: int | None = None,
) -> DataFrame:
    """Probe: original columns + ``might_contain`` (true iff all k
    bits are set — no false negatives, deterministic false positives).

    Parameters default to the ones recorded by ``bloom_build`` in the
    ``bits`` column's metadata; passing values that DISAGREE with the
    recorded ones raises instead of silently probing the wrong bit
    positions (which would produce false negatives). Explicit values
    are only needed for a filter frame that lost its metadata.

    The filter is broadcast as a map column (``strip_boilerplate``'s
    membership idiom): m_bits/32 entries, a few MB at the default
    size, so the probe is a zero-shuffle narrow projection.
    (A missing-map coalesce is unnecessary: the ungrouped agg always
    yields one row, and ``map_from_arrays`` of empty collect_lists is
    an empty map, not NULL — covered by the empty-filter test.)
    """
    meta = dict(bloom.schema["bits"].metadata or {})
    for name, given in (("m_bits", m_bits), ("k_hashes", k_hashes)):
        if name in meta and given is not None and given != meta[name]:
            raise ValueError(
                f"bloom_probe {name}={given} disagrees with the filter's "
                f"recorded {name}={meta[name]}"
            )
    m_bits = m_bits if m_bits is not None else meta.get("m_bits", 1 << 20)
    k_hashes = (
        k_hashes if k_hashes is not None else meta.get("k_hashes", 5)
    )
    words = F.collect_list("word")
    bmap = F.broadcast(
        bloom.agg(
            F.map_from_arrays(words, F.collect_list("bits")).alias("__bloom")
        )
    )
    positions = F.array(
        *[_bit_position(F.col(col), i, m_bits) for i in range(k_hashes)]
    )
    hit = F.forall(
        positions,
        lambda p: (
            F.coalesce(
                F.element_at(
                    F.col("__bloom"), (p / WORD_BITS).cast("long")
                ),
                F.lit(0).cast("long"),
            ).bitwiseAND(_mask(p))
            != 0
        ),
    )
    return df.crossJoin(bmap).withColumn("might_contain", hit).drop("__bloom")


def bloom_fp_rate(n_items: int, m_bits: int = 1 << 20, k_hashes: int = 5) -> float:
    """Expected false-positive rate (1 - e^(-kn/m))^k — the audit
    number to log next to any probe at scale."""
    return (1.0 - math.exp(-k_hashes * n_items / m_bits)) ** k_hashes
