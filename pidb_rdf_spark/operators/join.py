"""Skew-aware join helpers.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
on by default in ``session.get_spark``) handles most skew at runtime;
``salted_join`` is the manual fallback for the cases AQE cannot fix —
a single hot key whose matching build side also overflows one task,
or a join inside a cached/checkpointed subtree AQE will not re-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join where ``left`` is skewed on the key(s): every left row gets
    a deterministic salt in ``[0, n_salts)`` (hash of the whole row —
    no RNG, rerun-stable), the right side is replicated once per salt,
    and the shuffle keys become (key, salt) — a hot key's rows spread
    over ``n_salts`` reducers instead of one straggler task.

    Result is row-identical to the unsalted join (each left row
    carries exactly one salt and meets the one matching right
    replica). Supports ``inner`` and ``left`` joins; the right-side
    replication factor is the cost — use on the skewed side only.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l.join(r, on=keys + ["__salt"], how=how)
    return out.drop("__salt")
