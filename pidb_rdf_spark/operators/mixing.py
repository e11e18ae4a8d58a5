"""Training-mixture construction: deterministic weighted source
sampling against a token budget (the Pile / LLaMA / Dolma mixture
step — per-source target shares, upsampling by whole epochs plus a
fractional remainder, downsampling by rate).

No reference analog (the reference is a graph store); this extends
the curation family (``curation.hash_sample``) with the step that
turns per-source weights into an actual training set.

Scale shape: the only driver-side data is the per-source token
aggregate (vocabulary-sized by construction — a mixture has tens of
sources, not millions). The plan itself is one broadcast join of the
per-source rate table + one ``explode(sequence(...))`` for epoch
replication + one filter on a deterministic integer hash — no
shuffle beyond the aggregate, no Python in the row path.

Determinism: the fractional sample keeps row (id, epoch) iff
``((id+1) * 2654435761 + epoch * 97003) mod 2147483647 / 2147483647
< frac`` — pure integer arithmetic plus one double division, so the
same rows are chosen on every engine and at any partitioning (the
property the curation family's ``hash_sample`` established; rerunning
with a larger budget keeps a superset of each epoch's rows only when
rates do not cross epoch boundaries — document for users).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761
_EPOCH_SALT = 97003
_MOD = 2147483647


def unit_hash(id_col, epoch_col):
    """Deterministic uniform-ish value in [0, 1) from (id, epoch) —
    exact integer arithmetic, one final double division."""
    h = (
        (F.col(id_col) + F.lit(1)) * F.lit(_KNUTH)
        + F.col(epoch_col) * F.lit(_EPOCH_SALT)
    ) % F.lit(_MOD)
    return h / F.lit(float(_MOD))


def mixture_rates(
    docs: DataFrame,
    weights: dict,
    budget_tokens: float,
    temperature: float = 1.0,
    source_col: str = "source",
    token_col: str = "n_chars",
) -> list:
    """Per-source (source, available, target, rate) for a weighted
    mixture: share_s = w_s^(1/T) / sum(w^(1/T)), target_s = budget *
    share_s, rate_s = target_s / available_s. Sources with no/zero
    weight are excluded. The per-source aggregate is the ONLY
    collect — bounded by the number of sources."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    avail = {
        r["s"]: r["a"]
        for r in docs.groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(token_col).alias("a"))
        .collect()
    }
    keep = sorted(
        s for s, w in weights.items() if w > 0 and avail.get(s, 0) > 0
    )
    if not keep:
        raise ValueError("no source has positive weight and data")
    if temperature == 1.0:  # skip pow(): exact engine-portable shares
        wt = {s: float(weights[s]) for s in keep}
    else:
        wt = {s: float(weights[s]) ** (1.0 / temperature) for s in keep}
    sum_w = 0.0
    for s in keep:  # fixed (sorted) accumulation order — deterministic
        sum_w += wt[s]
    out = []
    for s in keep:
        share = wt[s] / sum_w
        target = budget_tokens * share
        rate = target / avail[s]
        out.append((s, avail[s], target, rate))
    return out


def mix_sources(
    docs: DataFrame,
    weights: dict,
    budget_tokens: float,
    temperature: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_chars",
) -> DataFrame:
    """The mixed training set: every input column plus ``epoch``.

    A source with rate r contributes floor(r) full copies (epochs
    0..floor(r)-1) and one fractionally-sampled epoch floor(r) at
    rate frac(r) — the standard upsample-by-epochs construction, so
    a document never repeats within an epoch and repeats at most
    ceil(r) times overall. Expected token total = budget (per
    source: available * rate = target)."""
    rates = mixture_rates(
        docs, weights, budget_tokens, temperature, source_col, token_col
    )
    spark = docs.sparkSession
    rate_df = spark.createDataFrame(
        [(s, int(r // 1), r - int(r // 1)) for s, _a, _t, r in rates],
        f"{source_col} string, __nfull int, __frac double",
    )
    return (
        docs.join(F.broadcast(rate_df), on=source_col)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("__nfull")))
        )
        .filter(
            (F.col("epoch") < F.col("__nfull"))
            | (unit_hash(id_col, "epoch") < F.col("__frac"))
        )
        .drop("__nfull", "__frac")
    )
