"""Semi-structured (JSON) column operators.

Event/telemetry tables carry JSON payload columns (the testdata's
``events.props``); at 100 TB the wrong way to read them is a Python
``json.loads`` UDF per row. These operators stay JVM-side:
``from_json`` parses inside whole-stage codegen with an explicit
schema, so Catalyst prunes unreferenced fields and the parse cost is
vectorized — a narrow zero-shuffle projection.

Reference scope: the reference engine stores arbitrary per-statement
properties as opaque strings (pidb-rdf-engine property maps); typed
extraction is the Spark-native equivalent surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["json_extract_fields", "json_kv_explode"]


def json_extract_fields(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
    drop_source: bool = False,
) -> DataFrame:
    """Extract typed fields from a JSON string column.

    ``fields`` maps output column name -> Spark SQL type string
    (e.g. ``{"k": "int", "tag": "string"}``). Parsing happens once
    per row via ``from_json`` with a struct schema built from
    ``fields``; missing keys and malformed documents yield NULL (the
    PERMISSIVE contract), so a corrupt payload never fails the job.
    Zero shuffle; the parse runs inside codegen.
    """
    if not fields:
        raise ValueError("fields must name at least one key to extract")
    schema = ", ".join(f"`{name}` {typ}" for name, typ in fields.items())
    parsed = df.withColumn("__parsed", F.from_json(F.col(json_col), schema))
    for name in fields:
        parsed = parsed.withColumn(name, F.col("__parsed")[name])
    parsed = parsed.drop("__parsed")
    return parsed.drop(json_col) if drop_source else parsed


def json_kv_explode(
    df: DataFrame,
    json_col: str,
    id_cols: list[str] | None = None,
    key_alias: str = "key",
    value_alias: str = "value",
) -> DataFrame:
    """Explode a flat JSON object column into (key, value) rows.

    For payloads with OPEN schemas (unknown key sets), parse as
    ``map<string,string>`` and explode — the long-format twin of
    ``json_extract_fields``. Values are surfaced as strings (JSON
    scalars verbatim); cast downstream once the key is known. Row
    count grows by the average key count; still shuffle-free.

    The output aliases must not collide with a kept id column (the
    events table itself has a ``value`` column) — rename via
    ``key_alias``/``value_alias`` or the call is rejected rather
    than emitting an ambiguous duplicate column.
    """
    id_cols = id_cols or [c for c in df.columns if c != json_col]
    clash = {key_alias, value_alias} & set(id_cols)
    if clash:
        raise ValueError(
            f"output alias(es) {sorted(clash)} collide with kept id "
            "columns; pass key_alias/value_alias or trim id_cols"
        )
    m = F.from_json(F.col(json_col), "map<string,string>")
    return df.select(
        *id_cols, F.explode_outer(m).alias(key_alias, value_alias)
    )
