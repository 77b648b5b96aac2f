"""Semi-structured column handling (the VARIANT-flattening surface).

The reference's source system stores semi-structured payloads (Snowflake
VARIANT; the sync scripts SELECT them as JSON text and BigQuery re-parses
on the target side). The engine-native form: typed extraction with
``get_json_object`` + casts — JVM-side, codegen-friendly, no Python —
plus a profile aggregate that answers "how well-typed is this payload
column" before a schema is committed.

Scale: extraction is a per-row projection (no shuffle); the profile is
one hash aggregation. JSON parsing cost is the scan's problem — at
100 TB prefer landing frequently-read fields as real columns via
``flatten_json`` + write, which is exactly what the reference's sync
does by hand.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_json(
    df: DataFrame,
    json_col: str,
    fields: Sequence[tuple[str, str, str]],
) -> DataFrame:
    """Extract typed fields from a JSON text column.

    ``fields`` is ``(output_name, json_path, spark_type)`` — e.g.
    ``("k", "$.k", "long")``. Unparseable or absent values become null
    (``try_cast`` — ANSI mode would otherwise fail the job on one bad row), which is what the profile measures.
    """
    return df.select(
        "*",
        *[
            F.get_json_object(F.col(json_col), path)
            .try_cast(dtype)
            .alias(name)
            for name, path, dtype in fields
        ],
    )


def props_profile(
    events: DataFrame,
    group_col: str = "event_type",
    json_col: str = "props",
    field: str = "k",
) -> DataFrame:
    """Typed-extraction profile of a JSON payload field per group:
    extraction coverage and value stats — the look-before-you-commit
    check for promoting a VARIANT field to a real column."""
    k = F.get_json_object(F.col(json_col), f"$.{field}").try_cast("long")
    return (
        events.select(F.col(group_col), k.alias("__k"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("__k").alias("n_with_field"),
            F.sum("__k").alias("field_sum"),
            F.min("__k").alias("field_min"),
            F.max("__k").alias("field_max"),
            F.countDistinct("__k").alias("field_distinct"),
        )
    )
