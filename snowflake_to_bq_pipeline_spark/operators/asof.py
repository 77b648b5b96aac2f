"""As-of (point-in-time) join — a core operator Spark lacks natively.

For each left row, attach the newest right row with the same key and
``right_ts <= left_ts`` (e.g. "the last purchase before this click",
"the price in effect at trade time").

Implementation is the scalable union-and-carry-forward plan, NOT a range
cross join: tag both sides, union, sort within each key partition by
(ts, side) with right rows ordered first at equal timestamps, and
carry the right payload forward with last(ignorenulls) over an
unbounded-preceding window. One hash shuffle on the key, linear work per
partition — the same cost profile as a window dedup, independent of how
many right rows precede each left row (a naive ``left.ts >= right.ts``
join explodes quadratically per key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import latest_record


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + carried-forward newest right payload per key.

    ``right`` is first deduped to one row per (key, ts) (newest payload
    wins on exact timestamp ties) so the match is well-defined; right
    payload columns come back as ``{prefix}{col}``, NULL when no right
    row precedes the left row.
    """
    from pyspark.sql.types import StructField, StructType

    right_unique = latest_record(
        right.select(*key_cols, right_ts, *right_payload),
        [*key_cols, right_ts],
        right_payload[0] if right_payload else right_ts,
    )

    # The payload travels as ONE struct so every column of the result comes
    # from the SAME matched right row. Carrying columns independently with
    # last(ignorenulls) would back-fill a NULL payload field from an older
    # right row — stitching values across rows and breaking ASOF semantics.
    payload_type = StructType(
        [StructField(c, right_unique.schema[c].dataType) for c in right_payload]
    )
    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    # Key columns (same names on both sides) carry the right row's keys;
    # every other left column is NULL on right-side rows.
    r_tagged = right_unique.select(
        *[
            F.col(c) if c in key_cols
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in right_payload]).alias("__payload"),
    )

    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left.columns,
        "__side",
        F.last(F.col("__payload"), ignorenulls=True).over(w).alias("__payload"),
    )
    return carried.filter(F.col("__side") == 1).select(
        *left.columns,
        *[
            F.col("__payload").getField(c).alias(f"{prefix}{c}")
            for c in right_payload
        ],
    )
