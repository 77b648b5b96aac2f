"""Slowly-changing-dimension (Type 2) history building.

The reference's dimension syncs repeatedly overwrite a current-state
dimension table (client_dimension_pipeline/client_dimension_sync_full/
main.py — full refresh of the client dimension); warehouse consumers that
need "what was the value as of date X" have to diff snapshots by hand.
This operator derives the SCD2 history a warehouse would keep natively:
collapse a change stream (or snapshot sequence) into validity intervals
``[valid_from, valid_to)`` per key with version numbers and an
``is_current`` flag.

Scale posture: the whole computation is windows partitioned by the
dimension key — one hash shuffle on the key, no global sort, no
self-join. Consecutive-duplicate collapse uses the classic
gaps-and-islands difference of two row_numbers, which stays inside the
same shuffle (both windows share the partition key prefix).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_col: str,
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse an attribute's change stream into SCD2 validity intervals.

    For each key, rows ordered by (``ts_col``, ``tiebreak_cols``) are
    collapsed into runs of equal ``attr_col``; each run becomes one
    interval row: ``valid_from`` (first observation), ``valid_to`` (start
    of the NEXT run, null while current), ``version`` (1-based per key),
    ``is_current``, and ``n_observations`` (rows folded into the run).

    ``tiebreak_cols`` must make the ordering total (e.g. a unique event
    or order key) — equal timestamps with different attribute values are
    otherwise nondeterministic, on any engine.
    """
    keys = [F.col(c) for c in key_cols]
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w_all = Window.partitionBy(*keys).orderBy(*order)
    w_attr = Window.partitionBy(*keys, F.col(attr_col)).orderBy(*order)
    # Gaps-and-islands: within a key, consecutive rows with the same
    # attribute share (rn_all - rn_attr); any attribute change bumps it.
    runs = df.select(
        *key_cols,
        attr_col,
        *tiebreak_cols,
        F.col(ts_col).alias("__ts"),
        (F.row_number().over(w_all) - F.row_number().over(w_attr)).alias(
            "__island"
        ),
    )
    # Runs are ordered by their FIRST row's (ts, tiebreaks) — ordering by
    # valid_from alone is not total when two runs start at the same
    # timestamp (same-day attribute flips), and a non-total LEAD order is
    # engine-nondeterministic.
    intervals = runs.groupBy(*key_cols, attr_col, "__island").agg(
        F.min("__ts").alias("valid_from"),
        F.min(F.struct(F.col("__ts"), *[F.col(c) for c in tiebreak_cols])).alias(
            "__first"
        ),
        F.count(F.lit(1)).alias("n_observations"),
    )
    w_key = Window.partitionBy(*keys).orderBy("__first")
    return (
        intervals.select(
            *key_cols,
            F.col(attr_col),
            "valid_from",
            F.lead("valid_from").over(w_key).alias("valid_to"),
            F.row_number().over(w_key).alias("version"),
            "n_observations",
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )
