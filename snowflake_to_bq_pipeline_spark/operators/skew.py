"""Skew-mitigation utilities.

AQE's skew-join splitting (on in session.py) handles most runtime skew;
``salted_join`` is the explicit fallback for pathological hot keys — e.g. a
null-heavy foreign key or one client owning half the fact table — where
even a split partition overwhelms a task. The hot side's rows get a random
salt in [0, S); the small side replicates S× with every salt; joining on
(key, salt) spreads each hot key over S tasks.

Salt comes from a hash of the row's own key + a per-row monotonic id, not
rand(): deterministic plans are re-runnable and test-stable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key_cols: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Join a skew-prone fact side to a smaller side on ``key_cols``.

    The small side is exploded ``salt_buckets``× — keep it broadcastable
    (after explosion) or the cure costs more than the disease.

    Left-oriented joins only: with the small side replicated per salt, a
    right/full outer join would emit each unmatched small-side key once
    PER SALT — salt_buckets duplicate null-extended rows. (left_semi/
    left_anti stay correct: every key carries all salts on the replicated
    side, so per-left-row match status is unchanged.)
    """
    allowed = ("inner", "left", "left_outer", "left_semi", "leftsemi",
               "left_anti", "leftanti")
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {allowed}, got {how!r}: replicating "
            "the small side duplicates unmatched keys in right/full joins"
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in key_cols], F.monotonically_increasing_id()),
        F.lit(salt_buckets),
    ).cast("int")
    left = skewed.withColumn("__salt", salt)
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = left.join(right, [*key_cols, "__salt"], how)
    return out.drop("__salt")


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """Heavy-hitter diagnostics for a prospective shuffle/join key.

    The operational question behind salting and AQE skew-join tuning:
    which keys are hot, and how hot relative to the mean bucket? Emits
    the ``top_k`` keys by row count with their global share and
    skew-vs-mean factor (count / (total_rows / distinct_keys)).

    Plan shape for 100 TB: one hash aggregation keyed on ``key_col``
    (map-side partial combine makes the shuffle O(distinct keys), not
    O(rows)), a 1-row global aggregate over those counts, and a
    ``sort().limit(k)`` which Spark executes as TakeOrderedAndProject —
    parallel per-partition top-k, never a single-partition sort of the
    key table.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    top = counts.orderBy(F.col("n_rows").desc(), F.col("key_value")).limit(top_k)
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key_value"))
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            "key_value",
            "n_rows",
            F.row_number().over(w).alias("key_rank"),
            F.round(
                F.col("n_rows").cast("double") / F.col("__total").cast("double"), 6
            ).alias("share"),
            F.round(
                F.col("n_rows").cast("double")
                / (F.col("__total").cast("double") / F.col("__n_keys").cast("double")),
                4,
            ).alias("skew_vs_mean"),
        )
    )
