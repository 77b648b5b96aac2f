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

from pyspark.sql import DataFrame
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
