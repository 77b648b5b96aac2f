"""Change-data-capture folding: compact a changelog onto a base snapshot.

The reference approximates CDC with scheduled full/daily reloads plus the
deduplication sync's delete reconciliation (snowflake_bq_deduplication_
sync.py). A lake-native engine folds an ordered changelog directly:

    new_snapshot = fold(base, changelog)

where the changelog carries (key, op, payload, ordinal) with op ∈
{UPSERT, DELETE}. Folding = keep each key's latest change (window rank),
apply deletes as anti-join, apply upserts as merge. One shuffle on the key
for the changelog compaction, one for the merge — independent of history
length, which is what makes it viable at 100 TB (the reference's
reload-everything approach is not).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import latest_record
from .sync import merge_upsert

OP_COL = "__op"


def fold_changelog(
    base: DataFrame,
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    op_col: str = OP_COL,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Apply an ordered changelog of UPSERT/DELETE rows to ``base``.

    ``changelog`` must have ``base``'s columns plus ``op_col`` and
    ``order_col`` (+ optional tiebreaks). Later changes win per key; a
    final DELETE removes the key, a final UPSERT replaces/inserts it.
    """
    last = latest_record(changelog, key_cols, order_col, tiebreak_cols)
    deletes = last.filter(F.col(op_col) == "DELETE").select(*key_cols)
    upserts = last.filter(F.col(op_col) == "UPSERT").select(*base.columns)
    survived = base.join(deletes, list(key_cols), "left_anti")
    return merge_upsert(survived, upserts, key_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Diff two snapshots into an I/U/D changelog (cdc's inverse).

    The reference derives its delete/insert sets by materializing key
    lists in Python (snowflake_bq_deduplication_sync.py orphaned/missing
    items); the engine form is ONE full-outer join on the key: new-only
    keys emit INSERT, old-only DELETE, both-sides-with-changes UPDATE,
    and unchanged rows are filtered out (the usual 99% — the output is
    change-sized, not table-sized). Emits old_*/new_* value pairs for
    audit. One shuffle per side; the change classification is a
    projection.
    """
    o = old.select(
        *key_cols,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, list(key_cols), "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("INSERT"))
        .when(F.col("__in_new").isNull(), F.lit("DELETE"))
        .when(changed, F.lit("UPDATE"))
    )
    return (
        j.withColumn("change_op", op)
        .filter(F.col("change_op").isNotNull())
        .drop("__in_old", "__in_new")
    )
