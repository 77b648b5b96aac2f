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
