"""Schema drift detection and evolution for full/merge syncs.

The reference's full syncs derive the target schema at run time and reuse
the existing table's schema when present
(client_dimension_pipeline/client_dimension_sync_full/main.py:94-104:
``get_table`` → reuse schema, NotFound → create from the predefined
definition), so a re-run after the source adds a column silently keeps
loading — but new columns never reach the target and type changes fail the
load job. This module makes both cases explicit:

- :func:`diff_schemas` reports drift (added / dropped / type-changed
  columns, with widenability classified);
- :func:`evolve_schema` produces the evolved target schema: new columns
  append as nullable, widenable type changes widen (the parquet/lake
  equivalent of BigQuery's ALTER TABLE ADD COLUMN), incompatible changes
  raise by default;
- :func:`align_to_schema` conforms an incoming frame to the evolved
  schema (missing columns → typed nulls, order normalized) so downstream
  unions/merges are position-safe.

Scale: pure metadata operations — schema structs live on the driver and
are O(columns); the only executor work is the cast/null projection in
``align_to_schema``, which fuses into the scan's whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructField, StructType

#: Lossless widening lattice (source type → strictly-wider types). Mirrors
#: Spark's own implicit-cast widening for numerics; anything outside it is
#: an incompatible drift (resolution is explicit, never silent).
_WIDENS: dict[str, tuple[str, ...]] = {
    # Keys/values are Spark simpleString() names (int→"int", long→"bigint").
    "tinyint": ("smallint", "int", "bigint"),
    "smallint": ("int", "bigint"),
    "int": ("bigint",),
    "float": ("double",),
    "date": ("timestamp", "timestamp_ntz"),
}


class SchemaDriftError(ValueError):
    """Incompatible schema drift (narrowing / type flip) detected."""


@dataclass
class DriftReport:
    """What changed between the target's schema and the incoming one."""

    added: list[str] = field(default_factory=list)
    dropped: list[str] = field(default_factory=list)
    widened: list[tuple[str, str, str]] = field(default_factory=list)
    incompatible: list[tuple[str, str, str]] = field(default_factory=list)

    @property
    def has_drift(self) -> bool:
        return bool(
            self.added or self.dropped or self.widened or self.incompatible
        )


def _simple(dt: DataType) -> str:
    return dt.simpleString()


def _is_widening(frm: DataType, to: DataType) -> bool:
    return _simple(to) in _WIDENS.get(_simple(frm), ())


def diff_schemas(target: StructType, incoming: StructType) -> DriftReport:
    """Classify drift of ``incoming`` relative to ``target``.

    - added: new source columns (→ evolve appends them as nullable);
    - dropped: columns the source no longer sends (→ kept in the target,
      future loads fill NULL — the soft-delete posture, so history keeps
      its data);
    - widened: type changes on the lossless lattice (int→long, float→
      double, date→timestamp) — safe to evolve in place;
    - incompatible: any other type change (string→int, double→int, ...):
      these can corrupt silently, so evolution refuses them by default.
    """
    t_by_name = {f.name: f for f in target.fields}
    i_by_name = {f.name: f for f in incoming.fields}
    rep = DriftReport()
    rep.added = [n for n in i_by_name if n not in t_by_name]
    rep.dropped = [n for n in t_by_name if n not in i_by_name]
    for name, inc in i_by_name.items():
        tgt = t_by_name.get(name)
        if tgt is None or tgt.dataType == inc.dataType:
            continue
        entry = (name, _simple(tgt.dataType), _simple(inc.dataType))
        if _is_widening(tgt.dataType, inc.dataType):
            rep.widened.append(entry)
        else:
            rep.incompatible.append(entry)
    return rep


def evolve_schema(
    target: StructType,
    incoming: StructType,
    on_incompatible: str = "error",
) -> tuple[StructType, DriftReport]:
    """Return the evolved target schema and the drift report.

    Evolution keeps target column ORDER (appended columns go last, like
    BigQuery's ADD COLUMN), keeps dropped columns (nullable), widens
    widenable types, and on incompatible drift either raises
    (``on_incompatible='error'``, default) or keeps the target's type
    (``'keep_target'`` — incoming values are cast, invalid ones become
    NULL, and the report still lists the conflict for alerting).
    """
    if on_incompatible not in ("error", "keep_target"):
        raise ValueError(f"on_incompatible={on_incompatible!r}")
    rep = diff_schemas(target, incoming)
    if rep.incompatible and on_incompatible == "error":
        raise SchemaDriftError(
            f"incompatible schema drift: {rep.incompatible}; pass "
            "on_incompatible='keep_target' to force-cast (invalid → NULL)"
        )
    widened = {name: to for name, _frm, to in rep.widened}
    i_by_name = {f.name: f for f in incoming.fields}
    fields = []
    for f in target.fields:
        if f.name in widened:
            fields.append(
                StructField(
                    f.name, i_by_name[f.name].dataType, nullable=True
                )
            )
        elif f.name in rep.dropped:
            # Source stopped sending it: keep history, make it nullable.
            fields.append(StructField(f.name, f.dataType, nullable=True))
        else:
            fields.append(f)
    for name in rep.added:
        fields.append(
            StructField(name, i_by_name[name].dataType, nullable=True)
        )
    return StructType(fields), rep


def align_to_schema(df: DataFrame, schema: StructType) -> DataFrame:
    """Conform ``df`` to ``schema``: cast present columns, fill missing
    ones with typed NULLs, normalize column order. One projection — fuses
    into the scan, no shuffle."""
    present = set(df.columns)
    cols = [
        (
            F.col(f.name).cast(f.dataType)
            if f.name in present
            else F.lit(None).cast(f.dataType)
        ).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)


def full_sync_evolve(
    incoming: DataFrame,
    target_schema: StructType | None,
    on_incompatible: str = "error",
) -> tuple[DataFrame, DriftReport]:
    """Full-sync entry with schema evolution (ref main.py:94-104, made
    drift-aware): no target yet → incoming defines the schema; otherwise
    evolve the target schema and align the incoming frame to it. Returns
    the aligned frame plus the report (callers alert on
    ``report.has_drift``)."""
    if target_schema is None:
        return incoming, DriftReport()
    evolved, rep = evolve_schema(
        target_schema, incoming.schema, on_incompatible=on_incompatible
    )
    return align_to_schema(incoming, evolved), rep
