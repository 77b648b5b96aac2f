"""Shared column expressions used across plans.

These reproduce the reference's BigQuery SQL idioms (SAFE_DIVIDE, budget
status CASE buckets, schedule status, monthly pivots — see
work_item_individual_budget_time_tracking_view_v5.sql:224-382) as reusable
Spark Column builders. All are pure column expressions — they stay inside
whole-stage codegen, no Python execution at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


#: Exact decimal type used for additive money aggregates. Summing doubles is
#: add-order-dependent (different engines / different partitionings produce
#: last-ulp differences that can flip a rounding boundary); summing decimals
#: is exact and therefore bit-stable across engines and across cluster sizes.
#: Rule of thumb used throughout: exact decimal for ADDITIVE aggregates,
#: plain double for everything multiplicative/divisive derived afterwards
#: (identical double inputs → identical IEEE results).
DEC = "decimal(18,6)"


def dec(col: Column) -> Column:
    """Cast to the exact-arithmetic decimal type for additive aggregates."""
    return col.cast(DEC)


def money(col: Column, scale: int = 2) -> Column:
    """Finalize a decimal money aggregate: fixed scale, double output."""
    return F.round(col, scale).cast("double")


#: Micro-units per currency unit for long-backed exact money sums.
MICROS = 1_000_000


def money_micros(col: Column) -> Column:
    """Per-row exact micro-units (long) of a money expression.

    ``cast(DEC)`` fixes the value at 6 decimal places exactly as the
    DuckDB oracles' ``CAST(x AS DECIMAL(18,6))`` does; the decimal·int
    product is an exact integer, so the long carries the identical value.
    Summing longs is ~40% faster than summing decimals in the hash
    aggregate (measured on the flagship at sf0.1: 2.3s → 1.5s for the
    5-sum aggregate) because the aggregation buffer is a primitive.

    FINE-GRAIN GROUPS ONLY: a group's sum must stay below ~9.2e12
    currency units (long max in micros). "Fine-grain" means the group
    COUNT scales with corpus size so per-group row counts stay bounded:
    per-order and per-(order, contributor) groups are bounded by one
    order's line count, per-client groups by one client's order count,
    per-contributor groups by one contributor's entry count — all safe at
    any corpus scale because entities multiply while per-entity volume
    does not (see plans/budget.py, plans/dashboard.py). COARSE grains —
    a FIXED number of groups regardless of corpus size (nation / region /
    global / pure date buckets) — must NOT single-level long-sum: use the
    salted two-phase pattern (long partials per (key, pmod(id, 4096))
    bucket, then decimal(38,0)-sum the ≤groups*4096 partials — see
    plans/enrichment.py utilization_rollup), or plain DECIMAL sums.
    """
    return (col.cast(DEC) * F.lit(MICROS)).cast("long")


def money_from_micros_sum(sum_col: Column, scale: int = 2) -> Column:
    """Finalize a long-micros money sum; bit-identical to
    ``money(sum(decimal))``: the micros→units division happens in exact
    decimal (one division per GROUP, not per row), then the same
    round-to-scale + double cast as :func:`money`. Accepts long sums
    (fine-grain callers) or decimal(38,0) sums (the salted two-phase
    coarse pattern); the wide intermediate keeps both exact."""
    exact = sum_col.cast("decimal(38,0)") / F.lit(MICROS)
    return money(exact, scale)


def safe_divide(num: Column, den: Column) -> Column:
    """BigQuery SAFE_DIVIDE: NULL instead of error/inf on zero denominator."""
    return F.when(den != 0, num / den)


def budget_status(budgeted: Column, actual: Column, approach_frac: float = 0.8) -> Column:
    """OVER / APPROACHING / WITHIN / NO_BUDGET_SET buckets (v5 view L366-374)."""
    return (
        F.when((budgeted > 0) & (actual > budgeted), F.lit("OVER_BUDGET"))
        .when((budgeted > 0) & (actual > budgeted * approach_frac), F.lit("APPROACHING_BUDGET"))
        .when(budgeted > 0, F.lit("WITHIN_BUDGET"))
        .otherwise(F.lit("NO_BUDGET_SET"))
    )


def utilization_pct(budgeted: Column, actual: Column) -> Column:
    """Percent of budget consumed; NULL when no budget (v5 view L228-232)."""
    return F.when(budgeted > 0, money(actual / budgeted * 100))


def schedule_status(due: Column, completed_flag: Column, now: Column, due_soon_days: int = 3) -> Column:
    """OVERDUE / DUE_SOON / ON_TRACK (v5 view L376-382).

    ``now`` is passed in (not CURRENT_TIMESTAMP) so results are deterministic
    and oracle-comparable.
    """
    return (
        F.when(due.isNotNull() & (due < now) & ~completed_flag, F.lit("OVERDUE"))
        .when(
            due.isNotNull()
            & (due <= F.timestamp_add("DAY", F.lit(due_soon_days), now))
            & ~completed_flag,
            F.lit("DUE_SOON"),
        )
        .otherwise(F.lit("ON_TRACK"))
    )


def is_overdue(due: Column, completed_flag: Column, now: Column) -> Column:
    """IS_WORK_ITEM_OVERDUE (v5 view L179): due date passed, not completed.

    Non-null boolean: a NULL due date means not overdue (FALSE, not NULL),
    matching the view's COALESCE posture.
    """
    return due.isNotNull() & (due < now) & ~completed_flag


def month_bucket_sum(value: Column, date_col: Column, year: int, month: int) -> Column:
    """SUM(CASE WHEN year/month matches THEN value ELSE 0) (v5 view L23-34)."""
    cond = (F.year(date_col) == year) & (F.month(date_col) == month)
    return F.sum(F.when(cond, value).otherwise(F.lit(0.0)))


def net_price(extended: Column, discount: Column) -> Column:
    """Actual charged amount for a line entry (extendedprice net of discount).

    The per-row product happens in double (deterministic for identical
    inputs), then casts to decimal(18,6) so downstream SUMs are exact and
    add-order-independent. Keeping the decimal narrow (long-backed, not a
    wide 38-digit accumulator) is ~25% faster than multiplying in decimal.
    """
    return (extended * (F.lit(1.0) - discount)).cast(DEC)
