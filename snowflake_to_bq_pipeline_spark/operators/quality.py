"""Data-quality and pipeline-monitoring operators.

Reference parity:
- ``profile_columns``: data_quality_agent.py — per-column null/distinct
  profiling of synced tables.
- ``row_count_by_day``: pipeline_monitoring.sql — per-day per-type volume
  counts driving the monitoring dashboard.
- ``row_count_compare``: validate_snowflake_data.py — source-vs-target
  count reconciliation (the reference runs two COUNT queries and compares
  in Python; here it is one full-outer-joined plan).
- ``freshness_check``: pipeline_fallback_monitor.py — staleness per
  stream vs the global watermark.

Scale: ``profile_columns`` is one pass over the table (multi-distinct via
Spark's expand — exact, as the oracle demands; swap ``exact=False`` for
HyperLogLog approx_count_distinct at 100 TB). Counts/freshness are plain
partial aggregations; the day-level compare joins two tiny aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], exact: bool = True
) -> DataFrame:
    """One row per column: row/non-null/null/distinct counts.

    Single scan: one aggregate computing every metric, then an unpivot
    (``stack``) to rows. ``exact=False`` switches to approx_count_distinct
    (HLL) — the right call at 100 TB where exact multi-distinct explodes.

    Multi-distinct audit (SURVEY §4 "avoid Expand"): with exact=True and
    N profiled columns this is a deliberate N-way Expand — the only
    Expand-free exact alternative (unpivot-first, then one distinct per
    column_name group) shuffles the same N× value rows, so there is no
    plan that beats Expand here; the scale lever is exact=False, which
    replaces all N distinct groups with HLL sketches in one plain
    aggregate. Unlike reporting_lag_analysis (2 distincts over a
    reusable pair grain, rewritten as joined single-distinct partials),
    a global per-column profile has no smaller grain to pre-aggregate.
    """
    distinct_fn = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(distinct_fn(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)

    stack_args = ", ".join(f"'{c}', __nn_{c}, __nd_{c}" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column_name, non_null_count, distinct_count)",
        "row_count",
    ).select(
        "column_name",
        "row_count",
        "non_null_count",
        (F.col("row_count") - F.col("non_null_count")).alias("null_count"),
        "distinct_count",
    )


def row_count_by_day(
    df: DataFrame, ts_col: str, type_col: str | None = None
) -> DataFrame:
    """Per-day (and optionally per-type) row counts."""
    keys = [F.to_date(F.col(ts_col)).alias("day")]
    if type_col:
        keys.append(F.col(type_col))
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("row_count"))


def row_count_compare(
    source: DataFrame,
    target: DataFrame,
    source_ts: str,
    target_ts: str,
) -> DataFrame:
    """Full-outer day-level count reconciliation between two tables."""
    s = source.groupBy(F.to_date(F.col(source_ts)).alias("day")).agg(
        F.count(F.lit(1)).alias("source_count")
    )
    t = target.groupBy(F.to_date(F.col(target_ts)).alias("day")).agg(
        F.count(F.lit(1)).alias("target_count")
    )
    joined = s.join(t, "day", "full_outer")
    sc = F.coalesce(F.col("source_count"), F.lit(0).cast("long"))
    tc = F.coalesce(F.col("target_count"), F.lit(0).cast("long"))
    return joined.select(
        "day",
        sc.alias("source_count"),
        tc.alias("target_count"),
        (sc - tc).alias("count_diff"),
        (sc == tc).alias("counts_match"),
    )


def freshness_check(
    df: DataFrame, ts_col: str, type_col: str, stale_after_seconds: int = 86400
) -> DataFrame:
    """Per-type watermark lag vs the global max timestamp.

    Lag is computed in exact integer microseconds (no float time math) so
    the staleness flag is engine-independent.
    """
    per_type = df.groupBy(type_col).agg(
        F.max(ts_col).alias("last_event_ts"),
        F.count(F.lit(1)).alias("row_count"),
    )
    global_max = df.agg(F.max(ts_col).alias("__global_max_ts"))
    lag_s = (
        F.unix_micros(F.col("__global_max_ts")) - F.unix_micros(F.col("last_event_ts"))
    ) / F.lit(1000000)
    lag_seconds = F.floor(lag_s).cast("long")
    return (
        per_type.crossJoin(F.broadcast(global_max))
        .select(
            type_col,
            "last_event_ts",
            "row_count",
            lag_seconds.alias("lag_seconds"),
            (lag_seconds > stale_after_seconds).alias("is_stale"),
        )
    )


def sketch_distinct_counts(
    df: DataFrame, key_col: str, group_col: str, rsd: float = 0.05
) -> DataFrame:
    """HyperLogLog distinct counts per group, with the exact count
    alongside for error measurement in tests.

    At 100 TB the exact multi-distinct is the single most expensive metric
    in the quality suite; HLL makes it one pass with bounded memory. The
    engine exposes both so callers choose per table size.
    """
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(key_col, rsd).alias("approx_distinct"),
        F.countDistinct(key_col).alias("exact_distinct"),
    )


def sketch_quantiles(
    df: DataFrame, value_col: str, group_col: str, accuracy: int = 1000
) -> DataFrame:
    """Approximate p50/p95/p99 per group (Greenwald-Khanna sketch).

    Exact percentiles need a full sort per group; the sketch is one pass
    and mergeable across partitions.
    """
    probs = F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))
    q = F.percentile_approx(F.col(value_col), probs, F.lit(accuracy))
    return df.groupBy(group_col).agg(
        q[0].alias("p50_approx"),
        q[1].alias("p95_approx"),
        q[2].alias("p99_approx"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def dup_key_audit(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys violating uniqueness, with their multiplicities.

    Reference parity: verify_view_deduplication.sql — after every dedup
    fix, the reference re-checks that no business key appears twice. Run
    this over any view that promises key uniqueness (expect 0 rows).
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def column_drift_profile(
    source: DataFrame, target: DataFrame, num_cols: Sequence[str]
) -> DataFrame:
    """Per-column source-vs-target VALUE drift: min/max/sum/null-count.

    The reference's validation compares values, not just counts
    (validate_snowflake_data.py side-by-side queries,
    DATA_COMPARISON_SETUP.md) — a row-count match can hide silently
    corrupted or truncated columns. One aggregate pass per side computes
    every column's metrics (no per-column jobs), each 1-row result
    unpivots via ``stack``, and the two tiny long-format frames full-outer
    join on column name. Two scans total regardless of column count;
    everything after the aggregates is O(columns).

    Sums follow the money discipline (exact decimal sum → round 2 →
    double) so the drift verdict is engine- and partitioning-independent;
    min/max/nulls are exact. ``drift`` flags any metric difference.
    """
    from ..functions import DEC, money

    def side(df: DataFrame, tag: str) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias(f"{tag}_rows")]
        for c in num_cols:
            aggs += [
                F.sum(F.col(c).isNull().cast("long")).alias(f"__nu_{c}"),
                F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__mx_{c}"),
                money(F.sum(F.col(c).cast(DEC))).alias(f"__sm_{c}"),
            ]
        one = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{c}', __nu_{c}, __mn_{c}, __mx_{c}, __sm_{c}" for c in num_cols
        )
        return one.selectExpr(
            f"stack({len(num_cols)}, {stack_args}) AS "
            f"(column_name, {tag}_nulls, {tag}_min, {tag}_max, {tag}_sum)",
            f"{tag}_rows",
        )

    s = side(source, "src")
    t = side(target, "tgt")
    joined = s.join(t, "column_name", "full_outer")
    drift = (
        (F.col("src_rows") != F.col("tgt_rows"))
        | (F.col("src_nulls") != F.col("tgt_nulls"))
        | ~F.col("src_min").eqNullSafe(F.col("tgt_min"))
        | ~F.col("src_max").eqNullSafe(F.col("tgt_max"))
        | ~F.col("src_sum").eqNullSafe(F.col("tgt_sum"))
    )
    return joined.select(
        "column_name",
        "src_rows", "tgt_rows", "src_nulls", "tgt_nulls",
        "src_min", "tgt_min", "src_max", "tgt_max", "src_sum", "tgt_sum",
        F.round(F.col("src_sum") - F.col("tgt_sum"), 2).alias("sum_delta"),
        drift.alias("drift"),
    )


#: Fixed bin edges for PSI over money-scaled columns. Fixed (not
#: quantile-derived) edges keep the metric engine-reproducible and
#: incremental-friendly: bin counts are additive across partitions/days.
PSI_EDGES: tuple[float, ...] = (
    0.0, 25_000.0, 50_000.0, 75_000.0, 100_000.0,
    150_000.0, 200_000.0, 300_000.0,
)

#: Laplace-style floor keeping PSI finite when a bin empties on one side.
PSI_EPS = 1e-6


def distribution_drift_psi(
    source: DataFrame, target: DataFrame, col: str
) -> DataFrame:
    """Per-bin population stability index between source and target.

    Row counts and min/max miss SHAPE changes (a warehouse bug that
    re-scales a money column can preserve both); PSI over fixed bins is
    the standard monitor: psi_term = (p_src - p_tgt) * ln(p_src / p_tgt)
    per bin, summed across bins (>0.2 conventionally flags drift). One
    conditional-count aggregate per side (no shuffle beyond the 1-row
    aggregates), joined on bin id — O(bins) rows after the scans.

    Fractions use the epsilon floor on BOTH engines so empty bins stay
    finite and identical; ln is IEEE-identical for identical doubles.
    """
    edges = list(PSI_EDGES)

    def side(df: DataFrame, tag: str) -> DataFrame:
        c = F.col(col).cast("double")
        aggs = []
        for i in range(len(edges)):
            lo = edges[i]
            hi = edges[i + 1] if i + 1 < len(edges) else None
            cond = (c >= lo) if hi is None else ((c >= lo) & (c < hi))
            aggs.append(F.count(F.when(cond, F.lit(1))).alias(f"__b{i}"))
        one = df.agg(F.count(F.lit(1)).alias(f"{tag}_total"), *aggs)
        stack_args = ", ".join(f"{i}, __b{i}" for i in range(len(edges)))
        return one.selectExpr(
            f"stack({len(edges)}, {stack_args}) AS (bin_id, {tag}_count)",
            f"{tag}_total",
        )

    s = side(source, "src")
    t = side(target, "tgt")
    joined = s.join(t, "bin_id")
    p_src = F.greatest(
        F.col("src_count").cast("double") / F.col("src_total"),
        F.lit(PSI_EPS),
    )
    p_tgt = F.greatest(
        F.col("tgt_count").cast("double") / F.col("tgt_total"),
        F.lit(PSI_EPS),
    )
    lo_edge = F.element_at(
        F.array(*[F.lit(e) for e in edges]), F.col("bin_id").cast("int") + 1
    )
    return joined.select(
        "bin_id",
        lo_edge.alias("bin_lo"),
        "src_count",
        "tgt_count",
        F.round((p_src - p_tgt) * F.log(p_src / p_tgt), 8).alias("psi_term"),
    )


def group_percentiles_exact(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Exact linear-interpolated percentiles per group.

    The exact twin of :func:`sketch_quantiles` (GK sketch): same output
    shape, but computed with Spark's exact ``percentile`` aggregate,
    which buffers each group's values — right for grouped/aggregated
    data and for validating the sketch, wrong for a 100 TB raw column
    (use the sketch there; the docstring of each points at the other).

    Interpolation is the standard ``(1-g)*lo + g*hi`` both here and in
    DuckDB's ``quantile_cont``; outputs are rounded to 6dp so last-ulp
    formula differences cannot surface.
    """
    pct_arr = F.array(*[F.lit(float(p)) for p in percentiles])
    pcts = df.groupBy(group_col).agg(
        F.count(value_col).alias("n"),
        F.percentile(F.col(value_col), pct_arr).alias("__p"),
    )
    cols = [
        F.round(F.col("__p")[i], 6).alias(
            "p" + ("%g" % (p * 100)).replace(".", "_")
        )
        for i, p in enumerate(percentiles)
    ]
    return pcts.select(group_col, "n", *cols)


def robust_value_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Outlier-robust per-group stats: trimmed and winsorized means.

    The anomaly monitors' z-scores assume clean history; one bad load
    poisons mean and stddev. The robust pair answers "what is typical"
    under contamination: the trimmed mean drops values outside
    [p_lo, p_hi], the winsorized mean clamps them to the bounds.

    Two passes: exact per-group percentile bounds, broadcast back, one
    conditional aggregation. Sums run in exact decimal so the result is
    add-order-independent; only the interpolated bounds are float (ulp
    parity caveat as group_percentiles_exact).
    """
    pcts = F.percentile(
        F.col(value_col), F.array(F.lit(float(lo)), F.lit(float(hi)))
    )
    bounds = df.groupBy(group_col).agg(
        pcts[0].alias("__lo"), pcts[1].alias("__hi")
    )
    j = df.join(F.broadcast(bounds), group_col)
    v = F.col(value_col)
    vdec = v.cast("decimal(18,6)")
    in_band = (v >= F.col("__lo")) & (v <= F.col("__hi"))
    clamped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi")).cast(
        "decimal(18,6)"
    )
    return j.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(vdec).cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_all"
        ),
        F.round(F.min("__lo"), 6).alias("p_lo"),
        F.round(F.min("__hi"), 6).alias("p_hi"),
        F.count(F.when(in_band, F.lit(1))).alias("n_kept"),
        F.round(
            F.sum(F.when(in_band, vdec)).cast("double")
            / F.count(F.when(in_band, F.lit(1))),
            6,
        ).alias("trimmed_mean"),
        F.round(F.sum(clamped).cast("double") / F.count(F.lit(1)), 6).alias(
            "winsorized_mean"
        ),
    )


def mad_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD robust outlier profile per group.

    The breakdown-resistant twin of the z-score monitors: median and
    median-absolute-deviation survive 50% contamination where mean/std
    survive none. A value is an outlier when
    ``|x - median| > k * 1.4826 * MAD`` (1.4826 = normal-consistency
    constant). Three passes, each a grouped aggregate with the tiny
    per-group stats broadcast back — no windows over raw data; same
    interpolation-ulp caveat as the other exact-percentile ops.
    """
    g = F.col(group_col)
    med = df.groupBy(group_col).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("__med")
    )
    dev_df = df.join(F.broadcast(med), group_col).withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("__med"))
    )
    stats = dev_df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__med").alias("__median"),
        F.percentile(F.col("__dev"), F.lit(0.5)).alias("__mad"),
    )
    flagged = dev_df.join(
        F.broadcast(stats.select(group_col, "__mad")), group_col
    )
    is_out = F.col("__dev") > F.lit(float(k)) * F.lit(1.4826) * F.col("__mad")
    outs = flagged.groupBy(group_col).agg(
        F.sum(F.when(is_out, 1).otherwise(0)).cast("bigint").alias(
            "n_outliers"
        )
    )
    return (
        stats.join(outs, group_col)
        .select(
            group_col,
            "n",
            F.round(F.col("__median"), 6).alias("median"),
            F.round(F.col("__mad"), 6).alias("mad"),
            "n_outliers",
            F.round(
                F.col("n_outliers").cast("double") / F.col("n").cast("double"),
                6,
            ).alias("outlier_frac"),
        )
    )


#: A key is "flappy" when it transitions this many times more than a
#: clean progression through its distinct statuses would need.
FLAP_FACTOR = 2


def status_flap_audit(
    events: DataFrame,
    key_col: str = "user_id",
    status_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Flip-flop detection per key: how often the status CHANGES vs how
    many distinct statuses exist. A clean lifecycle visits each status
    once (transitions ≈ distinct−1); a sync war — two pipelines writing
    conflicting states, the failure mode the reference repeatedly
    debugged in its sync-issue postmortems — shows transitions far above
    that (A→B→A→B...).

    Scale: one window over the (key, time) partition — single hash
    shuffle, ordered within partition; the distinct count rides the same
    aggregation. Total order includes a tiebreak column so the
    transition count is engine-deterministic under timestamp ties.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = F.when(
        F.lag(status_col).over(w).isNotNull()
        & (F.col(status_col) != F.lag(status_col).over(w)),
        1,
    ).otherwise(0)
    per = (
        events.select(key_col, status_col, ts_col, tiebreak_col)
        .withColumn("__chg", changed)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("__chg").alias("n_transitions"),
            F.countDistinct(status_col).alias("n_distinct_statuses"),
        )
    )
    clean = F.greatest(F.col("n_distinct_statuses") - 1, F.lit(1))
    return per.select(
        key_col,
        "n_events",
        "n_transitions",
        "n_distinct_statuses",
        F.round(
            F.col("n_transitions").cast("double")
            / F.greatest(F.col("n_events") - 1, F.lit(1)).cast("double"),
            6,
        ).alias("churn_ratio"),
        (F.col("n_transitions") > clean * FLAP_FACTOR).alias("is_flappy"),
    )


def interarrival_profile(
    events: DataFrame, type_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """Per-stream inter-arrival cadence: gap statistics between
    consecutive events of each type — the arrival-rate baseline behind a
    freshness alert (reference: pipeline_fallback_monitor.py hardcodes
    "stale after N hours"; this derives what "late" means per stream
    from its own observed cadence, e.g. alert at p95 × headroom).

    Gaps are computed on integer microseconds (exact longs end to end);
    only the final per-type statistics divide into seconds, with the
    same operation order the oracle uses, then round to 6dp. The gap
    MULTISET is tie-stable: equal timestamps yield zero-gaps wherever
    the window's tie order places them, so the aggregates are
    deterministic even though lag() pairing under ties is not.

    Scale: one window function partitioned by stream type (the shuffle
    key a cadence monitor wants anyway) + one aggregate; percentile()
    buffers per-group GAP values — bounded by per-stream event counts;
    for a raw 100 TB firehose swap in the GK sketch twin
    (sketch_quantiles) per its docstring.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(type_col).orderBy("__us")
    us = F.unix_micros(F.col(ts_col))
    gaps = (
        events.select(type_col, us.alias("__us"))
        .withColumn("__gap_us", F.col("__us") - F.lag("__us").over(w))
        .where(F.col("__gap_us").isNotNull())
    )
    gap = F.col("__gap_us")
    sec = F.lit(1_000_000.0)
    agg = gaps.groupBy(type_col).agg(
        F.count(gap).alias("n_gaps"),
        F.sum(gap).alias("__sum_us"),
        F.min(gap).alias("__min_us"),
        F.max(gap).alias("__max_us"),
        F.percentile(gap, F.array(F.lit(0.5), F.lit(0.95))).alias("__p"),
    )
    return agg.select(
        type_col,
        "n_gaps",
        F.round(
            F.col("__sum_us").cast("double") / F.col("n_gaps") / sec, 6
        ).alias("mean_gap_s"),
        F.round(F.col("__min_us").cast("double") / sec, 6).alias("min_gap_s"),
        F.round(F.col("__max_us").cast("double") / sec, 6).alias("max_gap_s"),
        F.round(F.col("__p")[0] / sec, 6).alias("p50_gap_s"),
        F.round(F.col("__p")[1] / sec, 6).alias("p95_gap_s"),
    )


CMS_DEPTH = 4
CMS_WIDTH = 1024
#: Upper bound on depth*width: keeps the driver-side sketch and its
#: constant-folded probe literals within the repo's O(model) posture.
CMS_MAX_CELLS = 1 << 20


def cms_heavy_hitters(
    tok_counts: DataFrame,
    threshold_share: float = 0.002,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-Min-Sketch heavy hitters: tokens whose estimated corpus
    frequency clears ``threshold_share`` of total token mass — the
    bounded-memory path to ``vocab_top_k`` (which sorts the FULL
    (token, freq) aggregate: exact, but vocabulary-sized state and a
    global ordering). Completes the sketch family next to HLL distinct
    counts and GK quantiles: CMS answers point-frequency / heavy-hitter
    questions with depth × width counters total, independent of
    vocabulary size.

    Two passes, both bounded:
    1. sketch build — explode each (doc, token) partial count into
       ``depth`` (row, bucket) cells and groupBy-sum: at most
       depth × width groups, collected to the driver as O(model) state
       (4096 longs at the defaults; same posture as the Bloom bitmap
       and k-means centroids).
    2. probe — the sketch rides back as ``from_json`` array literals
       (constant-folded; the Bloom lesson at operators/bloom.py:139),
       each row's estimate is a JVM-side least-of-element_at, and only
       survivors reach the token-grain aggregate, so the final shuffle
       carries heavy-hitter candidates, not the vocabulary.

    CMS never underestimates (every true heavy hitter survives —
    recall 1.0 by construction); overestimates can admit false
    positives, so the output carries est vs exact (exact is free on
    survivors: their partial counts all pass the filter together) and
    an ``is_true_heavy`` verdict. Deterministic: seeded xxhash64 rows.
    """
    import json as _json

    if depth <= 0 or width <= 0:
        raise ValueError(f"depth/width must be positive, got {depth}/{width}")
    # O(model) posture guard (advice r11): the sketch lives driver-side
    # AND rides back into the probe plan as depth JSON literals of width
    # longs each — a 1<<22 width would constant-fold multi-hundred-MB
    # plan strings. 1M cells ≈ 8 MB of counters / ~20 MB of JSON: far
    # above any useful CMS (error ~ e/width needs width ~ 2.7k for 0.1%)
    # and still bounded like the Bloom bitmap / centroid models.
    if depth * width > CMS_MAX_CELLS:
        raise ValueError(
            f"depth*width = {depth * width} exceeds CMS_MAX_CELLS = "
            f"{CMS_MAX_CELLS}; a CMS this wide stops being O(model) "
            "driver state (use vocab_top_k's exact aggregate instead)"
        )

    def bucket(d: int):
        return F.pmod(F.xxhash64(F.lit(d), F.col("token")), F.lit(width))

    cells = tok_counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), bucket(d).alias("b"))
                    for d in range(depth)
                ]
            )
        ).alias("db"),
        "term_count",
    )
    rows = (
        cells.groupBy("db.d", "db.b")
        .agg(F.sum("term_count").alias("c"))
        .collect()
    )
    tables = [[0] * width for _ in range(depth)]
    for r in rows:
        tables[r["d"]][r["b"]] = r["c"]
    # Every term_count lands in exactly one bucket per sketch row, so
    # row 0's bucket sum IS the total token mass — no second corpus
    # aggregate needed.
    total = sum(tables[0])
    threshold = max(1, int(total * threshold_share))

    ests = [
        F.element_at(
            F.from_json(F.lit(_json.dumps(tables[d])), "array<bigint>"),
            (bucket(d) + 1).cast("int"),
        )
        for d in range(depth)
    ]
    est = ests[0] if depth == 1 else F.least(*ests)
    return (
        tok_counts.withColumn("__est", est)
        .where(F.col("__est") >= F.lit(threshold))
        .groupBy("token")
        .agg(
            F.max("__est").alias("est_count"),
            F.sum("term_count").alias("exact_count"),
        )
        .select(
            "token",
            "est_count",
            "exact_count",
            (F.col("est_count") - F.col("exact_count")).alias("overestimate"),
            (F.col("exact_count") >= F.lit(threshold)).alias("is_true_heavy"),
            F.lit(threshold).alias("threshold_count"),
        )
    )
