"""Training-data curation: PII redaction and the quality-filter funnel.

Extends the engine beyond the reference (whose rows are structured
business records) with the two curation steps every LLM-data pipeline
runs before training: scrubbing identifiers out of text and measuring how
many documents each quality gate removes.

Scale posture: both are single-pass columnar plans. Redaction is chained
JVM ``regexp_replace`` (no Python in the hot path); the funnel folds all
gates into ONE aggregate row of nested conditional counts (count of docs
surviving gates 1..k) and explodes that row into per-stage output — one
scan, no joins, a 1-row shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement). Applied in order; kept RE2/Java-regex
#: compatible (no lookaround) so the DuckDB oracle matches literally.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("id_number", r"\b[0-9]{9,16}\b", "<ID>"),
]


def pii_redact(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact identifier-shaped substrings; count matches per category.

    Counts are taken against the ORIGINAL text (before any replacement)
    so categories don't shadow each other; replacements run in the fixed
    ``PII_PATTERNS`` order so overlapping matches resolve identically on
    every engine.
    """
    t = F.col(text_col)
    counts = [
        F.array_size(F.regexp_extract_all(t, F.lit(pat), 0))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    redacted = t
    for _, pat, repl in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, repl)
    out = documents.select("doc_id", redacted.alias("redacted_text"), *counts)
    total = sum(
        (F.col(f"n_{name}") for name, _, _ in PII_PATTERNS),
        F.lit(0).cast("long"),
    )
    return out.withColumn("total_redactions", total)


def quality_funnel(
    documents: DataFrame, gates: list[tuple[str, Column]]
) -> DataFrame:
    """Per-stage survivor counts for a chain of quality gates.

    Stage k reports docs entering (survivors of gates 1..k-1), kept
    (survivors of 1..k), dropped, and the drop rate. All figures derive
    from exact integer counts in a single aggregate row, unpivoted with
    ``stack`` — deterministic and one-pass regardless of gate count.
    """
    conds: list[Column] = []
    acc: Column | None = None
    for _, gate in gates:
        acc = gate if acc is None else (acc & gate)
        conds.append(acc)
    agg = documents.agg(
        F.count(F.lit(1)).alias("__total"),
        *[
            F.count(F.when(c, F.lit(1))).alias(f"__surv_{i}")
            for i, c in enumerate(conds)
        ],
    )
    stack_args: list[Column] = []
    for i, (name, _) in enumerate(gates):
        docs_in = F.col("__total") if i == 0 else F.col(f"__surv_{i - 1}")
        stack_args += [
            F.lit(i + 1).cast("long"),
            F.lit(name),
            docs_in,
            F.col(f"__surv_{i}"),
        ]
    staged = agg.select(
        F.stack(
            F.lit(len(gates)),
            *stack_args,
        ).alias("stage", "gate_name", "docs_in", "docs_kept")
    )
    return staged.select(
        "stage",
        "gate_name",
        "docs_in",
        "docs_kept",
        (F.col("docs_in") - F.col("docs_kept")).alias("docs_dropped"),
        F.when(
            F.col("docs_in") > 0,
            F.round(
                (F.col("docs_in") - F.col("docs_kept")).cast("double")
                / F.col("docs_in").cast("double"),
                4,
            ),
        ).otherwise(F.lit(0.0)).alias("drop_rate"),
    )


#: Hex-bucket resolution for hash sampling: 3 hex chars = 4096 buckets.
SAMPLE_BUCKETS = 4096


def sample_threshold_hex(rate: float) -> str | None:
    """Lowercase 3-hex-digit cutoff for ``rate``; None means keep-all.

    A row survives when the first 3 md5 hex chars of its key compare
    lexicographically below the cutoff — identical to numeric comparison
    on lowercase hex, and computable verbatim in any engine with md5.
    """
    if rate >= 1.0:
        return None
    return format(max(int(rate * SAMPLE_BUCKETS), 0), "03x")


def sample_bucket(key: Column) -> Column:
    """Deterministic 3-hex-char sampling bucket of a key column."""
    return F.substring(F.md5(key.cast("string").cast("binary")), 1, 3)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling (training-mix reweighting).

    Seedless and reproducible on any engine: the keep decision is a pure
    function of (key, stratum rate) via md5 — re-running on different
    cluster sizes/partitionings selects the SAME rows, which is what makes
    a sampled training mix auditable. Per-row filter, no shuffle.
    """
    bucket = sample_bucket(F.col(key_col))
    keep: Column = F.lit(None).cast("boolean")
    expr = None
    for stratum, rate in rates.items():
        thr = sample_threshold_hex(rate)
        cond = F.lit(True) if thr is None else bucket < F.lit(thr)
        branch = (F.col(stratum_col) == stratum, cond)
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    default_thr = sample_threshold_hex(default_rate)
    default_cond = (
        F.lit(True) if default_thr is None else bucket < F.lit(default_thr)
    )
    keep = default_cond if expr is None else expr.otherwise(default_cond)
    return df.filter(keep)


PACK_BUDGET = 256


def sequence_packing(
    documents: DataFrame,
    token_count: Column,
    budget: int = PACK_BUDGET,
    stream_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk pack assignment per document stream.

    GPT-style packing concatenates a stream's documents in a canonical
    order and slices fixed token windows; a document's pack is where its
    first token lands. One window cumsum per stream (exact integer math →
    engine-identical), one shuffle on the stream key.

    At 100 TB the stream is the parallelism unit (each stream's running
    sum is independent); for a single giant stream, pre-aggregate per-file
    token totals and seed per-partition offsets instead of one partition.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nt = token_count.cast("long")
    start = F.sum(nt).over(w) - nt
    return documents.select(
        order_col,
        stream_col,
        nt.alias("n_tokens"),
        F.floor(start / F.lit(budget)).cast("long").alias("pack_id"),
        F.pmod(start, F.lit(budget)).cast("long").alias("offset_in_pack"),
    )
