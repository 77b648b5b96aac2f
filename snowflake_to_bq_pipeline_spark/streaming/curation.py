"""Streaming corpus curation: quality gate + content dedup, continuously.

The batch registry curates in scheduled passes (text.quality_score,
neardup.exact_dedup); an ingestion pipeline wants the same gates applied
AS DOCUMENTS ARRIVE. Because every quality metric here is a narrow
per-row column expression, the exact batch operators compose onto a
streaming DataFrame unchanged — the only genuinely stateful step is
content dedup, which uses ``dropDuplicatesWithinWatermark`` on the text
fingerprint so state stays bounded by the watermark horizon (same
layered posture as streaming/dedup.py: in-horizon dups die here,
horizon-straddling replays are caught by the scheduled ``dedup_exact``
sweep).

Scale: no shuffle except the dedup state exchange on the 32-char
fingerprint (constant-width key, never document text); quality gating is
stateless per-row compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import TOKEN_RE

CURATION_WATERMARK = "10 minutes"
MIN_TOKENS = 5
MAX_TOKENS = 100_000


def curate_docs(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str | None = CURATION_WATERMARK,
) -> DataFrame:
    """Quality-gate + fingerprint-dedup a document stream (or batch).

    Works identically on a streaming and a batch DataFrame: pass
    ``watermark=None`` for the batch twin (plain dropDuplicates) — the
    pytest asserts drain-equality between the two.

    Output adds: n_tokens, fingerprint, quality gates applied as filters
    (length window, nonempty alpha content).
    """
    t = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.lower(t), "[ \\t\\n\\r]+", " "))
    n_tokens = F.array_size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0))
    gated = (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("fingerprint", F.md5(norm.cast("binary")))
        .filter(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("n_tokens") <= MAX_TOKENS)
            & (F.length(norm) > 0)
        )
    )
    if watermark is None:
        return gated.dropDuplicates(["fingerprint"])
    return gated.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )
