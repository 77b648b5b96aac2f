"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The Spark-side machinery (schema, partition sizing, UDF signatures, batch
shapes) is real and tested; the codec itself is a deterministic fake
behind ``decode_image`` because media libraries are intentionally not a
dependency of the engine — production swaps `_fake_decode` for
Pillow/ffmpeg without touching any plan.

Scale: mapInPandas streams Arrow batches, so a 100 TB media table flows
through without materializing rows in Python one at a time. Media blobs
stay opaque bytes end-to-end — Spark never interprets them — and
``repartition_for_media`` sizes partitions by expected decode cost rather
than row count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("mime_type", StringType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("feat_mean", LongType()),
        StructField("feat_max", LongType()),
    ]
)


def _fake_decode(content: bytes) -> list[int]:
    """Deterministic stand-in for a real codec.

    Production: replace with Pillow/torchaudio/ffmpeg. Raising
    NotImplementedError here would be the other documented option; a
    deterministic fake keeps the downstream plumbing testable.
    """
    return list(content[:64])


def extract_features(
    media: DataFrame, batch_hint: int = 1024, decode=None
) -> DataFrame:
    """Decode + featurize media blobs via Arrow-batched mapInPandas.

    ``decode`` is the codec seam: a ``bytes -> list[int]`` callable
    (default `_fake_decode`); production injects Pillow/torchaudio/ffmpeg
    here without touching the plan. It must be picklable (module-level
    function) — it ships to executors inside the mapInPandas closure.

    Only the three columns the featurizer reads cross the Python
    boundary (guide §4: Spark cannot see inside an opaque map, so an
    explicit select is what keeps mime_type/width/height/duration_ms
    out of the Arrow stream AND out of the parquet scan).
    """
    decode = decode or _fake_decode
    media = media.select("media_id", "media_type", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = [
                decode(bytes(c)) if c is not None else []
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(bytes(c)) if c is not None else 0
                        for c in pdf["content"]
                    ],
                    "checksum": [
                        hashlib.md5(bytes(c)).hexdigest() if c is not None else None
                        for c in pdf["content"]
                    ],
                    "feat_mean": [
                        int(sum(f) / len(f)) if f else 0 for f in feats
                    ],
                    "feat_max": [max(f) if f else 0 for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def repartition_for_media(
    media: DataFrame, target_bytes_per_partition: int = 256 * 1024 * 1024
) -> DataFrame:
    """Repartition by decode cost (blob bytes), not row count.

    A media table's rows vary by orders of magnitude in size, and hash
    partitioning is blind to that skew: one 4 GB video co-hashed with an
    average shard of images puts target+4 GB in a single decode task.
    This packs rows into byte-budget BINS via the same two-phase
    global-order machinery as sync.global_row_number:

    1. range-partition on ``media_id`` (deterministic total order),
    2. per-partition byte totals → prefix offsets (O(partitions) driver
       state),
    3. each row's global byte START offset = partition offset +
       within-partition cumulative sum; its bin = start // target,
    4. range-repartition on bin (~1 bin per task).

    Bound: a bin's rows all START inside one ``target``-sized byte
    window, so a task holds < target + its largest single blob — the
    optimum for row-atomic data. An oversized blob overshoots into the
    following bins' ADDRESS SPACE, which therefore stay empty: the giant
    shares its task only with the < target bytes that started before it.
    Costs one extra (tiny) per-partition count job versus the old
    hash-by-id layout; decode cost dwarfs it at any scale.
    """
    from pyspark.sql import Window

    from ..operators._cache import swap_cache

    spark = media.sparkSession
    n = max(1, spark.sparkContext.defaultParallelism)
    nbytes = F.coalesce(F.length("content").cast("long"), F.lit(0).cast("long"))
    # Persisted: the offsets job and the bin job must see identical range
    # boundaries (re-sampling would desynchronize prefix offsets).
    ranged = swap_cache(
        "media.byte_bins",
        media.repartitionByRange(n, "media_id")
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__bytes", nbytes),
    )
    per = {
        r["__pid"]: r["s"]
        for r in ranged.groupBy("__pid").agg(F.sum("__bytes").alias("s")).collect()
    }
    # Every pid in [0, n) gets an offset row — empty partitions contribute
    # 0 — and the join below is LEFT with coalesce(__off, 0): if the
    # persisted `ranged` is ever recomputed (cache eviction on a cluster,
    # or a prior handle unpersisted by a later swap_cache call) and
    # repartitionByRange re-samples boundaries, a row landing in a pid the
    # offsets job never saw degrades bin packing instead of being silently
    # dropped by an inner join on a missing pid.
    offsets, acc = [], 0
    for pid in range(max([n] + [p + 1 for p in per])):
        offsets.append((pid, acc))
        acc += per.get(pid) or 0
    n_bins = max(1, int(acc / target_bytes_per_partition) + 1)
    off_df = spark.createDataFrame(offsets, "__pid int, __off long")
    w = (
        Window.partitionBy("__pid")
        .orderBy("media_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = F.sum("__bytes").over(w) - F.col("__bytes") + F.coalesce(
        F.col("__off"), F.lit(0).cast("long")
    )
    binned = (
        ranged.join(F.broadcast(off_df), "__pid", "left")
        .withColumn(
            # exact integer floor-div (decimal, not double: byte offsets
            # past 2^53 would misbin under double division); the bin id
            # itself is long — with a small target (tests use 64 KB) or a
            # 100 TB corpus, byte_total/target overflows int and a wrapped
            # negative bin would scramble the range partitioning
            "__bin",
            F.floor(
                start.cast("decimal(38,0)")
                / F.lit(target_bytes_per_partition)
            ).cast("long"),
        )
    )
    return binned.repartitionByRange(n_bins, "__bin").drop(
        "__pid", "__bytes", "__off", "__bin"
    )


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests/demos."""
    rows = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("content"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        F.lit(1000).cast("int").alias("duration_ms"),
    )
    return rows


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("mime_type", StringType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def _fake_resize(content: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for a real resampler: tiles the source
    bytes to exactly w*h bytes (production: Pillow ``Image.resize``)."""
    if not content:
        return b"\x00" * (w * h)
    reps = (w * h) // len(content) + 1
    return (content * reps)[: w * h]


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize image rows to a fixed shape via Arrow-batched mapInPandas.

    Non-image rows pass through untouched (same schema), so the operator
    composes with mixed-modality tables without a pre-split. The output
    content is a real byte payload of exactly width*height — downstream
    operators can rely on the shape even with the fake codec.
    """

    def run(batches):
        for pdf in batches:
            is_img = pdf["media_type"] == "image"
            pdf = pdf.copy()
            pdf["content"] = [
                _fake_resize(bytes(c), width, height)
                if img and c is not None
                else c
                for c, img in zip(pdf["content"], is_img)
            ]
            pdf.loc[is_img, "width"] = width
            pdf.loc[is_img, "height"] = height
            yield pdf

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 250, frame_bytes: int = 16) -> DataFrame:
    """Sample frames from video rows at a fixed period (one-to-many).

    Emits one row per sampled frame with its index and timestamp; the
    frame payload is a deterministic slice of the blob (production:
    ffmpeg seek+decode). The one-to-many emission happens INSIDE the
    Arrow batch loop — no explode of pre-materialized frame arrays, so
    peak memory is one batch of frames, not one row's full frame set.
    Only the four columns the sampler reads cross the Arrow boundary
    (explicit select — guide §4).
    """
    media = media.select("media_id", "media_type", "content", "duration_ms")

    def run(batches):
        for pdf in batches:
            out_id, out_idx, out_ts, out_b = [], [], [], []
            for mid, mtype, content, dur in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"], pdf["duration_ms"]
            ):
                if mtype != "video" or content is None or dur is None:
                    continue
                blob = bytes(content)
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    start = (i * frame_bytes) % max(len(blob), 1)
                    chunk = (blob * 2)[start : start + frame_bytes]
                    out_id.append(mid)
                    out_idx.append(i)
                    out_ts.append(ts)
                    out_b.append(chunk)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_ts_ms": pd.Series(out_ts, dtype="int32"),
                    "frame_bytes": pd.Series(out_b, dtype=object),
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


#: Pseudo-embedding dimensionality for the stub encoder.
EMBED_DIMS = 64

EMBED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def _fake_embed(content: bytes, dims: int) -> list[float]:
    """Deterministic stand-in for a real encoder (CLIP / wav2vec / ...).

    A folded byte histogram, l2-normalized: blobs differing in a few
    bytes land at cosine ~= 1, unrelated blobs decorrelate — the property
    an embedding-based near-dup pass actually relies on. Production swaps
    this one function for a real model; every downstream plan is
    unchanged.
    """
    hist = [0.0] * dims
    for b in content:
        hist[b % dims] += 1.0
    norm = sum(x * x for x in hist) ** 0.5
    if norm == 0:
        # empty blob: a fixed UNIT vector, never the zero vector — zero
        # norms turn every cosine against the blob into 0/0=NaN, which a
        # descending rank orders above every real neighbor (same guard
        # as operators/text._default_chunk_encoder).
        hist[0] = 1.0
        return hist
    return [x / norm for x in hist]


def embed_media(media: DataFrame, dims: int = EMBED_DIMS) -> DataFrame:
    """Media blobs -> embedding vectors via Arrow-batched mapInPandas.

    The multimodal half of the similarity stack: output plugs straight
    into operators.similarity (ANN top-k, LSH candidate pairs, IVF) with
    ``embedding`` as the vector column. Python touches each blob once per
    batch; no per-row UDF. Only the columns the encoder reads cross the
    Arrow boundary (explicit select — guide §4).
    """
    media = media.select("media_id", "media_type", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "embedding": [
                        _fake_embed(bytes(c), dims) if c is not None else None
                        for c in pdf["content"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=EMBED_SCHEMA)


def media_neardup_pairs(
    media: DataFrame,
    threshold: float = 0.98,
    n_tables: int = 8,
    n_planes: int = 8,
) -> DataFrame:
    """Near-duplicate MEDIA pairs via embedding cosine over LSH buckets.

    Image/audio dedup for a multimodal training corpus: embed (stub
    encoder), generate candidates from LSH (table, bucket) cells only —
    never all pairs — then verify candidates with exact cosine >=
    threshold. Same scale posture as the document embedding dedup path
    (operators/similarity.py:209).
    """
    from ..operators import similarity

    v = embed_media(media).select(
        F.col("media_id").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    cand = similarity.dup_candidate_pairs(v, n_tables, n_planes)
    a = v.select(F.col("vec_id").alias("id_a"), F.col("e").alias("ea"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("e").alias("eb"))
    cos = F.zip_with(
        F.col("ea"), F.col("eb"), lambda x, y: x * y
    )
    dot = F.aggregate(
        cos, F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(dot, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def media_vectors(media: DataFrame, dims: int = EMBED_DIMS) -> DataFrame:
    """Media embeddings shaped as the similarity stack's standard
    (vec_id, embedding) vector table — the contract every ANN operator
    (cosine_topk, ivf_topk, streaming/ann.py maintenance) already
    speaks, so media search rides the SAME standing-index machinery as
    text-embedding search instead of a bespoke media-only path."""
    return embed_media(media, dims).select(
        F.col("media_id").alias("vec_id"), "embedding"
    )


def media_ann_topk(
    media: DataFrame,
    query_pred,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    centroids: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN over media embeddings via the standing-index family
    (operators/similarity.ivf_topk over a train_centroids model and an
    _assign inverted-list table) — media and text-embedding search share
    ONE maintenance path, including the streaming micro-batch index
    maintenance twin (streaming/ann.maintain_ivf_index accepts the same
    (vec_id, embedding) stream; drain-equality pytest-pinned in
    tests/test_multimodal_sinks.py). Replaces a bespoke per-modality
    index: a deployed pipeline trains/assigns once per model and both
    modalities append through the same sink. Pass ``centroids`` /
    ``assigned`` to reuse a persisted standing model+index (the
    registry-memo posture); recall vs brute-force cosine is
    pytest-pinned."""
    from ..operators import similarity

    return similarity.ivf_topk(
        media_vectors(media),
        query_pred,
        k=k,
        n_centroids=n_centroids,
        n_probe=n_probe,
        centroids=centroids,
        assigned=assigned,
    )


def media_dedup_provenance(
    media: DataFrame,
    threshold: float = 0.98,
    n_tables: int = 8,
    n_planes: int = 8,
) -> DataFrame:
    """Per-media dedup PROVENANCE verdict — the multimodal twin of the
    document audit table (operators/curation.dedup_provenance, reused
    verbatim): one row per media item with a keep/drop decision and one
    mutually-exclusive reason, precedence ``exact_dup`` (byte-identical
    blobs via md5 checksum, keep min media_id) > ``semantic_dup``
    (embedding-cosine near-dup groups over the LSH-cell verified pairs,
    transitive closure, keep min id) > ``kept``. The lexical family has
    no media analog, so the combiner's cluster slot receives the empty
    verdict.

    Scale posture: the exact verdict is one constant-width groupBy on
    the blob checksum (never the blob); the semantic verdict rides the
    LSH-cell candidate pairs (never all pairs) resolved by the shared
    pointer-jumping CC. Conservation and precedence are pinned in
    tests/test_multimodal_sinks.py.
    """
    from ..operators import curation
    from ..operators.graph import dup_clusters

    feats = extract_features(media).select("media_id", "checksum")
    grp = feats.groupBy("checksum").agg(
        F.min("media_id").alias("__canon")
    )
    exact = feats.join(grp, "checksum").select(
        F.col("media_id").alias("doc_id"),
        (F.col("media_id") != F.col("__canon")).alias("is_duplicate"),
    )
    sem_pairs = media_neardup_pairs(
        media, threshold, n_tables, n_planes
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    semantic = dup_clusters(sem_pairs).select(
        "doc_id", "is_canonical"
    )
    spark = media.sparkSession
    empty_clusters = spark.createDataFrame(
        [], "doc_id long, is_canonical boolean"
    )
    per = curation.dedup_provenance(
        media.select(F.col("media_id").alias("doc_id"), "media_type"),
        exact,
        empty_clusters,
        semantic,
    )
    return per.select(
        F.col("doc_id").alias("media_id"),
        "media_type",
        "reason",
        "keep",
    )
