"""Product quantization for embedding compression + ANN (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

At 100 TB an embedding column dominates storage and scan cost: 64 float32
dims = 256 bytes/row. PQ splits each (L2-normalized) vector into
``M_SUBSPACES`` contiguous subvectors and replaces each with the id of its
nearest per-subspace centroid — ``M`` small ints (here 8 codes over
16-entry codebooks = 8 bytes, a 32× compression) — while search runs
directly on the codes via asymmetric distance computation (ADC): a query
builds an M×K inner-product lookup table against the codebooks, and each
database vector's score is the sum of M table lookups, never a
decompression.

Distributed shape mirrors the IVF operator (similarity.py): codebooks are
MODEL state trained on a deterministic keyspace sample (standard PQ
practice — FAISS trains on a bounded sample) and ship to executors inside
closures; encoding is one Arrow-batched map pass (no shuffle); the ADC
scan broadcasts the per-query LUTs and stays JVM-side as a
zip_with/aggregate over the code array. The only shuffle in the whole
search is the final per-query top-k window over scored candidates.

Determinism: sample selection, Lloyd iterations (numpy float64, fixed
iteration count, min-index tie-break) and encode argmin are all pure
functions of the data — no RNG anywhere.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _check_injected_codes(
    codes: DataFrame, m: int, k_codes: int, what: str
) -> None:
    """Debug-mode guard on the caller-injected standing-index contract
    (r15): ``codes``/``coded`` must be the encoding UNDER the supplied
    model — same M (code-array width) and same K (codebook size).  A
    mismatched pair silently scores garbage (zip_with pads with nulls /
    element_at reads the wrong LUT slice), so when
    ``$SPARK_GRAFT_DEBUG_CONTRACTS`` is set, one bounded aggregate
    verifies the cheap structural half of the contract and raises
    ``ValueError`` on breach.  Off by default: the production callers
    (the registry memos) build codes and model as one unit."""
    if not os.environ.get("SPARK_GRAFT_DEBUG_CONTRACTS"):
        return
    row = codes.agg(
        F.min(F.size("codes")).alias("m_min"),
        F.max(F.size("codes")).alias("m_max"),
        F.max(F.array_max("codes")).alias("c_max"),
        F.min(F.array_min("codes")).alias("c_min"),
    ).head()
    if row is None or row["m_min"] is None:
        return
    if row["m_min"] != m or row["m_max"] != m:
        raise ValueError(
            f"{what}: injected codes width {row['m_min']}..{row['m_max']}"
            f" != model M={m} — codes are not the encoding under this model"
        )
    if row["c_min"] < 0 or row["c_max"] >= k_codes:
        raise ValueError(
            f"{what}: injected code values span [{row['c_min']},"
            f" {row['c_max']}] outside the model's codebook range"
            f" [0, {k_codes})"
        )

#: Number of subspaces (codes per vector).
M_SUBSPACES = 8
#: Codebook size per subspace (16 → 4-bit codes).
K_CODES = 16
#: Deterministic training sample: vectors with vec_id below this bound.
TRAIN_SAMPLE_IDS = 4096
#: Lloyd iterations per subspace codebook.
TRAIN_ITERS = 8


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    n[n == 0.0] = 1.0
    return mat / n


def _lloyd(sub: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic Lloyd's k-means on one subspace sample.

    Init = first k rows (the sample is keyspace-ordered, so this is the
    same deterministic seed the IVF trainer uses); empty clusters keep
    their previous centroid (stable, deterministic).
    """
    cents = sub[:k].copy()
    for _ in range(iters):
        d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(cents)):
            members = sub[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def train_codebooks(
    embeddings: DataFrame,
    m: int = M_SUBSPACES,
    k: int = K_CODES,
    sample_ids: int = TRAIN_SAMPLE_IDS,
    iters: int = TRAIN_ITERS,
) -> np.ndarray:
    """Train the (m, k, d/m) codebook tensor on a bounded keyspace sample.

    The collect is O(sample × dims) — model-training state, independent
    of corpus size (the deliberate driver-side transfer, same category as
    IVF centroids)."""
    rows = (
        embeddings.filter(F.col("vec_id") < sample_ids)
        .select(F.col("embedding").cast("array<double>").alias("e"))
        .collect()
    )
    sample = _normalize(np.array([r.e for r in rows], dtype=np.float64))
    dims = sample.shape[1]
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    sub_d = dims // m
    return np.stack(
        [
            _lloyd(sample[:, i * sub_d : (i + 1) * sub_d], k, iters)
            for i in range(m)
        ]
    )


def pq_encode(embeddings: DataFrame, codebooks: np.ndarray) -> DataFrame:
    """(vec_id, codes array<int>) — each vector compressed to M codes.

    One Arrow-batched map pass, no shuffle: per batch, each subspace's
    distances to its k centroids come from one matmul; argmin with numpy's
    first-minimum tie-break (deterministic)."""
    m, k, sub_d = codebooks.shape

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            e = _normalize(np.array(pdf["e"].tolist(), dtype=np.float64))
            codes = np.empty((len(e), m), dtype=np.int32)
            for i in range(m):
                sub = e[:, i * sub_d : (i + 1) * sub_d]
                cb = codebooks[i]
                d = (
                    (sub * sub).sum(axis=1, keepdims=True)
                    - 2.0 * (sub @ cb.T)
                    + (cb * cb).sum(axis=1)[None, :]
                )
                codes[:, i] = d.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes)}
            )

    v = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    return v.mapInPandas(encode, "vec_id long, codes array<int>")


def pq_topk(
    embeddings: DataFrame,
    query_pred: Column,
    k: int = 5,
    m: int = M_SUBSPACES,
    k_codes: int = K_CODES,
    codebooks: np.ndarray | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, adc_score, rank).

    Scores approximate the cosine of L2-normalized vectors: the per-query
    LUT holds subspace inner products against every codebook entry, and a
    database vector's score is the sum of its M looked-up entries — the
    inner product with its PQ reconstruction. The LUT table is
    (n_queries × M·K) and broadcast; the scan over codes is row-local
    zip_with/aggregate (JVM, no Python); only the top-k window shuffles,
    keyed by query. Exactness is NOT claimed — recall against the
    brute-force baseline is asserted in tests (the ANN contract).

    ``codebooks`` (the trained model tensor) and ``codes`` (that model's
    (vec_id, codes) encoding of the corpus — e.g. the registry's
    per-snapshot memo) skip the train collect and the corpus-scale
    encode pass: a deployed PQ index encodes the corpus once per model,
    not once per search — the same standing-index discipline as
    ``ivf_topk``'s ``assigned``. ``codes`` must be the encoding UNDER
    ``codebooks`` (callers memoize them as one unit)."""
    if codebooks is None:
        codebooks = train_codebooks(embeddings, m, k_codes)
    sub_d = codebooks.shape[2]
    if codes is None:
        codes = pq_encode(embeddings, codebooks)
    else:
        _check_injected_codes(
            codes, int(codebooks.shape[0]), int(codebooks.shape[1]), "pq_topk"
        )

    q = (
        embeddings.filter(query_pred)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qe"),
        )
        .collect()
    )
    qids = [r.query_id for r in q]
    qmat = _normalize(np.array([r.qe for r in q], dtype=np.float64))
    # LUT per query: flat M*K doubles, lut[i*K + j] = <q_i, codebook[i][j]>.
    luts = []
    for qv in qmat:
        lut = np.empty(len(codebooks) * codebooks.shape[1])
        for i in range(codebooks.shape[0]):
            lut[i * codebooks.shape[1] : (i + 1) * codebooks.shape[1]] = (
                codebooks[i] @ qv[i * sub_d : (i + 1) * sub_d]
            )
        luts.append(lut.tolist())
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame(
        list(zip(qids, luts)), "query_id long, lut array<double>"
    )

    scored = (
        codes.crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("codes"),
                        F.sequence(
                            F.lit(0), F.lit(int(codebooks.shape[0]) - 1)
                        ),
                        lambda c, i: F.element_at(
                            F.col("lut"),
                            (i * F.lit(int(codebooks.shape[1])) + c + 1).cast(
                                "int"
                            ),
                        ),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("adc_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def pq_compression_stats(
    embeddings: DataFrame,
    m: int = M_SUBSPACES,
    k_codes: int = K_CODES,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """Corpus-level PQ fidelity report: one row with vector count, raw vs
    coded bytes, and mean reconstruction cosine (how much ranking signal
    the compression keeps). The mean accumulates in exact decimal from
    per-row rounded cosines, so the number is partitioning-independent.
    ``codebooks`` reuses an already-trained model (the registry memo) —
    the report scores fidelity OF that model, so sharing it with the
    search path is the semantically correct pairing, not just cheaper."""
    if codebooks is None:
        codebooks = train_codebooks(embeddings, m, k_codes)
    sub_d = codebooks.shape[2]

    def recon(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            e = _normalize(np.array(pdf["e"].tolist(), dtype=np.float64))
            acc = np.zeros(len(e))
            for i in range(codebooks.shape[0]):
                sub = e[:, i * sub_d : (i + 1) * sub_d]
                cb = codebooks[i]
                d = (
                    (sub * sub).sum(axis=1, keepdims=True)
                    - 2.0 * (sub @ cb.T)
                    + (cb * cb).sum(axis=1)[None, :]
                )
                acc += (sub * cb[d.argmin(axis=1)]).sum(axis=1)
            # e is unit-norm; cos(e, recon) = <e, recon>/|recon|.
            rn = np.zeros(len(e))
            for i in range(codebooks.shape[0]):
                sub = e[:, i * sub_d : (i + 1) * sub_d]
                cb = codebooks[i]
                d = (
                    (sub * sub).sum(axis=1, keepdims=True)
                    - 2.0 * (sub @ cb.T)
                    + (cb * cb).sum(axis=1)[None, :]
                )
                rn += (cb[d.argmin(axis=1)] ** 2).sum(axis=1)
            cos = acc / np.sqrt(np.maximum(rn, 1e-300))
            yield pd.DataFrame({"cos": np.round(cos, 9)})

    v = embeddings.select(
        F.col("embedding").cast("array<double>").alias("e")
    )
    dims = len(codebooks.reshape(-1)) // (m * k_codes) * m  # m * sub_d
    per_row = v.mapInPandas(recon, "cos double")
    return per_row.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.lit(dims * 4).cast("long").alias("raw_bytes_per_vec"),
        F.lit(m).cast("long").alias("coded_bytes_per_vec"),
        F.round(
            (
                F.sum(F.col("cos").cast("decimal(28,12)"))
                / F.count(F.lit(1))
            ).cast("double"),
            6,
        ).alias("mean_recon_cosine"),
    )


def train_ivfpq_model(
    embeddings: DataFrame,
    n_centroids: int = 16,
    m: int = M_SUBSPACES,
    k_codes: int = K_CODES,
) -> tuple[np.ndarray, np.ndarray]:
    """Train the composed IVF-PQ model — (coarse centroids, residual
    codebooks) — on the bounded keyspace sample. One collect
    (O(sample × dims), corpus-size independent) + driver-side numpy
    Lloyd's; factored out of :func:`ivfpq_topk` so the registry can
    memoize the model per snapshot (a deployed index trains once)."""
    v = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    sample_rows = (
        v.filter(F.col("vec_id") < TRAIN_SAMPLE_IDS).select("e").collect()
    )
    smat = _normalize(np.array([r.e for r in sample_rows], dtype=np.float64))
    dims = smat.shape[1]
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    sub_d = dims // m
    cmat = _lloyd(smat, n_centroids, TRAIN_ITERS)
    sd = (
        (smat * smat).sum(axis=1, keepdims=True)
        - 2.0 * (smat @ cmat.T)
        + (cmat * cmat).sum(axis=1)[None, :]
    )
    res_sample = smat - cmat[sd.argmin(axis=1)]
    books = np.stack(
        [
            _lloyd(
                res_sample[:, i * sub_d : (i + 1) * sub_d], k_codes, TRAIN_ITERS
            )
            for i in range(m)
        ]
    )
    return cmat, books


def ivfpq_encode(
    embeddings: DataFrame, cmat: np.ndarray, books: np.ndarray
) -> DataFrame:
    """(vec_id, cent_id, codes): route each vector to its coarse list and
    PQ-encode its residual — the standing IVF-PQ index build. One
    Arrow-batched map pass, no shuffle; factored out of
    :func:`ivfpq_topk` so the registry can persist the coded corpus per
    (snapshot, model) like the plain-IVF ``assigned`` memo."""
    m = books.shape[0]
    sub_d = books.shape[2]

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            e = _normalize(np.array(pdf["e"].tolist(), dtype=np.float64))
            d0 = (
                (e * e).sum(axis=1, keepdims=True)
                - 2.0 * (e @ cmat.T)
                + (cmat * cmat).sum(axis=1)[None, :]
            )
            cent = d0.argmin(axis=1)
            r = e - cmat[cent]
            codes = np.empty((len(e), m), dtype=np.int32)
            for i in range(m):
                sub = r[:, i * sub_d : (i + 1) * sub_d]
                cb = books[i]
                d = (
                    (sub * sub).sum(axis=1, keepdims=True)
                    - 2.0 * (sub @ cb.T)
                    + (cb * cb).sum(axis=1)[None, :]
                )
                codes[:, i] = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cent_id": cent.astype(np.int64),
                    "codes": list(codes),
                }
            )

    v = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    return v.mapInPandas(
        encode, "vec_id long, cent_id long, codes array<int>"
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_pred: Column,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 6,
    m: int = M_SUBSPACES,
    k_codes: int = K_CODES,
    model: tuple[np.ndarray, np.ndarray] | None = None,
    coded: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: coarse inverted lists + PQ-coded residuals — the layout
    billion-scale ANN systems actually deploy (FAISS IndexIVFPQ).

    The ENTIRE model — coarse centroids and residual codebooks — trains
    driver-side on the bounded keyspace sample (FAISS trains IVFPQ's
    coarse quantizer on a sample too): the coarse quantizer routes each
    vector to a list, and PQ codebooks train on RESIDUALS (vector − its
    centroid), which are far better-centered than raw vectors, so the
    same code budget keeps more ranking signal. Index build is then ONE
    Arrow map pass that assigns and residual-encodes together — no
    distributed k-means iterations, no shuffle. A query probes its
    ``n_probe`` nearest lists and scores only those lists' codes:
    score = <q, centroid> + Σ_m LUT_m[code_m] with
    LUT_m[j] = <q_m, residual_codebook_m[j]> — the <q, centroid> bias is
    one scalar per (query, probed list). Per-query work is
    ~n_probe/n_centroids of the corpus, each row an M-lookup sum over
    8 bytes of state; the only shuffle is the final top-k window.

    ``model`` ((cmat, books) from :func:`train_ivfpq_model`) and
    ``coded`` (that model's :func:`ivfpq_encode` output, e.g. the
    registry's persisted per-snapshot index) skip the train collect and
    the corpus-scale encode pass — the same standing-index discipline
    as ``ivf_topk``'s ``assigned``. ``coded`` must be the encoding
    UNDER ``model``.
    """
    v = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    # Model training: one bounded sample collect (O(sample × dims),
    # corpus-size independent); everything on L2-normalized vectors so
    # cosine ranking == inner-product ranking.
    if model is None:
        model = train_ivfpq_model(embeddings, n_centroids, m, k_codes)
    cmat, books = model
    # Geometry comes from the model tensor itself so a caller-supplied
    # model can never silently disagree with the m/k_codes arguments.
    m, k_codes, sub_d = books.shape
    if coded is None:
        coded = ivfpq_encode(embeddings, cmat, books)
    else:
        _check_injected_codes(coded, int(m), int(k_codes), "ivfpq_topk")

    # Per-(query, probed list) LUT + bias rows — O(n_queries × n_probe).
    q = (
        v.filter(query_pred)
        .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
        .collect()
    )
    qmat = _normalize(np.array([r.qe for r in q], dtype=np.float64))
    probe_rows = []
    for row, qv in zip(q, qmat):
        sims = cmat @ qv
        order = np.argsort(-sims, kind="stable")[:n_probe]
        lut = np.empty(m * k_codes)
        for i in range(m):
            lut[i * k_codes : (i + 1) * k_codes] = (
                books[i] @ qv[i * sub_d : (i + 1) * sub_d]
            )
        for ci in order:
            probe_rows.append(
                (
                    int(row.query_id),
                    int(ci),
                    float(sims[ci]),
                    lut.tolist(),
                )
            )
    spark = embeddings.sparkSession
    probes = spark.createDataFrame(
        probe_rows, "query_id long, cent_id long, bias double, lut array<double>"
    )

    scored = (
        coded.join(F.broadcast(probes), "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.col("bias")
                + F.aggregate(
                    F.zip_with(
                        F.col("codes"),
                        F.sequence(F.lit(0), F.lit(m - 1)),
                        lambda c, i: F.element_at(
                            F.col("lut"),
                            (i * F.lit(k_codes) + c + 1).cast("int"),
                        ),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("adc_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)
