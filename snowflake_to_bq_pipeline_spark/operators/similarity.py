"""Embedding similarity search (SURVEY.md §2-E).

- ``cosine_topk``: brute-force top-k per query vector — the exactness
  baseline. Query side is broadcast; each partition scans its vectors once
  and the per-query top-k is taken with one window over (query, score).
- ``lsh_topk``: random-hyperplane LSH — the 100 TB path. Vectors hash to
  sign-pattern buckets; only same-bucket pairs are scored. Hyperplane
  weights come from a driver-side splitmix64 integer scramble of
  (table, plane, dim), so the operator is deterministic without a stored
  model and without any per-row hash work.
- ``dup_pairs``: all pairs above a cosine threshold (a deterministic
  keyspace sample keeps the oracle cross-join tractable; production runs
  use the LSH candidate path instead).

Float discipline: cosine is computed in double with a left-to-right fold
(zip_with → aggregate), which is bit-identical to the oracle's
list_transform → list_aggregate('sum') evaluation; results round to 6dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LSH_PLANES = 12


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _cosine(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def _vectors(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )


def _cent_rows(cents) -> list[tuple[int, list[float]]]:
    """Driver-side (cent_id, ce) rows of a centroid model, sorted by id.

    The k-means model is O(n_centroids) driver state; callers that hold
    it as rows already (the registry's _ModelMemo) pass the list and pay
    ZERO Spark jobs here — a ``cents.collect()`` of even a 16-row local
    relation costs a full job dispatch (~0.3-0.4s measured at r15),
    which every ANN probe was paying per plan build."""
    if isinstance(cents, DataFrame):
        return sorted(
            ((int(r["cent_id"]), list(r["ce"])) for r in cents.collect()),
            key=lambda r: r[0],
        )
    return sorted(
        ((int(c), list(v)) for c, v in cents), key=lambda r: r[0]
    )


def _cent_df(spark, cents) -> DataFrame:
    """Centroid model as a DataFrame (for the operators that join or
    broadcast it); a row-list model materializes as one local relation."""
    if isinstance(cents, DataFrame):
        return cents
    return spark.createDataFrame(
        [(int(c), list(v)) for c, v in cents],
        "cent_id long, ce array<double>",
    )


def _ivf_score_candidates(cand: DataFrame) -> DataFrame:
    """Arrow-batched rowwise cosine over IVF candidate pairs
    (query_id, qe, vec_id, e) -> (query_id, neighbor_id, cosine).

    The probe step's candidate scoring was the ann_ivf family's last
    interpreted hot loop: ``_cosine`` is zip_with + aggregate —
    CodegenFallback, per-element interpreted adds — over
    n_queries × n_probe/n_centroids × corpus rows. Same lesson as the
    r14 NB scorer (operators/curation._score_docs_arrow, measured ~5×):
    move the per-element loop into one numpy batch per Arrow chunk.
    Values round to 6 decimals, but via numpy's pairwise summation and
    scaled half-even rint — which can differ from the JVM left-fold +
    HALF_UP ``_cosine`` by one ulp at a 6-decimal boundary. Callers
    whose contract is the exact brute-force value (``lsh_topk``'s
    pinned score-match) RESCORE their <=k survivors through ``_cosine``;
    the IVF family is rows-only and recall-gated. A zero-norm vector
    (an empty-content stub embedding) scores cosine 0.0 against
    everything — never NaN, which Spark's descending sort would rank
    ABOVE every real neighbor.
    """

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(pdf["qe"].tolist(), dtype=np.float64)
            v = np.array(pdf["e"].tolist(), dtype=np.float64)
            den = np.sqrt((q * q).sum(axis=1)) * np.sqrt(
                (v * v).sum(axis=1)
            )
            cos = np.where(
                den > 0.0,
                (q * v).sum(axis=1) / np.where(den > 0.0, den, 1.0),
                0.0,
            )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["vec_id"],
                    "cosine": np.round(cos, 6),
                }
            )

    return cand.select("query_id", "qe", "vec_id", "e").mapInPandas(
        run, schema="query_id long, neighbor_id long, cosine double"
    )


def cosine_topk(
    embeddings: DataFrame,
    query_pred: Column,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``query_pred`` selects the query rows (e.g. ``F.col('vec_id') < 10``).
    """
    v = _vectors(embeddings)
    q = v.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cosine(F.col("qe"), F.col("e")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_weights(table: int, plane: int, dims: int) -> list[float]:
    """Deterministic pseudo-random weights in [-0.5, 0.5).

    splitmix64-style integer scramble of (table, plane, dim): reproducible
    anywhere with no stored model and no data pass.
    """
    mask = (1 << 64) - 1
    out = []
    for d in range(dims):
        x = (
            table * 0x9E3779B97F4A7C15
            + plane * 0xBF58476D1CE4E5B9
            + d * 0x94D049BB133111EB
            + 0x2545F4914F6CDD1D
        ) & mask
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & mask
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & mask
        x ^= x >> 31
        out.append(x / 2.0**64 - 0.5)
    return out


def _lsh_buckets(v: DataFrame, n_tables: int, n_planes: int) -> DataFrame:
    """Explode each vector into one (table, bucket) row per hash table.

    All ``n_tables × n_planes`` projections are ONE numpy matmul per Arrow
    batch (mapInPandas) against the deterministic plane matrix — measured
    ~10× over per-plane Catalyst lambda folds, which priced every
    projection as an interpreted higher-order call. Bucket ids depend only
    on projection signs, so the vectorized path can differ from a scalar
    fold solely for projections within an ulp of zero — candidacy, not
    correctness (every candidate is exactly verified downstream).
    """
    import numpy as np
    import pandas as pd

    def make_planes(dims: int):
        return np.array(
            [
                _plane_weights(t, p, dims)
                for t in range(n_tables)
                for p in range(n_planes)
            ]
        )  # (T*P) x D

    pows = 1 << np.arange(n_planes, dtype=np.int64)
    tables = np.arange(n_tables, dtype=np.int32)

    def bucketize(batches):
        # Dims come from the data (first batch's e.shape[1]), not a
        # constant, so any corpus width hashes correctly; the plane matrix
        # is deterministic per dims, so every task builds the same one.
        planes = None
        for pdf in batches:
            if not len(pdf):
                continue
            e = np.array(pdf["e"].tolist(), dtype=np.float64)
            if planes is None or planes.shape[1] != e.shape[1]:
                planes = make_planes(e.shape[1])
            bits = (e @ planes.T >= 0).reshape(len(pdf), n_tables, n_planes)
            buckets = (bits * pows).sum(axis=2)  # n x T
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_tables),
                    "table": np.tile(tables, len(pdf)),
                    "bucket": buckets.reshape(-1),
                }
            )

    return v.select("vec_id", "e").mapInPandas(
        bucketize, "vec_id long, table int, bucket long"
    )


def lsh_topk(
    embeddings: DataFrame,
    query_pred: Column,
    k: int = 5,
    n_tables: int = 16,
    n_planes: int = 4,
    buckets: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    A query only scores vectors sharing a (table, bucket) cell in at least
    one of ``n_tables`` independent tables. Per-pair candidate probability
    is 1-(1-a^p)^T where a = 1-θ/π — tune (T, p) to the similarity regime:
    few planes / many tables for far neighbors (this synthetic data), many
    planes for near-dup regimes (cos ≥ 0.9) where buckets can be fine and
    cheap. Candidates dedupe before scoring so each pair is scored once.

    Scale: the bucket join shuffles only (table, bucket) cells, never the
    cross product; per-bucket population bounds worst-case work, and skewed
    buckets split under AQE.

    ``buckets`` supplies a precomputed corpus (vec_id, table, bucket)
    table for the SAME (n_tables, n_planes) — the standing hash index a
    deployed LSH maintains (e.g. the registry's per-snapshot memo),
    skipping the corpus-scale bucketize pass per search. The hyperplanes
    are deterministic per (table, plane, dims), so any two bucketize
    passes over the same corpus agree.
    """
    v = _vectors(embeddings)
    vb = (
        buckets
        if buckets is not None
        else _lsh_buckets(v, n_tables, n_planes)
    )
    qb = _lsh_buckets(v.filter(query_pred), n_tables, n_planes).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    candidates = (
        vb.join(F.broadcast(qb), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .dropDuplicates()
    )
    q = v.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = _ivf_score_candidates(
        candidates.join(v, "vec_id").join(F.broadcast(q), "query_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    survivors = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id")
    )
    # RESCORE the <=k survivors per query through the JVM ``_cosine``
    # expression: the numpy candidate scorer is the selection fast path,
    # but its pairwise summation + scaled half-even rounding can differ
    # from the JVM left-fold + HALF_UP round by one ulp at a 6-decimal
    # boundary — and this operator's contract (pytest-pinned) is that
    # every REPORTED cosine equals the brute-force value for that pair.
    # O(k * dims) per query — noise next to candidate scoring.
    rescored = (
        survivors.join(
            v.select(F.col("vec_id").alias("neighbor_id"), "e"),
            "neighbor_id",
        )
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("qe"), F.col("e")).alias("cosine"),
        )
    )
    return rescored.withColumn("rank", F.row_number().over(w))


def dup_candidate_pairs(
    v: DataFrame, n_tables: int, n_planes: int
) -> DataFrame:
    """Candidate (id_a < id_b) pairs sharing ≥1 LSH (table, bucket) cell.

    The self-join keys on (table, bucket) — an equi-join that shuffles each
    vector id n_tables times, never the cross product. A pair at cosine c
    collides per table with probability (1 - acos(c)/π)^n_planes and is
    missed everywhere with (1 - (1-acos(c)/π)^n_planes)^n_tables — pick
    few planes / many tables for low-τ regimes, many planes (fine, cheap
    buckets) for near-dup regimes (τ ≥ 0.9). Hyperplane weights come from
    the driver-side splitmix64 scramble in ``_plane_weights``, so candidacy
    is deterministic for a given corpus with no stored model.
    """
    vb = _lsh_buckets(v, n_tables, n_planes).select("vec_id", "table", "bucket")
    a = vb.select(F.col("vec_id").alias("id_a"), "table", "bucket")
    b = vb.select(F.col("vec_id").alias("id_b"), "table", "bucket")
    return (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )


BLOCKS = 16


def _score_block_pair(a, b, threshold, diagonal):
    """BLAS-score one grid cell: all cosines between block ``a`` and block
    ``b`` (pandas frames with ``vec_id``/``e``), emitting (vec_a < vec_b)
    pairs at or above ``threshold``. ``diagonal`` cells hold the same block
    on both sides (both orientations present → keep a < b); off-diagonal
    cells see each unordered pair once → normalize orientation. Shared by
    the corpus-wide grid (``blocked_pairs``) and the per-cluster grid
    (``_cluster_blocked_pairs``)."""
    import numpy as np
    import pandas as pd

    if not len(a) or not len(b):
        return pd.DataFrame(
            {"vec_a": [], "vec_b": [], "cosine": []}
        ).astype({"vec_a": "int64", "vec_b": "int64", "cosine": "float64"})
    ea = np.array(a["e"].tolist(), dtype=np.float64)
    eb = np.array(b["e"].tolist(), dtype=np.float64)
    na = np.sqrt((ea * ea).sum(axis=1))
    nb = np.sqrt((eb * eb).sum(axis=1))
    cos = np.round((ea @ eb.T) / np.outer(na, nb), 6)
    ia, ib = np.nonzero(cos >= threshold)
    ids_a = a["vec_id"].to_numpy()[ia]
    ids_b = b["vec_id"].to_numpy()[ib]
    if diagonal:  # cell holds both orientations: keep a < b
        keep = ids_a < ids_b
    else:  # off-diagonal pair appears once: normalize orientation
        keep = np.ones(len(ids_a), dtype=bool)
    lo = np.minimum(ids_a[keep], ids_b[keep])
    hi = np.maximum(ids_a[keep], ids_b[keep])
    return pd.DataFrame(
        {"vec_a": lo, "vec_b": hi, "cosine": cos[ia[keep], ib[keep]]}
    )


def blocked_pairs(
    v: DataFrame, threshold: float, n_blocks: int = BLOCKS
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via a block-grid equi-join with
    BLAS-scored cells — the distributed brute-force shape.

    When the threshold sits inside the bulk of the similarity
    distribution (near-dup τ close to the random-pair cosine), NO
    candidate generator can prune: the candidate set ≈ all pairs, and LSH
    only adds bucket-join overhead (measured 16× the brute-force work at
    τ=0.3 on near-orthogonal vectors). The honest scale plan is then
    structured O(n²): vectors hash into ``n_blocks`` blocks; each of the
    B(B+1)/2 grid cells is one applyInPandas group that scores its
    |block|² pairs with ONE numpy matmul and emits only survivors.

    No CartesianProduct node: the grid is an equi-join on block ids, each
    executor holds at most two blocks, and adding executors shrinks
    per-task work (grow ``n_blocks`` ∝ √n to bound cell size). Each
    unordered pair lands in exactly one cell, so no dedup pass. At high τ
    (sparse matches) prefer ``method='lsh'`` — there pruning works.

    Cosines: numpy's pairwise-reduction dot, verified to round-6dp-match
    the sequential fold the oracle uses on every pair of the test corpora
    (ulp-level reassociation sits ~9 orders of magnitude below the
    rounding step).
    """
    spark = v.sparkSession
    grid = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    blk = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_blocks))
    tagged = v.select("vec_id", "e", blk.cast("int").alias("blk"))
    side_a = grid.join(tagged, F.col("blk") == F.col("bi")).select(
        "bi", "bj", F.lit(0).alias("side"), "vec_id", "e"
    )
    side_b = grid.join(tagged, F.col("blk") == F.col("bj")).select(
        "bi", "bj", F.lit(1).alias("side"), "vec_id", "e"
    )

    def score_cell(key, pdf):
        bi, bj = key
        return _score_block_pair(
            pdf[pdf["side"] == 0], pdf[pdf["side"] == 1], threshold, bi == bj
        )

    return (
        side_a.unionByName(side_b)
        .groupBy("bi", "bj")
        .applyInPandas(score_cell, "vec_a long, vec_b long, cosine double")
    )


def dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    sample_mod: int | None = None,
    method: str = "lsh",
    n_tables: int = 32,
    n_planes: int = 2,
) -> DataFrame:
    """All vector pairs with cosine ≥ threshold (a < b).

    ``method='lsh'`` generates candidates with multi-table hyperplane LSH
    and exact-cosine-verifies candidates only — the path for high-τ
    (sparse) dedup regimes. ``method='blocked'`` is the structured exact
    scan for dense regimes where τ sits in the bulk of the distribution
    (see ``blocked_pairs``). ``method='exact'`` is the all-pairs oracle
    baseline; it REQUIRES ``sample_mod`` (a deterministic keyspace sample,
    vec_id % mod == 0) because an ungated cross join is quadratic and must
    never run at corpus scale.
    """
    v = _vectors(embeddings)
    if sample_mod:
        v = v.filter(F.col("vec_id") % sample_mod == 0)
    if method == "blocked":
        return blocked_pairs(v, threshold).select(
            F.col("vec_a"), F.col("vec_b"), F.col("cosine")
        )
    if method == "exact":
        if not sample_mod:
            raise ValueError(
                "method='exact' is the all-pairs oracle baseline; pass "
                "sample_mod to bound the cross join (use method='lsh' at scale)"
            )
        a = v.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"))
        b = v.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"))
        cos = _cosine(F.col("ea"), F.col("eb"))
        return (
            a.crossJoin(b)
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b", cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold)
        )
    cand = dup_candidate_pairs(v, n_tables, n_planes)
    # Norms are computed once per vector, not once per pair — sqrt(dot(x,x))
    # on the same input is bit-identical either way, so the oracle rounding
    # is unaffected while the verify stage drops two of its three folds.
    vn = v.withColumn("__nrm", _norm(F.col("e")))
    scored = (
        cand.join(
            vn.select(
                F.col("vec_id").alias("id_a"),
                F.col("e").alias("ea"),
                F.col("__nrm").alias("__na"),
            ),
            "id_a",
        )
        .join(
            vn.select(
                F.col("vec_id").alias("id_b"),
                F.col("e").alias("eb"),
                F.col("__nrm").alias("__nb"),
            ),
            "id_b",
        )
        .select(
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
            F.round(
                _dot(F.col("ea"), F.col("eb")) / (F.col("__na") * F.col("__nb")), 6
            ).alias("cosine"),
        )
    )
    return scored.filter(F.col("cosine") >= threshold)


def _assign(
    df: DataFrame, cents, id_col: str, vec_col: str, keep: int
) -> DataFrame:
    """Attach each row's ``keep`` nearest centroids.

    The centroid table is MODEL state (rows ∝ n_centroids, never data
    size), so it lives driver-side like any k-means model and ships to
    executors as a closure matrix: each Arrow batch scores all centroids
    in one matmul and takes its per-row top-``keep`` with a stable
    argsort — descending similarity, centroid id ascending on ties
    (centroids are pre-sorted by id, stable sort preserves that order).
    Replaces a crossJoin + per-pair lambda cosine + per-id window:
    measured ~4× on the IVF bench, and no shuffle at all.
    """
    import numpy as np
    import pandas as pd

    crows = _cent_rows(cents)
    cids = np.array([c for c, _ in crows], dtype=np.int64)
    cmat = np.array([v for _, v in crows], dtype=np.float64)
    cnorm = cmat / np.sqrt((cmat * cmat).sum(axis=1, keepdims=True))
    n_keep = min(keep, len(cids))

    def assign_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            e = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            en = e / np.sqrt((e * e).sum(axis=1, keepdims=True))
            top = np.argsort(-(en @ cnorm.T), axis=1, kind="stable")[
                :, :n_keep
            ]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_keep),
                    vec_col: np.repeat(pdf[vec_col].to_numpy(), n_keep),
                    "cent_id": cids[top].reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign_batches, f"{id_col} long, {vec_col} array<double>, cent_id long"
    )


def train_centroids(
    v: DataFrame, n_centroids: int, n_iters: int = 3
) -> DataFrame:
    """Deterministic Lloyd's k-means over (vec_id, e) as DataFrame ops.

    Init is a deterministic keyspace sample (first ``n_centroids``
    vec_ids); each iteration assigns every vector to its nearest centroid
    (vectorized map-side pass, ties broken by cent_id) and recomputes
    element-wise means via posexplode → groupBy(cent, dim). Means
    accumulate in exact decimal, so for a fixed assignment the model is
    identical on any partitioning; assignments themselves are BLAS-scored
    (stable across partitionings — each row's scores are row-local — with
    the usual ulp caveat across different BLAS builds). Empty clusters
    drop out (fewer, better-populated lists).

    Scale: per iteration one shuffle keyed on (cent_id, dim) — the
    standard distributed k-means shape; the centroid model stays
    driver-side tiny (rows ∝ n_centroids).
    """
    cents = v.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("ce")
    )
    for _ in range(n_iters):
        assigned = _assign(v, cents, "vec_id", "e", 1)
        means = (
            assigned.select("cent_id", F.posexplode("e").alias("dim", "x"))
            .groupBy("cent_id", "dim")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,20)"))
                    / F.count(F.lit(1))
                )
                .cast("double")
                .alias("m")
            )
        )
        cents = (
            means.groupBy("cent_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm")
            )
            .select(
                "cent_id",
                F.transform(F.col("dm"), lambda s: s.m).alias("ce"),
            )
        )
    return cents


def ivf_topk(
    embeddings: DataFrame,
    query_pred: Column,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 6,
    train_iters: int = 3,
    centroids: "DataFrame | list | None" = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: k-means inverted lists; queries probe the ``n_probe``
    nearest lists only.

    Centroids are Lloyd-trained (``train_centroids``) from a
    deterministic keyspace init — on clustered corpora untrained seed
    centroids crater recall because list populations are arbitrary.
    Scale: assignment is one broadcast pass; the probe join touches
    ~n_probe/n_centroids of the corpus per query.

    Pass a precomputed ``assigned`` (vec_id, e, cent_id — the
    :func:`_assign` output for the SAME centroid model, e.g. the
    registry's persisted per-(snapshot, model) assignment memo) to skip
    the corpus-scale assignment pass: the inverted-list table is the
    standing index of a deployed IVF, built once per model, not per
    query.  ``assigned`` must hold exactly ONE row per vec_id (the
    ``keep=1`` standing-index shape every caller in this repo
    materializes): each query then meets each vector through at most
    one probed list, so candidate (query, neighbor) pairs are unique by
    construction — the r13 ``dropDuplicates`` pass (a full shuffle +
    aggregate of the scored candidate table per query) removed in r14
    was provably a no-op under that contract.
    """
    v = _vectors(embeddings)
    cents = (
        centroids
        if centroids is not None
        else train_centroids(v, n_centroids, train_iters)
    )

    if assigned is None:
        assigned = _assign(v, cents, "vec_id", "e", 1)
    probes = _assign(
        v.filter(query_pred).select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
        ),
        cents,
        "query_id",
        "qe",
        n_probe,
    )
    scored = _ivf_score_candidates(
        probes.join(assigned, "cent_id").filter(
            F.col("vec_id") != F.col("query_id")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_incremental_topk(
    embeddings: DataFrame,
    increment_pred: Column,
    query_pred: Column,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 6,
    train_iters: int = 3,
    centroids: "DataFrame | list | None" = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN over an INCREMENTED corpus without retraining — daily
    index maintenance (ref pattern: the reference's daily syncs append
    into standing tables and never rebuild, `*_sync_daily/main.py`; this
    is the embedding twin of the incremental near-dedup check).

    The coarse quantizer is trained on the BASE subset only (rows where
    ``increment_pred`` is false — the standing index's model, normally
    arriving via ``centroids=`` from a model memo); increment vectors
    are assigned into the EXISTING inverted lists by the same
    nearest-centroid rule that placed the base vectors, and queries
    probe base + increment together. No corpus-sized retrain shuffle —
    maintenance cost is one stateless broadcast-scored assignment pass
    over the increment.

    Recall trade documented by test (tests/test_scale_ops.py): list
    boundaries were drawn for the base distribution, so recall on the
    incremented corpus can trail a full retrain — the gap is the
    "retrain now?" signal, and stays small while the increment is drawn
    from the same distribution (the daily-sync regime).

    ``assigned`` (vec_id, e, cent_id for the same base-trained model)
    skips the full-corpus assignment pass — the maintained index IS a
    standing table, so consumers share one materialization per
    (snapshot, model) instead of re-deriving it per query.  Like
    :func:`ivf_topk`, ``assigned`` must hold exactly one row per
    vec_id (base and increment rows alike — the maintenance pass
    assigns each increment vector once), which makes candidate pairs
    unique without a dedup shuffle.
    """
    v = _vectors(embeddings)
    cents = (
        centroids
        if centroids is not None
        else train_centroids(
            v.filter(~increment_pred), n_centroids, train_iters
        )
    )
    if assigned is None:
        assigned = _assign(v, cents, "vec_id", "e", 1)
    probes = _assign(
        v.filter(query_pred).select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
        ),
        cents,
        "query_id",
        "qe",
        n_probe,
    )
    scored = _ivf_score_candidates(
        probes.join(assigned, "cent_id").filter(
            F.col("vec_id") != F.col("query_id")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_list_drift(
    embeddings: DataFrame,
    increment_pred: Column,
    centroids: "DataFrame | list",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Per-list maintenance report for an incrementally-maintained IVF
    index — the "retrain now?" observability next to
    :func:`ivf_incremental_topk`.

    For each coarse list: base vs increment occupancy (a list soaking
    up a disproportionate share of the increment signals distribution
    shift) and mean cosine-to-centroid of base vs increment members
    (increment members sitting systematically farther from their
    centroid = the quantizer no longer fits the data; ``cos_drift`` is
    that gap). One stateless broadcast-scored assignment pass + one
    groupBy on the O(n_centroids) key — no corpus-sized shuffle; pass
    ``assigned`` (the same model's standing (vec_id, e, cent_id) table)
    to skip even that.
    """
    v = _vectors(embeddings)
    flags = v.select(
        "vec_id", increment_pred.cast("boolean").alias("__is_incr")
    )
    if assigned is None:
        assigned = _assign(v, centroids, "vec_id", "e", 1)
    centroids = _cent_df(embeddings.sparkSession, centroids)
    assigned = (
        assigned.join(flags, "vec_id")
        .join(F.broadcast(centroids), "cent_id")
        .withColumn("__cos", _cosine(F.col("e"), F.col("ce")))
    )
    n_base = F.count(F.when(~F.col("__is_incr"), F.lit(1)))
    n_incr = F.count(F.when(F.col("__is_incr"), F.lit(1)))
    cos_base = F.avg(F.when(~F.col("__is_incr"), F.col("__cos")))
    cos_incr = F.avg(F.when(F.col("__is_incr"), F.col("__cos")))
    return (
        assigned.groupBy("cent_id")
        .agg(
            n_base.alias("n_base"),
            n_incr.alias("n_incr"),
            F.round(
                n_incr.cast("double")
                / F.greatest(n_base, F.lit(1)).cast("double"),
                6,
            ).alias("occupancy_growth"),
            F.round(cos_base, 6).alias("mean_cos_base"),
            F.round(cos_incr, 6).alias("mean_cos_incr"),
            F.round(cos_base - cos_incr, 6).alias("cos_drift"),
        )
        .orderBy("cent_id")
    )


def kmeans_clusters(
    embeddings: DataFrame,
    n_clusters: int = 16,
    n_iters: int = 3,
    centroids: "DataFrame | list | None" = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Topical document clustering: final k-means assignments + sizes.

    The training-data use case behind IVF's centroids surfaced as a
    first-class result: cluster ids for mix balancing / near-dup triage,
    with each vector's cosine to its centroid. One Lloyd's train
    (:func:`train_centroids`) + one broadcast assignment pass — no
    data-sized shuffle beyond the training iterations themselves.
    Pass a precomputed ``assigned`` (vec_id, e, cent_id — the _assign
    output, e.g. the registry's fingerprint memo shared with
    semdedup_prune) to skip the assignment pass entirely.
    """
    v = _vectors(embeddings)
    cents = (
        _cent_df(embeddings.sparkSession, centroids)
        if centroids is not None
        else train_centroids(v, n_clusters, n_iters)
    )
    if assigned is None:
        assigned = _assign(v, cents, "vec_id", "e", 1)
    sizes = assigned.groupBy("cent_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    cents_e = cents.select("cent_id", F.col("ce"))
    return (
        assigned.join(F.broadcast(cents_e), "cent_id")
        .join(F.broadcast(sizes), "cent_id")
        .select(
            "vec_id",
            "cent_id",
            "cluster_size",
            F.round(
                _dot(F.col("e"), F.col("ce"))
                / (_norm(F.col("e")) * _norm(F.col("ce"))),
                6,
            ).alias("cosine_to_centroid"),
        )
    )


#: Exact-sum decimal for centroid/outlier math: squared diffs of unit-ish
#: vectors are < 4, so 64 terms stay far under the integer capacity while
#: 12 fractional digits keep the rounding-to-6dp boundary stable.
OUT_DEC = "decimal(28,12)"


def centroid_outliers(
    embeddings: DataFrame, k: int = 50, dims: int = 64
) -> DataFrame:
    """Semantic outliers: the ``k`` vectors farthest from the corpus
    centroid — the standard embedding-space triage for mislabeled /
    off-distribution training documents (cf. SemDeDup-style cluster
    outlier pruning).

    Determinism across engines: the centroid is NOT a plain double AVG
    (double sums are add-order-dependent, so a parallel engine and the
    oracle can disagree in the last ulp and flip the 6dp rounding).
    Instead each dimension sums exactly as DECIMAL(28,12) — associative,
    partition-order-free — and converts to double once; squared diffs
    likewise sum as exact decimals per vector.

    Scale: the centroid is a posexplode → groupBy(pos) partial aggregate
    (the shuffle carries partitions × dims pre-combined rows, not the
    corpus) folded to ONE broadcast row; the distance is a row-local fold
    (no shuffle), and the global top-k is a TakeOrdered — O(k) driver
    state, never a full sort. (A 64-wide unrolled aggregate computed the
    same centroid in one pass but cost ~1.5s of analyzer/codegen time on
    EVERY invocation — the narrow exploded shape keeps the plan small.)
    """
    v = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    per_dim = (
        v.select(F.posexplode("e").alias("pos", "val"))
        .groupBy("pos")
        .agg(
            F.sum(F.col("val").cast(OUT_DEC)).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    cent = per_dim.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "pos",
                    (F.col("s").cast("double") / F.col("n").cast("double"))
                    .alias("c"),
                )
            )
        ).alias("__pc")
    )
    c_arr = F.transform("__pc", lambda x: x["c"])
    dist2 = F.aggregate(
        F.zip_with(
            F.col("e"), F.col("__c"), lambda x, c: ((x - c) * (x - c)).cast(OUT_DEC)
        ),
        F.lit(0).cast("decimal(38,12)"),
        lambda acc, x: (acc + x).cast("decimal(38,12)"),
    )
    return (
        v.crossJoin(F.broadcast(cent.select(c_arr.alias("__c"))))
        .select(
            "vec_id",
            "label",
            F.round(F.sqrt(dist2.cast("double")), 6).alias("centroid_dist"),
        )
        .orderBy(F.col("centroid_dist").desc(), F.col("vec_id"))
        .limit(k)
    )


#: Upper bound on rows per semdedup scoring cell: a cell-pair task holds at
#: most ~2×this many embeddings and a this²-sized cosine block — the knob
#: that keeps executor memory flat no matter how skewed the k-means
#: clustering comes out.
SEMDEDUP_CELL_ROWS = 4096


def _cluster_blocked_pairs(
    assigned: DataFrame, tau: float, max_cell_rows: int
) -> DataFrame:
    """Within-cluster cosine pairs ≥ ``tau`` with BOUNDED per-task state.

    The naive shape (one applyInPandas group per cluster) materializes an
    entire cluster's embedding matrix and its |c|² cosine block in a single
    task — quadratic memory in the largest cluster, an OOM under skew. This
    is the ``blocked_pairs`` grid with ``cent_id`` as an extra grid key:
    each cluster's members hash into ``ceil(|c| / max_cell_rows)``
    sub-blocks, every (bi ≤ bj) sub-block pair is one cell, and a cell task
    scores at most ~max_cell_rows² cosines regardless of cluster sizes.

    Driver state stays strictly O(n_clusters): only the per-cluster size
    table is collected (the same bounded-model state as the centroid table
    itself). The (cent_id, bi, bj) grid — O(Σ nsub²) rows, ~50M for one
    skewed 40M-row cluster — is generated DISTRIBUTED by exploding index
    sequences over the tiny nsub table, never materialized on the driver
    (the quadratic WORK within a giant cluster is inherent to SemDeDup;
    what this bounds is per-task AND driver memory, so adding executors
    shrinks wall-clock instead of deepening one process's OOM).
    """
    spark = assigned.sparkSession
    sizes = {
        r["cent_id"]: r["n"]
        for r in assigned.groupBy("cent_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    nsub_rows = [
        (cid, max(1, -(-sizes[cid] // max_cell_rows))) for cid in sorted(sizes)
    ]

    if all(nsub == 1 for _cid, nsub in nsub_rows):
        # Every cluster fits one cell, so the one-group-per-cluster plan
        # is ALREADY memory-bounded (|c| ≤ max_cell_rows by the collected
        # sizes) — skip the grid's extra joins/union (measured ~1.7s of
        # fixed plan overhead at sf0.1 with zero benefit in this regime).
        import pandas as pd  # noqa: F401  (applyInPandas contract)

        def score_cluster(pdf):
            return _score_block_pair(pdf, pdf, tau, True)

        return (
            assigned.select("cent_id", "vec_id", "e")
            .groupBy("cent_id")
            .applyInPandas(
                score_cluster, "vec_a long, vec_b long, cosine double"
            )
        )

    nsub_df = spark.createDataFrame(nsub_rows, "cent_id long, nsub int")
    # O(Σ nsub²) grid rows, generated executor-side from the O(n_clusters)
    # nsub table: explode bi over [0, nsub), then bj over [bi, nsub).
    grid = (
        nsub_df.select(
            "cent_id",
            "nsub",
            F.explode(F.sequence(F.lit(0), F.col("nsub") - 1)).alias("bi"),
        )
        .repartition("cent_id", "bi")  # spread the bj explode; the
        # side_a join below hashes on the same keys, so this exchange is
        # the join's, not an extra one
        .select(
            "cent_id",
            "bi",
            F.explode(
                F.sequence(F.col("bi"), F.col("nsub") - 1)
            ).alias("bj"),
        )
    )
    tagged = assigned.join(F.broadcast(nsub_df), "cent_id").withColumn(
        "blk", F.pmod(F.xxhash64(F.col("vec_id")), F.col("nsub")).cast("int")
    )
    side_a = grid.join(
        tagged.withColumnRenamed("blk", "bi"), ["cent_id", "bi"]
    ).select("cent_id", "bi", "bj", F.lit(0).alias("side"), "vec_id", "e")
    side_b = grid.join(
        tagged.withColumnRenamed("blk", "bj"), ["cent_id", "bj"]
    ).select("cent_id", "bi", "bj", F.lit(1).alias("side"), "vec_id", "e")

    def score_cell(key, pdf):
        _cid, bi, bj = key
        return _score_block_pair(
            pdf[pdf["side"] == 0], pdf[pdf["side"] == 1], tau, bi == bj
        )

    return (
        side_a.unionByName(side_b)
        .groupBy("cent_id", "bi", "bj")
        .applyInPandas(score_cell, "vec_a long, vec_b long, cosine double")
    )


def semdedup_prune(
    embeddings: DataFrame,
    n_clusters: int = 8,
    tau: float = 0.3,
    n_iters: int = 3,
    centroids: "DataFrame | list | None" = None,
    max_cell_rows: int = SEMDEDUP_CELL_ROWS,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): semantic deduplication —
    k-means the embedding space, score cosine only WITHIN each cluster,
    connect pairs above ``tau`` transitively, keep each group's min-id
    representative. The semantic complement to MinHash/SimHash (those
    catch lexical near-dups; this catches paraphrases that share no
    n-grams).

    Scale posture: clustering is what makes the quadratic tractable —
    pair scoring work is bounded by the LARGEST CLUSTER, never the corpus
    (SemDeDup runs with n_clusters ∝ corpus size so cluster populations
    stay roughly constant; grow ``n_clusters`` with the corpus the same
    way — our default suits the test corpus). Per-task MEMORY is bounded
    separately and unconditionally: clusters larger than
    ``max_cell_rows`` sub-block into the ``blocked_pairs`` grid keyed by
    (cent_id, bi, bj), so a skewed clustering degrades into more bounded
    cell tasks instead of one quadratic-memory task
    (``_cluster_blocked_pairs``). Group resolution reuses the verified
    pointer-jumping CC (operators/graph.py). Model state is the
    O(n_clusters) centroid table — same bounded-model discipline as IVF.

    Output: (vec_id, cluster_id, group_id, group_size, keep) — one row
    per vector; ``keep`` is False only for non-canonical members of a
    semantic-dup group.
    """
    from ._cache import swap_cache
    from .graph import connected_components

    if assigned is not None:
        # Caller supplies a (vec_id, e, cent_id) assignment — typically
        # the registry's fingerprint memo shared with kmeans_clusters —
        # already persisted, so no swap_cache layer here.
        assigned = assigned.select("vec_id", "cent_id", "e")
    else:
        v = _vectors(embeddings)
        cents = (
            centroids
            if centroids is not None
            else train_centroids(v, n_clusters, n_iters)
        )
        # Persisted: the cluster-size collect, the grid join, and the
        # final cluster_id projection all consume the assignment pass.
        assigned = swap_cache(
            "semdedup_assigned",
            _assign(v, cents, "vec_id", "e", 1).select(
                "vec_id", "cent_id", "e"
            ),
        )
    pairs = _cluster_blocked_pairs(assigned, tau, max_cell_rows)
    labels = connected_components(pairs, "vec_a", "vec_b")
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    grouped = labels.join(sizes, "label").select(
        F.col("node").alias("vec_id"),
        F.col("label").alias("group_id"),
        "group_size",
    )
    return (
        assigned.select("vec_id", F.col("cent_id").alias("cluster_id"))
        .join(grouped, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.coalesce(F.col("group_id"), F.col("vec_id")).alias("group_id"),
            F.coalesce(F.col("group_size"), F.lit(1).cast("long")).alias(
                "group_size"
            ),
            (
                F.coalesce(F.col("group_id"), F.col("vec_id"))
                == F.col("vec_id")
            ).alias("keep"),
        )
    )


def ivf_probe_scored(
    embeddings: DataFrame,
    query_pred: Column,
    centroids: "DataFrame | list",
    assigned: DataFrame,
    max_probe: int,
) -> DataFrame:
    """The recall ladder's probe-scored candidate table
    (query_id, probe_rank, neighbor_id, cosine): every query × every
    vector in its ``max_probe`` nearest lists, scored with the exact JVM
    ``_cosine`` (the same fold the brute-force ground truth uses, so the
    full-probe rung ties break identically and recall is exactly 1.0
    there).  A pure function of (snapshot, model, query_pred,
    max_probe) — the registry persists it per snapshot
    (``_recall_scored_for``) so repeated ladder queries skip the
    candidate-scoring fill, the same standing-index posture as
    ``assigned`` itself."""
    v = _vectors(embeddings)
    centroids = _cent_df(embeddings.sparkSession, centroids)
    q = v.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__csim").desc(), "cent_id"
    )
    probe_lists = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "qe",
            "cent_id",
            _cosine(F.col("qe"), F.col("ce")).alias("__csim"),
        )
        .withColumn("probe_rank", F.row_number().over(wq))
        .where(F.col("probe_rank") <= max_probe)
    )
    return (
        probe_lists.join(assigned, "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "probe_rank",
            F.col("vec_id").alias("neighbor_id"),
            _cosine(F.col("qe"), F.col("e")).alias("cosine"),
        )
    )


def ivf_recall_curve(
    embeddings: DataFrame,
    query_pred: Column,
    k: int = 5,
    n_centroids: int = 16,
    probes: tuple[int, ...] = (1, 2, 4, 8, 16),
    train_iters: int = 3,
    centroids: "DataFrame | list | None" = None,
    assigned: DataFrame | None = None,
    exact: DataFrame | None = None,
    scored: DataFrame | None = None,
) -> DataFrame:
    """IVF tuning curve: recall@k against brute force for a ladder of
    ``n_probe`` settings of the SAME trained index — the ANN twin of
    the LSH band-tuning table, answering "how many lists must I probe
    here" with a measurement instead of a rule of thumb. Recall is
    nondecreasing in n_probe by construction (probing more lists only
    adds candidates) and reaches exactly 1.0 at n_probe = n_lists
    (the full scan IS brute force, same tie-break).

    One corpus assignment pass and ONE probe-scored candidate table
    (persisted; its rows are queries × the probed corpus fraction)
    serve every ladder step: each step is a prefix filter on the
    query's centroid rank plus a top-k window, so the ladder costs one
    ivf_topk, not len(probes) of them. Output is one row per n_probe.

    ``assigned`` reuses a standing (vec_id, e, cent_id) table for the
    same model; ``exact`` reuses a precomputed brute-force
    (query_id, neighbor_id[, ...]) top-k at the SAME query_pred and k
    (e.g. the ann_cosine_topk result the registry already memoizes —
    the ground truth is that query's exact output, so recomputing it
    here would double the curve's dominant brute-force cost).
    ``scored`` reuses a precomputed :func:`ivf_probe_scored` table for
    the SAME (embeddings, query_pred, centroids, assigned) with
    ``max_probe`` >= this call's clamped ``probes[-1]`` (the registry's
    per-snapshot memo probes every list, so any ladder is a prefix) —
    skipping the per-call candidate-scoring fill, which was the
    ladder's remaining dominant cost once ground truth and assignment
    were standing.
    """
    from ._cache import swap_cache

    probes = tuple(sorted(set(probes)))
    v = _vectors(embeddings)
    cents = (
        centroids
        if centroids is not None
        else train_centroids(v, n_centroids, train_iters)
    )
    # Validate and report against the ACTUAL list count: a trained model
    # can legitimately hold fewer centroids than requested (empty
    # clusters drop), and a caller-supplied table sets its own size.
    # Rungs above n_lists are clamped away — a trained model dropping an
    # empty cluster must not hard-fail a standing tuning query — with
    # the full-probe rung (n_probe = n_lists, recall exactly 1.0)
    # appended in their place; a ladder that is empty or starts below 1
    # is a caller bug and still raises.
    if not probes or probes[0] < 1:
        raise ValueError(f"probes must be >= 1, got {probes}")
    # A row-list model (the registry memo) knows its size driver-side;
    # only a DataFrame model pays the count job (r15: that one job on a
    # 16-row local relation measured ~0.4s of pure dispatch per call).
    n_lists = (
        len(cents) if not isinstance(cents, DataFrame) else cents.count()
    )
    if probes[-1] > n_lists:
        probes = tuple(p for p in probes if p <= n_lists)
        if not probes:
            raise ValueError(
                f"every probe rung exceeds n_lists={n_lists}"
            )
        if probes[-1] < n_lists:
            probes = probes + (n_lists,)
    # Persisted like `scored`: the ground truth feeds the totals row and
    # every ladder step's hit join — unpersisted, the corpus-scale
    # brute-force scan would re-execute len(probes)+1 times.
    if exact is None:
        exact = swap_cache(
            "ivf_recall_exact",
            cosine_topk(embeddings, query_pred, k).select(
                "query_id", "neighbor_id"
            ),
        )
    else:
        exact = exact.select("query_id", "neighbor_id")
    if assigned is None:
        assigned = _assign(v, cents, "vec_id", "e", 1)
    if scored is None:
        scored = swap_cache(
            "ivf_recall_scored",
            ivf_probe_scored(
                embeddings, query_pred, cents, assigned, probes[-1]
            ),
        )
    else:
        # caller-supplied standing candidate table (may carry rungs past
        # this ladder's clamp — a prefix filter keeps the contract tight
        # and is a no-op for the registry's probes-every-list memo)
        scored = scored.where(F.col("probe_rank") <= probes[-1])
    totals = exact.agg(
        F.count(F.lit(1)).alias("possible"),
        F.countDistinct("query_id").alias("n_queries"),
    )
    # Single-pass ladder (r14): the per-rung top-k is the prefix of the
    # GLOBAL (cosine desc, neighbor_id) candidate order restricted to
    # probe_rank <= p — (query_id, neighbor_id) is unique in `scored`
    # (each vector lives in exactly one list, each query probes distinct
    # lists), so that order is total per query and a running conditional
    # count over it IS the row_number of the filtered subset.  One
    # window pass evaluates every rung's membership flag at once, one
    # inner join against the ground truth scores them, one global
    # aggregate sums the ladder, and an explode reshapes to one row per
    # n_probe.  Replaces the r13 shape — len(probes) × (window + join +
    # aggregate) unioned — which paid plan analysis and a window
    # shuffle per rung for the same answer (measured: construct 4.0s +
    # exec 1.4s → well under a second each at sf0.1; plan drops from 5
    # window subtrees to 1).
    wrun = (
        Window.partitionBy("query_id")
        .orderBy(F.col("cosine").desc(), "neighbor_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = scored
    for p in probes:
        eligible = F.col("probe_rank") <= p
        rank_in_prefix = F.sum(
            F.when(eligible, F.lit(1)).otherwise(F.lit(0))
        ).over(wrun)
        flagged = flagged.withColumn(
            f"__hit_{p}",
            (eligible & (rank_in_prefix <= k)).cast("long"),
        )
    ladder = flagged.join(exact, ["query_id", "neighbor_id"]).agg(
        *[
            F.coalesce(F.sum(f"__hit_{p}"), F.lit(0).cast("long")).alias(
                f"__hits_{p}"
            )
            for p in probes
        ]
    )
    rungs = F.array(
        *[
            F.struct(
                F.lit(p).alias("n_probe"),
                F.round(F.lit(p) / F.lit(float(n_lists)), 4).alias(
                    "lists_scanned_share"
                ),
                F.col("n_queries").alias("n_queries"),
                F.col(f"__hits_{p}").alias("hits"),
                F.col("possible").alias("possible"),
                F.round(
                    F.col(f"__hits_{p}").cast("double") / F.col("possible"),
                    6,
                ).alias("recall_at_k"),
            )
            for p in probes
        ]
    )
    return (
        ladder.crossJoin(totals)
        .select(F.explode(rungs).alias("__r"))
        .select("__r.*")
    )
