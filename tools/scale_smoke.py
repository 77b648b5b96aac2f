"""Scale smoke: verify the heavy-hitter queries grow ~linearly from sf0.1
to a synthetic ~sf1 corpus (10 key-shifted replicas), catching quadratic
or driver-side blowups that the fixed-sf bench can never see.

The ~sf1 corpus is built from the driver's own sf0.1 tables — each
replica shifts every key column by i*KEY_OFFSET so joins stay consistent
(region/nation are shared dimensions and are copied once; their keys are
referenced unshifted). Naive replication would multiply near-dup PAIR
counts quadratically (every doc gains replicas-1 identical twins), which
tests the data, not the engine — so each documents replica suffixes
every word with its replica index: replicas become lexically independent
corpora, the within-replica dup structure is preserved, and the dedup /
inverted-index family's output scales linearly too. Embeddings replicas
get the analogous treatment: each replica applies its own deterministic
±1 sign pattern per dimension (a diagonal orthogonal map) — within a
replica every cosine is EXACTLY preserved (both vectors flip the same
signs), while cross-replica cosines collapse toward 0 (≈half the mass
flips), so the semantic-dedup family's candidate pairs stay linear too.
The smoke set covers three shapes: shuffle/join/window aggregates, the
shingle-join lexical dedup stack, and the embedding/k-means semantic
stack (semdedup runs with n_clusters ∝ corpus size per its documented
contract — fixed k with 10x data would make every cluster 10x larger
and the within-cluster pair work 10x/replica BY DESIGN, testing the
parameterization, not the engine).

Usage: python tools/scale_smoke.py [--replicas 10] [--out SCALE_SMOKE.json]
Writes a JSON report {query: {small_s, big_s, ratio}, ...} and exits
nonzero if any ratio exceeds LINEAR_RATIO_CEILING.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.registry import QUERIES
from snowflake_to_bq_pipeline_spark.session import get_spark

SMALL_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Key columns shifted per replica so cross-table joins stay consistent.
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: Shared dimensions copied once (replicas reference them unshifted).
COPY_TABLES = ["region", "nation"]

KEY_OFFSET = 1_000_000_000

#: Linear-output heavy hitters: shuffle/join/window/row-local shapes.
#: A clean linear scale-up lands well under this ceiling even with fixed
#: overheads amortized; a quadratic one lands near replicas² (~100x).
SMOKE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q9_product_profit",
    "q18_large_orders",
    "individual_budget_tracking",
    "budget_vs_actual",
    "rolling_revenue_7d",
    "event_session_stats",
    "repetition_filter",
    "charlm_perplexity",
    "sequence_packing",
    "doc_chunk_windows",
    "zipf_slope_by_source",
    # dedup / inverted-index family (linear by the word-suffix construction)
    "dedup_exact",
    "ngram_jaccard_dups",
    "dedup_clusters",
    "tfidf_doc_similarity",
    "decontamination_overlap",
    # quadratic-risk family (r6): banded/bucketed candidate generators
    # whose failure mode — super-linear pair blowup — the fixed-sf bench
    # cannot see
    "dedup_minhash_lsh",
    "dedup_simhash",
    "substring_dup_profile",
    "ngram_containment_dups",
    "incremental_dedup_check",
    "kmeans_doc_clusters",
    # bounded-fan-out source matrix: output is C(|sources|,2) rows at any
    # corpus size; the smoke checks the (source, shingle) distinct +
    # self-join stays linear in corpus
    "cross_source_ngram_overlap",
    # r12 additions: the cluster-safe split (pair memo + CC + sparse left
    # join) and the trained NB classifier (corpus-scale gram stream vs
    # broadcast O(buckets) model) — both linear by construction, enrolled
    # so the claim is measured, not asserted
    "dataset_split_assign_cluster_safe",
    "quality_classifier_scores",
    # r13: seed-and-extend span discovery — the extension join must stay
    # candidate-bounded (anchors ~ positions/band; candidates ~ true
    # duplication), measured here rather than asserted
    "substring_dup_spans",
    # late r14: the daily-increment span probe — candidate volume must
    # scale with true shared spans (anchor-hash bucket join against the
    # standing slice), not with corpus x increment
    "incremental_span_check",
    # r13: three memo-riding joins + the exact-hash groupBy + the
    # semantic CC over the embedding pair table (sign-flip replicas keep
    # within-replica cosines, cross-replica pairs collapse -> linear)
    "dedup_provenance_rollup",
]
LINEAR_RATIO_CEILING = 3.0  # x replicas (see report: ratio_per_replica)

#: Sub-linear per-replica ratios (<1.0) are EXPECTED on local[32] at this
#: corpus size, not an anomaly: sf0.1 runs leave most of the 32 cores idle
#: (shuffle partitions carry a few thousand rows; fixed per-stage costs —
#: task scheduling, codegen dispatch, exchange setup — dominate), so the
#: 10x corpus raises per-core utilization and throughput/row. The r5
#: outlier ngram_jaccard_dups (0.56x/replica) is exactly this: its small
#: run spends most wall-clock in the fixed-cost shingle/groupBy stage
#: pipeline, which amortizes at 10x. The failure mode this smoke screens
#: for is per-row cost RISING with scale (ratio_per_replica >> 1).
SUBLINEAR_NOTE = (
    "ratio_per_replica < 1 means per-row cost FELL at 10x (fixed "
    "per-stage overheads amortized across fuller tasks on local[32]); "
    "the screened failure mode is per-row cost rising (>> 1)."
)


def _semdedup_scaled(spark, sf_dir: str, n_clusters: int):
    """semdedup_prune per its scale contract: n_clusters grows with the
    corpus so cluster populations (and the within-cluster quadratic)
    stay constant. The registry query fixes k=8 for the sf-pinned oracle
    corpus; the smoke exercises the documented 100TB posture."""
    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.operators import similarity

    return similarity.semdedup_prune(
        load_table(spark, sf_dir, "embeddings"), n_clusters=n_clusters
    )


#: name -> fn(spark, sf_dir, is_big) for ops whose scale contract requires
#: a corpus-size-dependent parameterization.
SPECIAL_QUERIES = {
    "semdedup_prune": lambda spark, sf_dir, is_big, replicas: (
        _semdedup_scaled(spark, sf_dir, 8 * (replicas if is_big else 1))
    ),
}


def _sign_flip(replica: int):
    """Two-arg (element, index) lambda for F.transform: deterministic ±1
    per (replica, dimension) — the diagonal orthogonal map."""

    def inner(x, pos):
        sign = F.when(
            F.pmod(F.xxhash64(F.lit(replica), pos), F.lit(2)) == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0))
        return (x * sign).cast("float")

    return inner


def build_big(spark, small_dir: str, big_dir: str, replicas: int) -> None:
    os.makedirs(big_dir, exist_ok=True)
    for t in COPY_TABLES:
        df = spark.read.parquet(f"{small_dir}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{big_dir}/{t}.parquet")
    for t, keys in SHIFT_COLS.items():
        df = spark.read.parquet(f"{small_dir}/{t}.parquet")
        parts = []
        for i in range(replicas):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * KEY_OFFSET))
            if t == "documents" and i > 0:
                # word-suffix the replica so it shares no n-grams/terms
                # with any other replica (dup output stays linear)
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(str(i))),
                        ),
                        " ",
                    ),
                )
            if t == "embeddings" and i > 0:
                # per-replica diagonal orthogonal map (deterministic ±1
                # per dimension): within-replica cosines exactly
                # preserved, cross-replica cosines collapse toward 0 —
                # the embedding analogue of the word-suffix trick, so
                # semantic near-dup pair counts stay linear in replicas
                rep = rep.withColumn(
                    "embedding", F.transform(F.col("embedding"), _sign_flip(i))
                )
            parts.append(rep)
        out = parts[0]
        for rep in parts[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(f"{big_dir}/{t}.parquet")


def time_build(build, spark) -> float:
    # Drop cross-query memos (pair tables, models) so every timed run pays
    # its full build — a memo hit on one side would fake a superlinear (or
    # sublinear) ratio.
    from snowflake_to_bq_pipeline_spark.registry import clear_model_caches

    clear_model_caches()
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--out", default="SCALE_SMOKE.json")
    ap.add_argument(
        "--big-dir", default="/tmp/scale_smoke_big", help="scratch dir"
    )
    args = ap.parse_args()

    spark = get_spark(app_name="scale-smoke")
    print(f"building ~{args.replicas}x corpus under {args.big_dir} ...")
    build_big(spark, SMALL_SF_DIR, args.big_dir, args.replicas)

    report: dict[str, dict] = {}
    failed = []
    for name in SMOKE_QUERIES + sorted(SPECIAL_QUERIES):
        if name in SPECIAL_QUERIES:
            special = SPECIAL_QUERIES[name]

            def small_build(_s=special):
                return _s(spark, SMALL_SF_DIR, False, args.replicas)

            def big_build(_s=special):
                return _s(spark, args.big_dir, True, args.replicas)

        else:

            def small_build(_n=name):
                return QUERIES[_n](spark, SMALL_SF_DIR)

            def big_build(_n=name):
                return QUERIES[_n](spark, args.big_dir)

        # warm codegen/page cache on the small corpus, then time both
        time_build(small_build, spark)
        small_s = time_build(small_build, spark)
        big_s = time_build(big_build, spark)
        ratio = big_s / max(small_s, 1e-6)
        per_rep = ratio / args.replicas
        report[name] = {
            "small_s": round(small_s, 2),
            "big_s": round(big_s, 2),
            "ratio": round(ratio, 2),
            "ratio_per_replica": round(per_rep, 2),
        }
        flag = ""
        if per_rep > LINEAR_RATIO_CEILING:
            failed.append(name)
            flag = "  <-- SUPERLINEAR"
        print(
            f"{name:32s} small {small_s:6.2f}s  big {big_s:7.2f}s "
            f"ratio {ratio:6.2f} ({per_rep:4.2f}x/replica){flag}"
        )

    # --- hot-corpus (stop-phrase) guarded growth curve -----------------
    # The skew smoke's lexical_guard_crossover proves naive-vs-guarded at
    # 1x/3x; this section extends the GUARDED curve to the full replica
    # count (naive would be ~(replicas)^2 on the hot bucket — ~100x — and
    # is exactly what the guard exists to avoid, so it is not run here).
    # Same construction: shingle-disjoint word-suffixed replicas that all
    # share ONE boilerplate stop phrase on half their docs, so the hot
    # shingle's df grows with the corpus while true dup output stays
    # linear. Within the per-replica ceiling = the df-cap guard holds the
    # lexical family ~linear where the unguarded plan compounds.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from skew_smoke import _replicated_hot_docs

    from snowflake_to_bq_pipeline_spark.operators import neardup

    hot_ops = {
        "ngram_jaccard_dups_hot_corpus": (
            lambda d: neardup.ngram_jaccard_pairs(d, 0.6)
        ),
        "ngram_containment_dups_hot_corpus": (
            lambda d: neardup.ngram_containment_pairs(d, 0.6)
        ),
    }
    for name, op in hot_ops.items():
        small_docs = _replicated_hot_docs(spark, SMALL_SF_DIR, 1)
        big_docs = _replicated_hot_docs(spark, SMALL_SF_DIR, args.replicas)
        time_build(lambda: op(small_docs), spark)  # warm
        small_s = time_build(lambda: op(small_docs), spark)
        big_s = time_build(lambda: op(big_docs), spark)
        ratio = big_s / max(small_s, 1e-6)
        per_rep = ratio / args.replicas
        report[name] = {
            "small_s": round(small_s, 2),
            "big_s": round(big_s, 2),
            "ratio": round(ratio, 2),
            "ratio_per_replica": round(per_rep, 2),
        }
        flag = ""
        if per_rep > LINEAR_RATIO_CEILING:
            failed.append(name)
            flag = "  <-- SUPERLINEAR"
        print(
            f"{name:32s} small {small_s:6.2f}s  big {big_s:7.2f}s "
            f"ratio {ratio:6.2f} ({per_rep:4.2f}x/replica){flag}"
        )

    payload = {
        "replicas": args.replicas,
        "small_sf_dir": SMALL_SF_DIR,
        "hot_corpus_note": (
            "*_hot_corpus rows time the GUARDED lexical ops on the "
            "stop-phrase corpus (one shingle's df grows with the corpus); "
            "the unguarded plan's hot bucket grows ~replicas^2 and is "
            "benched at 1x/3x in SKEW_SMOKE's lexical_guard_crossover"
        ),
        "ceiling_per_replica": LINEAR_RATIO_CEILING,
        "sublinear_note": SUBLINEAR_NOTE,
        "semdedup_note": (
            "semdedup_prune timed per its scale contract: n_clusters "
            "scales with the corpus (8 small, 8*replicas big) so cluster "
            "populations stay constant"
        ),
        "queries": report,
        "superlinear": failed,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({"superlinear": failed, "out": args.out}))
    shutil.rmtree(args.big_dir, ignore_errors=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
