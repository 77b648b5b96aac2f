"""BPE merge induction vs a pure-Python reference implementation."""

from __future__ import annotations

import re
from collections import Counter

from snowflake_to_bq_pipeline_spark.catalog import load_table
from snowflake_to_bq_pipeline_spark.operators import bpe


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    vocab = [(list(w), f) for w, f in word_freqs.items()]
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, f in vocab:
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] += f
        if not counts:
            break
        best_n = max(counts.values())
        if best_n < 2:
            break
        left, right = min(p for p, c in counts.items() if c == best_n)
        merges.append((rank, left, right, left + right, best_n))
        new_vocab = []
        for syms, f in vocab:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((out, f))
        vocab = new_vocab
    return merges


def test_bpe_merges_match_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    freqs: Counter = Counter()
    for t in texts:
        freqs.update(re.findall(bpe.WORD_RE, t.lower()))
    expected = _ref_bpe(dict(freqs), 10)
    got = [
        tuple(r)
        for r in bpe.bpe_merges(docs, n_merges=10)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected
    # Ranks are dense 1..n. (Counts need NOT be monotone: a merge can
    # create a new pair hotter than anything before it.)
    ranks = [g[0] for g in got]
    assert ranks == list(range(1, len(got) + 1))
