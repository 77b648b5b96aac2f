"""Registry core: the @query registration decorator and the memo
infrastructure shared by every section module."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


QUERIES: dict[str, QueryFn] = {}


ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` marks a rows-only (non-SQL) op."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _corpus_fingerprint(sf_dir: str, *tables: str) -> str:
    """Snapshot fingerprint of the given tables' parquet files (path, size,
    mtime).  The cross-query model/intermediate memos below key on
    ``(sf_dir, fingerprint)`` instead of the path alone, so a dataset
    REWRITTEN at the same path misses the cache and recomputes rather than
    silently serving stale pairs/models for the life of the process.
    Cost: a handful of ``os.stat`` calls per lookup — no data is read."""
    import hashlib
    import os

    h = hashlib.md5()
    for table in tables:
        p = os.path.join(sf_dir, f"{table}.parquet")
        paths = []
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                paths.extend(os.path.join(root, f) for f in files)
        elif os.path.exists(p):
            paths = [p]
        for fp in sorted(paths):
            st = os.stat(fp)
            h.update(f"{fp}|{st.st_size}|{st.st_mtime_ns};".encode())
    return h.hexdigest()


class _ModelMemo:
    """LRU-bounded memo for driver-resident trained model state (collected
    centroid/merge rows — O(model), never O(corpus)).

    Keys are ``(sf_dir, fingerprint, *params)``. ``put`` first drops
    entries for the same ``sf_dir`` whose fingerprint is superseded (the
    single-live-snapshot lifecycle the DataFrame pair-table memos use),
    then evicts least-recently-used entries beyond ``maxsize`` so a
    long-lived session cycling many corpora stays bounded.
    ``clear_model_caches()`` remains the manual hard-reset hook."""

    def __init__(self, maxsize: int = 8) -> None:
        from collections import OrderedDict

        self._d: "OrderedDict[tuple, object]" = OrderedDict()
        self.maxsize = maxsize

    def get(self, key: tuple):
        v = self._d.get(key)
        if v is not None:
            self._d.move_to_end(key)
        return v

    def put(self, key: tuple, value) -> None:
        for k in [k for k in self._d if k[0] == key[0] and k[1] != key[1]]:
            del self._d[k]
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.maxsize:
            self._d.popitem(last=False)

    def clear(self) -> None:
        self._d.clear()

    def __len__(self) -> int:
        return len(self._d)

