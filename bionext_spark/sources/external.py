"""External lookup adapters + persistent memo table (SURVEY.md S8/S9/S11).

The reference calls LitVar REST per (mention, gene) (seq_variant.py:122-129)
and optionally an LLM (OllamaAPICall.py), memoized on disk with diskcache
(seq_variant.py:19-21). The engine's form:

* an adapter interface (`lookup_batch`) — the network/LLM client lives
  behind it; the default is None = offline (the engine core makes no
  network calls, tests inject deterministic fakes);
* a **memo table**: a snapshotted (key, value) parquet table. Lookups
  left-join the memo; only misses reach the adapter (Arrow-batched,
  executor-side); new results append. Re-runs are idempotent and, with a
  warmed memo, fully offline-replayable — the distributed analog of the
  reference's diskcache.
"""

from __future__ import annotations

import os
from typing import Iterator, Protocol, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ExternalLookupAdapter(Protocol):
    def lookup_batch(self, keys: Sequence[str]) -> list[str | None]: ...


class MemoizedLookup:
    def __init__(self, spark: SparkSession, memo_dir: str, adapter: ExternalLookupAdapter | None = None):
        self.spark = spark
        self.memo_dir = memo_dir
        self.adapter = adapter

    def _memo(self) -> DataFrame:
        if os.path.exists(self.memo_dir):
            return self.spark.read.parquet(self.memo_dir)
        return self.spark.createDataFrame([], "key string, value string")

    def lookup(self, keys: DataFrame) -> DataFrame:
        """keys(key) → (key, value); value NULL when unknown and no
        adapter is configured."""
        keys = keys.select("key").distinct()
        memo = self._memo()
        hits = keys.join(memo, "key")
        misses = keys.join(memo, "key", "left_anti")
        if self.adapter is None:
            return hits.unionByName(misses.withColumn("value", F.lit(None).cast("string")))

        adapter = self.adapter

        def call(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vals = adapter.lookup_batch(list(pdf["key"])) if len(pdf) else []
                yield pdf.assign(value=pd.Series(vals, index=pdf.index, dtype=object))

        # Materialize the fetch COMPLETELY before branching: a lazily-cached
        # limit(1).count() only runs some partitions, so the later append +
        # returned union could re-execute the kernel and call the external
        # adapter twice for the same keys (and diverge if the adapter is
        # non-deterministic). One action over all partitions pins every row
        # in the cache first.
        fetched = misses.mapInPandas(call, "key string, value string").cache()
        fetched.count()
        new = fetched.filter(F.col("value").isNotNull())
        if not new.isEmpty():
            new.write.mode("append").parquet(self.memo_dir)
        return hits.unionByName(fetched)
