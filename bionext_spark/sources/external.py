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
            # concurrent pipelines sharing a memo_dir can append overlapping
            # keys; dedupe on read so hit joins stay 1 row per key (values
            # for a key are identical — adapters are memo-pure by contract)
            return self.spark.read.parquet(self.memo_dir).dropDuplicates(["key"])
        return self.spark.createDataFrame([], "key string, value string")

    def lookup(self, keys: DataFrame) -> DataFrame:
        """keys(key [, context cols…]) → (key, value); value NULL when
        unknown and no adapter is configured.

        Extra columns on ``keys`` are CONTEXT: they ride to the adapter
        (``lookup_batch_ctx(keys, {col: values})`` when the adapter
        implements it — e.g. the K5 few-shot prompt examples selected by
        the dataflow, reference seq_variant.py:239-268) but are NOT part
        of the memo key, exactly like the reference's diskcache memoizing
        llm_predict on (text, gene) while the prompt carries the examples."""
        ctx_cols = [c for c in keys.columns if c != "key"]
        keys = keys.dropDuplicates(["key"])
        memo = self._memo()
        hits = keys.select("key").join(memo, "key")
        misses = keys.join(memo, "key", "left_anti")
        if self.adapter is None:
            return hits.unionByName(
                misses.select("key").withColumn("value", F.lit(None).cast("string"))
            )

        adapter = self.adapter

        def call(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    vals = []
                elif ctx_cols and hasattr(adapter, "lookup_batch_ctx"):
                    vals = adapter.lookup_batch_ctx(
                        list(pdf["key"]), {c: list(pdf[c]) for c in ctx_cols}
                    )
                else:
                    vals = adapter.lookup_batch(list(pdf["key"]))
                yield pdf[["key"]].assign(value=pd.Series(vals, index=pdf.index, dtype=object))

        # Materialize the fetch COMPLETELY before branching — and with
        # localCheckpoint, not cache: a cached block can be evicted under
        # memory pressure, after which the append or the returned union
        # would re-execute the kernel and call the external adapter twice
        # for the same keys (and diverge if the adapter is
        # non-deterministic). localCheckpoint truncates the lineage, so
        # downstream actions can only replay the stored rows.
        fetched = misses.mapInPandas(call, "key string, value string").localCheckpoint()
        new = fetched.filter(F.col("value").isNotNull())
        if not new.isEmpty():
            # re-read the memo at append time and anti-join: narrows the
            # window in which a concurrent pipeline's append duplicates
            # keys (dedup-on-read in _memo() covers whatever remains)
            new = new.join(self._memo().select("key"), "key", "left_anti")
            new.write.mode("append").parquet(self.memo_dir)
        return hits.unionByName(fetched)
