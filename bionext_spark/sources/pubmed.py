"""S2 — PubMed REST source (reference src/utils.py:10-25).

The reference fetches one article per PMID from the public BioC endpoint

    https://www.ncbi.nlm.nih.gov/research/bionlp/RESTful/pubmed.cgi/
        BioC_json/{pmid}/unicode

and writes ``pubmed_{pmid}.json`` into a folder that doubles as the
cache. The engine keeps that contract (same URL, same file layout, fetch
skipped when the file exists) and reads the results through the standard
BioC ingestion path, so a PMID list is just another way to produce the
transcripts table.

Two fetch shapes:
- ``fetch_pubmed`` — driver-side, for the reference's interactive use
  (one or a few PMIDs). The public endpoint is rate-limited; a driver
  loop is the honest shape at that size.
- ``fetch_pubmed_distributed`` — mapInPandas over a PMID DataFrame for
  large lists: each partition opens its own HTTP transport, writes its
  files to the shared cache dir, and returns (pmid, path, ok). Fetching
  stays I/O-bound and embarrassingly parallel; downstream parsing is the
  normal distributed BioC scan.

``get`` is injectable (default: requests.get, import-gated) so the full
code path runs in tests against a fake transport — this sandbox has no
network, like a locked-down cluster edge node.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

URL = "https://www.ncbi.nlm.nih.gov/research/bionlp/RESTful/pubmed.cgi/BioC_json/{pmid}/unicode"


def _default_get() -> Callable:
    try:
        import requests
    except ImportError as e:  # pragma: no cover - requests ships widely
        raise NotImplementedError(
            "PubMed fetching needs the 'requests' package (or pass get=...)"
        ) from e
    return requests.get


def _fetch_one(pmid: str, folder: str, get: Callable) -> str:
    """One PMID → cached BioC file path (reference utils.py:10-25: takes
    response.json()[0], writes pubmed_{pmid}.json, raises on non-200)."""
    path = os.path.join(folder, f"pubmed_{pmid}.json")
    if os.path.exists(path):  # the folder IS the cache
        return path
    resp = get(URL.format(pmid=pmid))
    status = getattr(resp, "status_code", None)
    if status != 200:
        raise RuntimeError(f"Failed to fetch article (PMID: {pmid}) status:{status}")
    payload = resp.json()
    doc = payload[0] if isinstance(payload, list) else payload
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=2)
    os.replace(tmp, path)  # atomic: concurrent fetchers can't interleave
    return path


def fetch_pubmed(pmids: Sequence[str], folder: str = "testset",
                 get: Callable | None = None) -> list[str]:
    """Driver-side fetch-with-cache; returns one BioC file path per PMID."""
    os.makedirs(folder, exist_ok=True)
    get = get or _default_get()
    return [_fetch_one(str(p), folder, get) for p in pmids]


def fetch_pubmed_distributed(
    spark: SparkSession, pmids: DataFrame, folder: str,
    get_factory: Callable[[], Callable] | None = None,
) -> DataFrame:
    """Partition-parallel fetch for large PMID lists: ``pmids`` carries a
    'pmid' string column; returns (pmid, path, ok, error). ``get_factory``
    builds the HTTP getter ON THE WORKER (one transport per partition —
    a driver-created session would not pickle); default builds
    requests.get there. The shared ``folder`` must be visible to all
    workers (local mode: any dir; cluster: a shared filesystem)."""
    import pandas as pd

    os.makedirs(folder, exist_ok=True)
    factory = get_factory or _default_get

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        get = factory()
        for pdf in batches:
            paths, oks, errs = [], [], []
            for pmid in pdf["pmid"].astype(str):
                try:
                    paths.append(_fetch_one(pmid, folder, get))
                    oks.append(True)
                    errs.append(None)
                except Exception as e:
                    paths.append(None)
                    oks.append(False)
                    errs.append(str(e)[:200])
            yield pd.DataFrame(
                {"pmid": pdf["pmid"].astype(str), "path": paths, "ok": oks, "error": errs}
            )

    return pmids.select("pmid").mapInPandas(
        fetch, "pmid string, path string, ok boolean, error string"
    )


def read_pubmed(spark: SparkSession, pmids: Sequence[str], folder: str = "testset",
                get: Callable | None = None) -> DataFrame:
    """PMIDs → the engine's transcripts table: fetch-with-cache, then the
    standard distributed BioC ingestion over the cached files."""
    from bionext_spark.sources.bioc import read_bioc_as_transcripts

    paths = fetch_pubmed(pmids, folder, get)
    # each cached file is one BioC collection (the endpoint returns a list
    # of collections; the reference keeps element [0]); the multiLine json
    # reader takes the whole path list in ONE scan — no per-file plans
    return read_bioc_as_transcripts(spark, paths)
