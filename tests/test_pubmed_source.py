"""S2 — PubMed REST source, exercised against a fake HTTP transport
(this sandbox has no network, like a locked-down cluster edge node):
URL shape, the [0]-collection extraction, the folder-as-cache contract,
the non-200 error, and the distributed fetch returning per-PMID status.
"""

from __future__ import annotations

import json
import os

import pytest

from bionext_spark.sources.pubmed import (
    URL,
    fetch_pubmed,
    fetch_pubmed_distributed,
    read_pubmed,
)


def _collection(pmid: str) -> dict:
    return {
        "documents": [
            {
                "id": pmid,
                "passages": [
                    {"offset": 0, "infons": {"type": "title"},
                     "text": f"Title {pmid}", "annotations": []},
                    {"offset": 12, "infons": {"type": "abstract"},
                     "text": f"Abstract {pmid}", "annotations": []},
                ],
            }
        ]
    }


class FakeResponse:
    def __init__(self, status, payload):
        self.status_code = status
        self._payload = payload

    def json(self):
        return self._payload


def make_fake_get(calls):
    def get(url):
        calls.append(url)
        pmid = url.rsplit("/", 2)[-2]
        if pmid == "0":
            return FakeResponse(404, None)
        # the endpoint returns a LIST of collections; the reference keeps
        # element [0] (utils.py:21)
        return FakeResponse(200, [_collection(pmid)])

    return get


def test_fetch_url_shape_and_cache(tmp_path):
    calls: list[str] = []
    folder = str(tmp_path / "testset")
    paths = fetch_pubmed(["123", "456"], folder, get=make_fake_get(calls))
    assert calls == [URL.format(pmid="123"), URL.format(pmid="456")]
    assert [os.path.basename(p) for p in paths] == ["pubmed_123.json", "pubmed_456.json"]
    with open(paths[0]) as f:
        assert json.load(f)["documents"][0]["id"] == "123"
    # second fetch: the folder IS the cache — no HTTP calls
    fetch_pubmed(["123", "456"], folder, get=make_fake_get(calls := []))
    assert calls == []


def test_fetch_raises_on_http_error(tmp_path):
    with pytest.raises(RuntimeError, match=r"PMID: 0.*status:404"):
        fetch_pubmed(["0"], str(tmp_path), get=make_fake_get([]))


def test_read_pubmed_produces_transcripts(spark, tmp_path):
    folder = str(tmp_path / "testset")
    df = read_pubmed(spark, ["111", "222"], folder, get=make_fake_get([]))
    rows = {(r["conv_id"], r["turn_idx"]): (r["role"], r["text"]) for r in df.collect()}
    assert rows[("111", 0)] == ("title", "Title 111")
    assert rows[("222", 1)] == ("abstract", "Abstract 222")
    assert len(rows) == 4  # 2 docs × 2 passages, one scan over both files


def test_distributed_fetch_statuses(spark, tmp_path):
    folder = str(tmp_path / "dist")
    pmids = spark.createDataFrame([("7",), ("8",), ("0",)], "pmid string")

    # self-contained factory: workers can't import this test module, so
    # the fake transport is defined inline and cloudpickled by value
    def factory():
        class R:
            def __init__(self, status, payload):
                self.status_code, self._p = status, payload

            def json(self):
                return self._p

        def get(url):
            pmid = url.rsplit("/", 2)[-2]
            if pmid == "0":
                return R(404, None)
            return R(200, [{"documents": [{"id": pmid, "passages": []}]}])

        return get

    out = {r["pmid"]: r for r in
           fetch_pubmed_distributed(spark, pmids, folder, get_factory=factory).collect()}
    assert out["7"]["ok"] and out["7"]["path"].endswith("pubmed_7.json")
    assert os.path.exists(out["8"]["path"])
    assert not out["0"]["ok"] and "status:404" in out["0"]["error"]
    assert out["0"]["path"] is None
