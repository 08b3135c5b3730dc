"""StageCatalog: snapshot manifests, lineage, idempotent resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bionext_spark.sources.catalog import StageCatalog


def test_write_and_manifest(spark, tmp_path):
    cat = StageCatalog(spark, str(tmp_path))
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out, m = cat.write("stage_a", df, inputs=["input"], config_fingerprint="cfg1")
    assert m.row_count == 100
    assert sum(m.partition_counts.values()) == 100
    assert out.count() == 100


def test_resume_skips_recompute(spark, tmp_path):
    cat = StageCatalog(spark, str(tmp_path))
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return spark.range(10)

    df1, m1 = cat.run_stage("s", compute, ["in"], "cfg")
    df2, m2 = cat.run_stage("s", compute, ["in"], "cfg")
    assert calls["n"] == 1  # second run resumed from the committed snapshot
    assert m1.snapshot_id == m2.snapshot_id
    assert sorted(r["id"] for r in df2.collect()) == list(range(10))


def test_changed_inputs_recompute(spark, tmp_path):
    cat = StageCatalog(spark, str(tmp_path))
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return spark.range(5)

    _, m1 = cat.run_stage("s", compute, ["in1"], "cfg")
    _, m2 = cat.run_stage("s", compute, ["in2"], "cfg")
    assert calls["n"] == 2
    assert m1.snapshot_id != m2.snapshot_id


def test_pipeline_end_to_end_resume(spark, transcripts, tmp_path):
    from bionext_spark import pipeline as P

    r1 = P.run(spark, transcripts, str(tmp_path))
    t1 = sorted(tuple(r) for r in r1.triples.collect())
    # second run: every stage resumes from snapshots, outputs identical
    r2 = P.run(spark, transcripts, str(tmp_path))
    t2 = sorted(tuple(r) for r in r2.triples.collect())
    assert t1 == t2
    assert len(t1) > 10
    assert r1.manifests["triples"].snapshot_id == r2.manifests["triples"].snapshot_id
    # lineage recorded for every stage
    for name, m in r1.manifests.items():
        assert m.row_count >= 0 and isinstance(m.partition_counts, dict), name


def test_iceberg_path_gated(spark, tmp_path):
    """Iceberg code path: auto-detect is OFF in this image (no runtime
    jar/catalog); the real-catalog write/read is exercised only when the
    jar is present (skipped here, runs on a cluster)."""
    import pytest

    from bionext_spark.sources.catalog import (
        StageCatalog,
        iceberg_available,
        iceberg_catalog_name,
    )

    cat = StageCatalog(spark, str(tmp_path / "ck"))
    assert cat.use_iceberg is False  # parquet fallback in this image
    assert cat._iceberg_ident("mentions", "abc") .endswith(".bionext.mentions_abc")
    if not (iceberg_available(spark) and iceberg_catalog_name(spark)):
        pytest.skip("iceberg runtime jar/catalog not configured in this image")
    ice = StageCatalog(spark, str(tmp_path / "ck2"))
    df, m = ice.run_stage("t", lambda: spark.range(5).toDF("id"), ["in"], "fp")
    assert m.iceberg_snapshot_id is not None and df.count() == 5


def test_resume_routes_by_committed_backend(spark, tmp_path):
    """A stage committed under parquet must re-read as parquet even when a
    LATER session believes it has an Iceberg catalog (manifest records the
    backend; read() routes by it, not by the session's use_iceberg)."""
    from bionext_spark.sources.catalog import StageCatalog

    cat = StageCatalog(spark, str(tmp_path / "ck"))
    _, m = cat.run_stage("s", lambda: spark.range(4).toDF("id"), ["in"], "fp")
    assert m.backend == "parquet" and m.iceberg_ident is None

    cat2 = StageCatalog(spark, str(tmp_path / "ck"))
    # simulate an environment change: this session auto-detects iceberg
    cat2.use_iceberg, cat2.catalog = True, "ice"
    assert cat2.is_committed("s", m.snapshot_id)
    df, m2 = cat2.run_stage("s", lambda: (_ for _ in ()).throw(AssertionError("recompute")), ["in"], "fp")
    assert df.count() == 4 and m2.backend == "parquet"


def test_legacy_iceberg_manifest_routes_to_iceberg(spark, tmp_path):
    """Manifests written before the backend field default to 'parquet' on
    deserialize; an Iceberg commit is unambiguous from its snapshot id and
    must not be routed to a parquet path that was never written."""
    import json
    import os

    from bionext_spark.sources.catalog import StageCatalog

    cat = StageCatalog(spark, str(tmp_path / "ck"))
    _, m = cat.run_stage("s", lambda: spark.range(3).toDF("id"), ["in"], "fp")
    # simulate a legacy Iceberg manifest: strip the backend fields, set the
    # iceberg snapshot id
    mp = cat._manifest_path("s", m.snapshot_id)
    raw = json.load(open(mp))
    raw.pop("backend", None)
    raw.pop("iceberg_ident", None)
    raw["iceberg_snapshot_id"] = 12345
    json.dump(raw, open(mp, "w"))

    cat2 = StageCatalog(spark, str(tmp_path / "ck"))
    m2 = cat2.read_manifest("s", m.snapshot_id)
    assert m2.backend == "parquet"  # the stale deserialize default
    # read() must route to the ICEBERG path: with no catalog configured
    # here, that means a table-resolution error — NOT a successful read of
    # the parquet data dir (which exists in this fixture but would be
    # absent for a real legacy Iceberg commit)
    with pytest.raises(Exception) as ei:
        cat2.read("s", m.snapshot_id)
    # the error names the iceberg table ident's namespace — proof the read
    # attempted spark.read.table(<ident>), not the parquet data dir
    assert "bionext" in str(ei.value)


def test_minhash_durable_barrier_resume(spark, tmp_path):
    """dedup_minhash_lsh_durable cuts the per-doc digest table through the
    StageCatalog: a second run resumes the committed minhash_digests stage
    (same snapshot, no rewrite) and yields identical pairs; a changed
    corpus fingerprint recomputes under a new snapshot."""
    from bionext_spark.corpus_queries import dedup_minhash_lsh_durable

    sf = "/root/testdata/sf0.001"
    cat = StageCatalog(spark, str(tmp_path / "ck"))
    r1 = sorted(tuple(r) for r in dedup_minhash_lsh_durable(spark, sf, cat, "v1").collect())

    snap = StageCatalog.snapshot_id("minhash_digests", [f"documents:{sf}"], "v1")
    assert cat.is_committed("minhash_digests", snap)
    m1 = cat.read_manifest("minhash_digests", snap)
    assert m1.row_count > 0  # one digest row per document

    # second run resumes: committed_at unchanged proves no rewrite happened
    r2 = sorted(tuple(r) for r in dedup_minhash_lsh_durable(spark, sf, cat, "v1").collect())
    assert r2 == r1
    assert cat.read_manifest("minhash_digests", snap).committed_at == m1.committed_at

    # a new corpus version must NOT resume the stale digests
    dedup_minhash_lsh_durable(spark, sf, cat, "v2").collect()
    snap2 = StageCatalog.snapshot_id("minhash_digests", [f"documents:{sf}"], "v2")
    assert snap2 != snap and cat.is_committed("minhash_digests", snap2)
