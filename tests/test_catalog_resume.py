"""StageCatalog: snapshot manifests, lineage, idempotent resume."""

from __future__ import annotations

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
