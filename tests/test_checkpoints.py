"""Snapshot commits, resume-from-checkpoint idempotence, lineage rows."""

import pytest

from fonduer_spark.checkpoints import SnapshotTable
from fonduer_spark.pipeline import run_checkpointed

SF = "/root/testdata/sf0.001"


def test_snapshot_commit_and_read(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "demo")
    df = spark.range(10).toDF("x")
    s1 = t.commit(df)
    assert s1.snapshot_id == 1 and s1.n_rows == 10
    s2 = t.commit(spark.range(5).toDF("x"))
    assert s2.snapshot_id == 2
    assert t.read(spark).count() == 5            # latest
    assert t.read(spark, 1).count() == 10        # time travel
    assert t.latest().snapshot_id == 2


def test_rollback_and_expire(spark, tmp_path):
    """Iceberg maintenance semantics: rollback re-points current at an
    earlier snapshot without destroying history; expire_snapshots drops
    old entries + data but never a directory an alive (rolled-back)
    snapshot still references."""
    import os

    t = SnapshotTable(str(tmp_path), "demo")
    t.commit(spark.range(10).toDF("x"))
    t.commit(spark.range(5).toDF("x"))
    rb = t.rollback(1)
    assert rb.snapshot_id == 3 and rb.n_rows == 10
    assert t.read(spark).count() == 10           # current = old data again
    assert t.read(spark, 2).count() == 5         # history intact
    with pytest.raises(ValueError, match="not in"):
        t.rollback(99)

    # expire keeping only the rollback snapshot: snapshot 2's dir goes,
    # snapshot 1's dir SURVIVES because alive snapshot 3 points at it
    dropped = t.expire_snapshots(keep_last=1)
    assert dropped == [1, 2]
    assert t.latest().snapshot_id == 3
    assert t.read(spark).count() == 10
    assert os.path.isdir(os.path.join(str(tmp_path), "demo", "snapshot=1"))
    assert not os.path.isdir(
        os.path.join(str(tmp_path), "demo", "snapshot=2"))
    assert t.expire_snapshots(keep_last=5) == []  # nothing to drop
    with pytest.raises(ValueError, match="keep_last"):
        t.expire_snapshots(keep_last=0)


def test_signature_scoped_latest(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "sig")
    t.commit(spark.range(3).toDF("x"), signature="runA")
    t.commit(spark.range(7).toDF("x"), signature="runB")
    assert t.latest("runA").n_rows == 3
    assert t.latest("runB").n_rows == 7
    assert t.latest("runC") is None


def test_pipeline_resume_idempotent(spark, tmp_path):
    root = str(tmp_path / "pipe")
    out1, cp1 = run_checkpointed(spark, SF, root, max_docs=15)
    t1 = sorted((r.subj, r.obj) for r in out1["triples"].collect())
    kinds1 = {e[1]: e[0] for e in cp1.events}
    assert set(kinds1.values()) == {"compute"}

    # second run with the same signature resumes every stage from snapshots
    out2, cp2 = run_checkpointed(spark, SF, root, max_docs=15)
    t2 = sorted((r.subj, r.obj) for r in out2["triples"].collect())
    kinds2 = {e[1]: e[0] for e in cp2.events}
    assert set(kinds2.values()) == {"resume"}
    assert t1 == t2

    # lineage table committed
    cks = SnapshotTable(root, "_checkpoints").read(spark)
    assert {"kind", "stage", "snapshot_id", "n_rows", "wall_ms"} <= set(cks.columns)
    assert cks.count() >= 6


def test_partial_failure_resume(spark, tmp_path):
    """Kill mid-pipeline -> rerun resumes committed stages, recomputes rest."""
    root = str(tmp_path / "partial")
    from fonduer_spark.checkpoints import CheckpointedPipeline

    cp = CheckpointedPipeline(spark, root, "sig1")
    cp.stage("s1", lambda: spark.range(4).toDF("x"))
    with pytest.raises(RuntimeError):
        def boom():
            raise RuntimeError("killed")
        cp.stage("s2", boom)

    cp2 = CheckpointedPipeline(spark, root, "sig1")
    cp2.stage("s1", lambda: spark.range(999).toDF("x"))  # must NOT recompute
    df2 = cp2.stage("s2", lambda: spark.range(6).toDF("x"))
    assert cp2.events[0][0] == "resume"
    assert cp2.events[1][0] == "compute"
    assert df2.count() == 6
    assert cp2.stage("s1", lambda: None).count() == 4


def test_keyed_merge_incremental(spark, tmp_path):
    """Keyed MERGE semantics (reference featurizer.py:65-91 update() /
    utils_udf.py:52-122 upsert): one new document arrives -> only its rows
    are computed and merged by key; the result is row-identical to a full
    rerun over the grown corpus. Same-key rows replace, not duplicate."""
    from pyspark.sql import functions as F

    from fonduer_spark.corpus import load_docs
    from fonduer_spark.mentions_op import extract_mentions_fused
    from fonduer_spark.pipeline import default_mention_specs

    specs = default_mention_specs()
    t = SnapshotTable(str(tmp_path), "mentions")
    # initial commit: docs 0-2
    m3 = extract_mentions_fused(load_docs(spark, SF, max_docs=3), specs)
    t.commit(m3)
    # doc 3 arrives: compute ONLY its mentions, merge on stable_id
    new = extract_mentions_fused(
        load_docs(spark, SF, max_docs=4).where(F.col("doc_id") == 3), specs)
    t.merge(new, ["stable_id"])
    merged = t.read(spark)
    full = extract_mentions_fused(load_docs(spark, SF, max_docs=4), specs)
    assert merged.count() == full.count()
    assert {r.stable_id for r in merged.select("stable_id").collect()} \
        == {r.stable_id for r in full.select("stable_id").collect()}
    # re-merging the same keys replaces rows instead of duplicating them
    t.merge(new, ["stable_id"])
    assert t.read(spark).count() == full.count()
    # and the latest snapshot is a new id (copy-on-write, time travel kept)
    assert t.latest().snapshot_id == 3
    assert t.read(spark, 1).count() == m3.count()


def test_upsert_stage_incremental_pipeline(spark, tmp_path):
    """CheckpointedPipeline.upsert_stage: a stage committed for docs 0-2
    incrementally absorbs doc 3's rows (only the new doc computed) and the
    lineage records the upsert event."""
    from pyspark.sql import functions as F

    from fonduer_spark.checkpoints import CheckpointedPipeline
    from fonduer_spark.corpus import load_docs
    from fonduer_spark.mentions_op import extract_mentions_fused
    from fonduer_spark.pipeline import default_mention_specs

    specs = default_mention_specs()
    cp = CheckpointedPipeline(spark, str(tmp_path), "sig1")
    cp.stage("mentions", lambda: extract_mentions_fused(
        load_docs(spark, SF, max_docs=3), specs))
    merged = cp.upsert_stage(
        "mentions",
        lambda: extract_mentions_fused(
            load_docs(spark, SF, max_docs=4).where(F.col("doc_id") == 3),
            specs),
        keys=["stable_id"],
    )
    full = extract_mentions_fused(load_docs(spark, SF, max_docs=4), specs)
    assert merged.count() == full.count()
    kinds = [e[0] for e in cp.events]
    assert kinds == ["compute", "upsert"]


def test_manifest_per_partition_lineage(spark, tmp_path):
    """north_rule 'per-partition lineage + metrics': every committed
    snapshot's manifest records a row count per committed FILE (the
    physical partition unit), summing to the snapshot total."""
    import json
    import os

    from pyspark.sql import functions as F

    from fonduer_spark.checkpoints import SnapshotTable

    t = SnapshotTable(str(tmp_path), "lineage")
    df = spark.range(1000).repartition(4).select(
        F.col("id").cast("long").alias("id"))
    snap = t.commit(df)
    man = json.load(open(os.path.join(str(tmp_path), "lineage",
                                      "_manifest.json")))
    rec = [s for s in man["snapshots"] if s["snapshot_id"] == snap.snapshot_id][0]
    assert len(rec["files"]) == 4  # one entry per committed partition file
    assert sum(rec["files"].values()) == rec["n_rows"] == 1000
    assert all(f.endswith(".parquet") for f in rec["files"])
