"""TableIO snapshot semantics: atomic commit, append, idempotent publish,
snapshot time-travel, lock mutex, tracking rotation."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from kg_obo_spark.plans.tracking import TrackingStore
from kg_obo_spark.sources.tableio import Lock, LockHeldError, Table


def test_commit_read_overwrite(spark, tmp_path):
    t = Table(str(tmp_path / "t"))
    assert not t.exists()
    df1 = spark.range(5)
    s1 = t.commit(df1, meta={"k": "v"})
    assert t.read(spark).count() == 5
    df2 = spark.range(3)
    s2 = t.commit(df2)
    assert t.read(spark).count() == 3
    assert s2.parent_id == s1.snapshot_id
    # time travel to the first snapshot
    assert t.read(spark, snapshot_id=s1.snapshot_id).count() == 5


def test_append_mode(spark, tmp_path):
    t = Table(str(tmp_path / "a"))
    t.commit(spark.range(4), mode="append")
    snap = t.commit(spark.range(6), mode="append")
    assert snap.row_count == 10
    assert t.read(spark).count() == 10


def test_idempotent_publish(spark, tmp_path):
    t = Table(str(tmp_path / "i"))
    s1 = t.commit(spark.range(2), if_absent_tag="v1")
    s2 = t.commit(spark.range(99), if_absent_tag="v1")  # skipped
    assert s1 is not None and s2 is None
    assert t.read(spark).count() == 2


def test_partitioned_commit_prunes(spark, tmp_path):
    t = Table(str(tmp_path / "p"))
    df = spark.range(100).withColumn("bucket", (F.col("id") % 4).cast("int"))
    t.commit(df, partition_by=["bucket"])
    q = t.read(spark).filter(F.col("bucket") == 2)
    assert q.count() == 25
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition filter handled at planning time — not a data filter
    assert "PartitionFilters: [isnotnull(bucket" in plan or "PartitionFilters: [(bucket" in plan


def test_lock_mutex(tmp_path):
    lock = Lock(str(tmp_path / "L"))
    with lock:
        with pytest.raises(LockHeldError):
            Lock(str(tmp_path / "L")).acquire()
    assert not lock.held()


def test_tracking_rotation(spark, tmp_path):
    store = TrackingStore(str(tmp_path / "tr"))
    store.track_version(spark, "bfo", "iri-v1", "v1")
    store.track_version(spark, "bfo", "iri-v2", "v2")
    store.track_version(spark, "go", "iri-g1", "g1")
    row = store.read_tracking(spark).filter(F.col("source") == "bfo").first()
    assert row["current_version"] == "v2"
    assert [(a["iri"], a["version"]) for a in row["archive"]] == [("iri-v1", "v1")]
    assert store.transformed_exists(spark, "bfo", "v1")  # archived counts
    assert store.transformed_exists(spark, "bfo", "v2")
    assert not store.transformed_exists(spark, "bfo", "v3")
    # same-version re-track does not duplicate into archive
    store.track_version(spark, "bfo", "iri-v2", "v2")
    row = store.read_tracking(spark).filter(F.col("source") == "bfo").first()
    assert len(row["archive"]) == 1
