"""TableIO — atomic snapshot tables over Parquet directories ("Iceberg-lite").

The sandbox has no Iceberg runtime jar, so this seam supplies the semantics the
engine needs from a table format, with the same API shape an Iceberg catalog
would back in production (SURVEY §7.0):

- **atomic commit**: data is written to a staging directory, then a snapshot
  manifest JSON is atomically renamed into ``_snapshots/``; readers resolve the
  latest committed snapshot only. A crash mid-write leaves staging garbage but
  never a half-visible table (the reference gets this from "write then upload,
  verify names" — /root/reference/kg_obo/upload.py:94-149,432-445).
- **snapshot history**: every commit records parent snapshot id, row count, and
  user metadata — the lineage hook.
- **mutex lock**: ``O_CREAT|O_EXCL`` marker file, the analog of the reference's
  zero-byte S3 lock object (/root/reference/kg_obo/upload.py:38-91, checked
  before running at transform.py:765-784).
- **idempotent publish**: ``commit(..., if_absent=True)`` skips when a snapshot
  with the same user tag exists — upload.py:124-138's head_object-then-skip.

On a real cluster this module is replaced by an Iceberg catalog: commit ->
``writeTo(t).createOrReplace()``/append, lock -> optimistic commit conflict,
snapshots -> Iceberg metadata tables.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class LockHeldError(RuntimeError):
    pass


@dataclass
class Snapshot:
    snapshot_id: str
    parent_id: str | None
    data_dir: str
    row_count: int
    meta: dict
    sequence: int


class Table:
    """One logical table under a root directory."""

    def __init__(self, root: str):
        self.root = root
        self._snap_dir = os.path.join(root, "_snapshots")
        os.makedirs(self._snap_dir, exist_ok=True)

    # ----------------------------------------------------------- snapshots

    def snapshots(self) -> list[Snapshot]:
        snaps = []
        for fn in sorted(os.listdir(self._snap_dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self._snap_dir, fn)) as f:
                    d = json.load(f)
                snaps.append(Snapshot(**d))
        snaps.sort(key=lambda s: s.sequence)
        return snaps

    def latest(self) -> Snapshot | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def exists(self) -> bool:
        return self.latest() is not None

    # -------------------------------------------------------------- commit

    def commit(
        self,
        df: DataFrame,
        meta: dict | None = None,
        mode: str = "overwrite",
        if_absent_tag: str | None = None,
        partition_by: list[str] | None = None,
    ) -> Snapshot | None:
        """Write ``df`` as a new committed snapshot.

        mode='overwrite' replaces visible data; mode='append' unions with the
        current snapshot at read time (manifest lists both data dirs).
        ``if_absent_tag``: skip (return None) if any snapshot carries this tag —
        the idempotent-publish semantics.
        ``partition_by``: hive-style directory partitioning — readers filtering
        on those columns get partition pruning (the Iceberg partition-spec
        analog; see test_tableio.py::test_partitioned_commit_prunes)."""
        meta = dict(meta or {})
        prev = self.latest()
        if if_absent_tag is not None:
            for s in self.snapshots():
                if s.meta.get("tag") == if_absent_tag:
                    return None
            meta["tag"] = if_absent_tag
        if partition_by:
            meta["partition_by"] = partition_by
        snap_id = uuid.uuid4().hex[:16]
        data_dir = os.path.join(self.root, f"data-{snap_id}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        n = df.sparkSession.read.parquet(data_dir).count()
        meta["batch_rows"] = n
        dirs = [data_dir]
        total = n
        if mode == "append" and prev is not None:
            dirs = json.loads(prev.data_dir) + dirs
            total = prev.row_count + n
        snap = Snapshot(
            snapshot_id=snap_id,
            parent_id=prev.snapshot_id if prev else None,
            data_dir=json.dumps(dirs),
            row_count=total,
            meta=meta,
            sequence=(prev.sequence + 1) if prev else 0,
        )
        tmp = os.path.join(self._snap_dir, f".tmp-{snap_id}")
        with open(tmp, "w") as f:
            json.dump(snap.__dict__, f)
        # atomic rename = the commit point
        os.rename(tmp, os.path.join(self._snap_dir, f"{snap.sequence:012d}-{snap_id}.json"))
        return snap

    def read(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        snap = snaps[-1]
        if snapshot_id is not None:
            snap = next(s for s in snaps if s.snapshot_id == snapshot_id)
        dirs = json.loads(snap.data_dir)
        return spark.read.parquet(*dirs)


# -------------------------------------------------------------- bucketed layout


def save_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed metastore table (SURVEY §4.4 layout).

    Tables bucketed by the SAME columns and bucket count join WITHOUT a
    shuffle: Catalyst sees the matching output partitioning and plans a
    sort-merge join with zero Exchange operators on either side — the
    co-location contract for the mentions↔transcripts join family at 100 TB
    (both sides bucketed by conv_id once at write time, every downstream join
    free). Iceberg analog: ``bucket(N, conv_id)`` partition transform.
    Plan pinned by tests/test_plans.py::test_bucketed_join_has_no_exchange."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


# ------------------------------------------------------------------- lock


class Lock:
    """Exclusive run lock: atomic O_CREAT|O_EXCL marker file."""

    def __init__(self, path: str):
        self.path = path

    def held(self) -> bool:
        return os.path.exists(self.path)

    def acquire(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise LockHeldError(f"lock already held: {self.path}")
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps({"pid": os.getpid(), "ts": time.time()}))

    def release(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)

    def __enter__(self) -> "Lock":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()
