"""Manifest-committed atomic table tests: snapshot isolation, commit
atomicity under crash/conflict, time travel, CAS overwrite, vacuum
safety — the transaction-log guarantees a 100 TB batch pipeline needs
from its sink."""

from __future__ import annotations

import os

import pytest

from hadoop_brotli_spark.sources.manifest_table import (
    CommitConflict,
    ManifestTable,
)


def _df(spark, lo: int, hi: int):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def _ids(df) -> list[int]:
    return sorted(r.id for r in df.select("id").collect())


def test_append_snapshots_and_time_travel(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"))
    m1 = tbl.append(_df(spark, 0, 5))
    m2 = tbl.append(_df(spark, 5, 8))
    assert (m1.version, m2.version) == (1, 2)
    assert _ids(tbl.read(spark)) == list(range(8))
    # time travel: v1 still reads exactly its own snapshot
    assert _ids(tbl.read(spark, version=1)) == list(range(5))


def test_overwrite_replaces_and_keeps_history(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.append(_df(spark, 0, 5))
    m2 = tbl.overwrite(_df(spark, 100, 103))
    assert m2.operation == "overwrite"
    assert _ids(tbl.read(spark)) == [100, 101, 102]
    assert _ids(tbl.read(spark, version=1)) == list(range(5))


def test_staged_but_uncommitted_files_are_invisible(spark, tmp_path):
    """Crash atomicity: data files staged WITHOUT a manifest (a dead
    writer) never surface to readers."""
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.append(_df(spark, 0, 4))
    # simulate a writer that died after staging, before publishing
    tbl._stage(_df(spark, 1000, 1010))
    assert _ids(tbl.read(spark)) == [0, 1, 2, 3]
    # and the orphans are reclaimed by vacuum
    deleted = tbl.vacuum(keep_last=1)
    assert deleted  # the orphaned staged files went away
    assert _ids(tbl.read(spark)) == [0, 1, 2, 3]


def test_concurrent_append_conflict_retries(spark, tmp_path):
    """Optimistic concurrency: a version stolen between head-read and
    publish triggers the retry path, and BOTH appends land."""
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.append(_df(spark, 0, 3))

    stolen = {"done": False}
    orig_publish = tbl._publish

    def racing_publish(operation, files, parent):
        if not stolen["done"]:
            stolen["done"] = True
            # another writer wins version parent+1 first
            other = ManifestTable(tbl.root)
            other.append(_df(spark, 50, 52))
        return orig_publish(operation, files, parent)

    tbl._publish = racing_publish  # type: ignore[method-assign]
    tbl.append(_df(spark, 3, 6))
    tbl._publish = orig_publish  # type: ignore[method-assign]
    assert _ids(tbl.read(spark)) == [0, 1, 2, 3, 4, 5, 50, 51]
    assert tbl.manifest().version == 3


def test_overwrite_cas_detects_moved_head(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.append(_df(spark, 0, 3))
    tbl.append(_df(spark, 3, 6))
    with pytest.raises(CommitConflict):
        tbl.overwrite(_df(spark, 9, 10), expected_version=1)
    # correct expectation commits
    m = tbl.overwrite(_df(spark, 9, 10), expected_version=2)
    assert m.version == 3


def test_vacuum_keeps_referenced_files_only(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.append(_df(spark, 0, 4))
    tbl.overwrite(_df(spark, 10, 12))
    n_files_before = len(
        [f for f in os.listdir(tbl.data_dir) if f.endswith(".parquet")]
    )
    deleted = tbl.vacuum(keep_last=1)
    assert deleted  # v1's files are unreferenced by the kept head
    remaining = [
        f for f in os.listdir(tbl.data_dir) if f.endswith(".parquet")
    ]
    assert len(remaining) == n_files_before - len(deleted)
    # head still reads perfectly; history is gone by design
    assert _ids(tbl.read(spark)) == [10, 11]
    assert tbl.versions() == [2]


def test_manifest_publish_is_exclusive(spark, tmp_path):
    """The publish primitive itself: pre-creating the target version
    makes the commit raise rather than overwrite."""
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.append(_df(spark, 0, 2))
    # occupy v2 by hand
    with open(tbl._manifest_path(2), "w") as f:
        f.write("{}")
    staged = tbl._stage(_df(spark, 2, 4))
    with pytest.raises(CommitConflict):
        tbl._publish("append", staged, parent=1)
