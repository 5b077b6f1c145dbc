"""Manifest-committed atomic parquet tables — snapshot isolation on
plain files (the transaction-log pattern behind Delta/Iceberg, sized
to this engine): a table directory holds immutable parquet data files
plus a ``_manifests/`` log of versioned JSON manifests; READERS see
exactly the file list of one committed manifest, WRITERS stage data
files under unique names and then publish a new manifest with an
atomic link — so a crashed or losing writer leaves garbage files but
never a torn table, and concurrent committers conflict-detect instead
of interleaving.

Why this exists here: the reference codec's host framework assumes
Hadoop's rename-based output commit, whose partial-failure window is
exactly what burns 100 TB pipelines. This module gives the repo's
sinks an exactly-once batch commit protocol with time travel, using
nothing but the filesystem primitives available everywhere
(``open(..., 'x')`` / ``os.link`` exclusivity).

Commit protocol:
1. stage: write parquet files under ``data/<uuid>-*.parquet``
2. prepare: serialize manifest v(N+1) to a temp file
3. publish: hard-link temp -> ``_manifests/v{N+1}.json``; the link
   either fully exists or not (POSIX atomicity). A concurrent winner
   makes the link fail -> ``CommitConflict`` (optimistic concurrency;
   append retries simply re-link at N+2, overwrite must re-read).
4. readers resolve the highest committed version (or a pinned one)
   and read ONLY its file list.

``vacuum`` removes data files referenced by NO retained manifest —
safe because manifests are immutable and data files are never
rewritten in place.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic
    concurrency loss). Re-read the table and retry."""


@dataclass(frozen=True)
class Manifest:
    version: int
    operation: str  # "append" | "overwrite"
    files: tuple[str, ...]  # relative to the table root
    parent: int | None
    committed_at: float


class ManifestTable:
    """One table rooted at ``path`` (local / any shared POSIX fs)."""

    def __init__(self, path: str) -> None:
        self.root = path
        self.data_dir = os.path.join(path, "data")
        self.log_dir = os.path.join(path, "_manifests")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)

    # ------------------------------------------------------------ log

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.log_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"v{version}.json")

    def manifest(self, version: int | None = None) -> Manifest | None:
        vs = self.versions()
        if not vs:
            return None
        v = version if version is not None else vs[-1]
        if v not in vs:
            raise ValueError(f"version {v} not committed (have {vs})")
        with open(self._manifest_path(v)) as f:
            doc = json.load(f)
        return Manifest(
            version=v,
            operation=doc["operation"],
            files=tuple(doc["files"]),
            parent=doc.get("parent"),
            committed_at=doc.get("committed_at", 0.0),
        )

    # ---------------------------------------------------------- write

    def _stage(self, df: DataFrame) -> list[str]:
        """Write the DataFrame's parquet files under unique names;
        returns table-root-relative paths. Staged files are invisible
        until a manifest references them."""
        token = uuid.uuid4().hex
        staging = os.path.join(self.data_dir, f"_staging-{token}")
        df.write.mode("overwrite").parquet(staging)
        rel_files = []
        for name in sorted(os.listdir(staging)):
            if not name.endswith(".parquet"):
                continue
            final = f"{token}-{name}"
            os.replace(
                os.path.join(staging, name),
                os.path.join(self.data_dir, final),
            )
            rel_files.append(os.path.join("data", final))
        shutil.rmtree(staging, ignore_errors=True)
        return rel_files

    def _publish(
        self, operation: str, files: list[str], parent: int | None
    ) -> Manifest:
        version = (parent if parent is not None else 0) + 1
        doc = {
            "operation": operation,
            "files": files,
            "parent": parent,
            "committed_at": time.time(),
        }
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(doc, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            # hard link is the atomic exclusive publish: it either
            # creates v{N}.json fully or raises — never a torn file
            os.link(tmp, self._manifest_path(version))
        except FileExistsError as exc:
            raise CommitConflict(
                f"version {version} was committed concurrently"
            ) from exc
        finally:
            os.unlink(tmp)
        return self.manifest(version)

    def append(self, df: DataFrame, max_retries: int = 5) -> Manifest:
        """Atomic append: stage once, publish against the latest
        version; a concurrency loss retries the PUBLISH only (the
        staged files are already content-complete and version-free)."""
        staged = self._stage(df)
        for _ in range(max_retries + 1):
            head = self.manifest()
            base = list(head.files) if head else []
            parent = head.version if head else None
            try:
                return self._publish("append", base + staged, parent)
            except CommitConflict:
                continue
        raise CommitConflict(
            f"append lost {max_retries + 1} races; giving up"
        )

    def overwrite(
        self, df: DataFrame, expected_version: int | None = None
    ) -> Manifest:
        """Atomic replace of the whole table contents. With
        ``expected_version`` the commit fails unless the table head is
        still that version (compare-and-swap semantics); without it,
        the overwrite publishes over whatever head it finds."""
        staged = self._stage(df)
        head = self.manifest()
        parent = head.version if head else None
        if expected_version is not None and parent != expected_version:
            raise CommitConflict(
                f"table moved: head is {parent}, expected "
                f"{expected_version}"
            )
        return self._publish("overwrite", staged, parent)

    # ----------------------------------------------------------- read

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Read exactly one committed snapshot (latest by default;
        pass ``version`` for time travel)."""
        m = self.manifest(version)
        if m is None or not m.files:
            raise ValueError("table has no committed data")
        paths = [os.path.join(self.root, f) for f in m.files]
        return spark.read.parquet(*paths)

    # -------------------------------------------------------- vacuum

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Delete data files referenced by NO retained manifest and
        drop manifests older than the last ``keep_last``. Returns the
        deleted data-file names. Safe by construction: data files are
        immutable and only ever referenced by manifests."""
        vs = self.versions()
        keep_versions = vs[-keep_last:] if keep_last > 0 else []
        referenced: set[str] = set()
        for v in keep_versions:
            referenced.update(
                os.path.basename(f) for f in self.manifest(v).files
            )
        deleted = []
        for name in list(os.listdir(self.data_dir)):
            full = os.path.join(self.data_dir, name)
            if name.startswith("_staging-"):
                shutil.rmtree(full, ignore_errors=True)
                continue
            if name.endswith(".parquet") and name not in referenced:
                os.unlink(full)
                deleted.append(name)
        for v in vs:
            if v not in keep_versions:
                os.unlink(self._manifest_path(v))
        return deleted
