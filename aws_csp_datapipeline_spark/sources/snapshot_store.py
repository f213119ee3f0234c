"""Versioned snapshot store with optimistic concurrency control.

The reference serializes every mutation behind a whole-table exclusive
lock (``LOCK TABLE ... IN EXCLUSIVE MODE``,
lambda/lambda_function.py:266-273): writer 2 blocks until writer 1
commits, so each mutation is applied on top of the previous one and
none is lost. The CRUD operators here (operators/crud.py M1-M10) are
pure snapshot transformations; this module supplies the missing
concurrency guarantee WITHOUT a lock, using the optimistic commit
protocol production table formats use (Delta/Iceberg): each commit is
a put-if-absent of the next version's manifest, so of two writers
racing from the same snapshot exactly one wins and the loser gets a
``ConcurrentWriteError`` and re-applies its transformation on the
winner's snapshot. The serialized outcome is identical to the
reference's lock — but readers never block and never see a partial
table.

Layout under ``root/``::

    _commits/00000001.json   -> {"data": "<data dir name>"} (atomic
    _commits/00000002.json      O_EXCL create = the commit point)
    data/<uuid>/...parquet   (written BEFORE the manifest; an orphan
                              dir from a failed/lost race is garbage,
                              never visible)

Atomicity relies on ``O_CREAT | O_EXCL`` create semantics — correct on
local/NFS/HDFS-compatible filesystems. On S3 the same protocol is what
Delta implements with a coordination layer for put-if-absent; the
engine-side contract (read version, transform, commit-or-retry) is
unchanged, which is why the CRUD operators stay storage-agnostic.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class ConcurrentWriteError(Exception):
    """Another writer committed since this writer's snapshot was read."""


class SnapshotStore:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(os.path.join(root, "_commits"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # ---- read side -------------------------------------------------

    def version(self) -> int:
        """Latest committed version, 0 if the table is empty."""
        commits = os.listdir(os.path.join(self.root, "_commits"))
        versions = [int(c.split(".")[0]) for c in commits if c.endswith(".json")]
        return max(versions, default=0)

    def _data_dir(self, version: int) -> str:
        manifest = os.path.join(self.root, "_commits", f"{version:08d}.json")
        with open(manifest) as fh:
            return os.path.join(self.root, "data", json.load(fh)["data"])

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        """Snapshot at ``version`` (default: latest). None for an empty
        table — the caller supplies the seed schema on first write."""
        v = self.version() if version is None else version
        if v == 0:
            return None
        return spark.read.parquet(self._data_dir(v))

    # ---- write side ------------------------------------------------

    def commit(self, df: DataFrame, expected_version: int) -> int:
        """Persist ``df`` as version ``expected_version + 1``.

        The parquet data lands in an unreferenced uuid directory first;
        the O_EXCL manifest create is the single atomic commit point.
        Raises ConcurrentWriteError if any other writer committed that
        version first (the data dir is then an invisible orphan).
        """
        data_name = uuid.uuid4().hex
        df.write.mode("errorifexists").parquet(
            os.path.join(self.root, "data", data_name)
        )
        target = expected_version + 1
        manifest = os.path.join(self.root, "_commits", f"{target:08d}.json")
        try:
            fd = os.open(manifest, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            raise ConcurrentWriteError(
                f"version {target} was committed by another writer"
            ) from exc
        with os.fdopen(fd, "w") as fh:
            json.dump({"data": data_name}, fh)
        return target

    def mutate(
        self,
        spark: SparkSession,
        fn: Callable[[DataFrame | None], DataFrame],
        max_retries: int = 10,
    ) -> int:
        """Apply ``fn`` (snapshot -> new snapshot) with optimistic
        retry: on conflict, re-read the winner's snapshot and re-apply.
        This is the lock-free equivalent of the reference's
        lock-serialized mutation — every writer's transformation lands
        exactly once, in some serial order."""
        for _ in range(max_retries):
            v = self.version()
            out = fn(self.read(spark, v) if v else None)
            # materialize the plan BEFORE the commit race window: fn may
            # lazily reference the snapshot we read, which stays valid
            # (old versions are immutable), so correctness is unaffected.
            try:
                return self.commit(out, v)
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"gave up after {max_retries} optimistic retries"
        )
