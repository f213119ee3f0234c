"""Corpus-keyed artifact cache: build once, read everywhere.

The repo's persisted artifacts (IVF / IVF-PQ indexes in
``functions/ann_index.py``, the semdedup kept-state in
``functions/semdedup_state.py``, the co-supply edge list in
``operators/graph.py``) all share the same economics: an expensive
corpus-scale build that is paid ONCE, then probe/read lanes that cost
what the answer weighs. The registry lanes, however, are stateless
``(spark, sf_dir)`` callables — without a cache each invocation
rebuilt its artifact from scratch (the round-10 verdict's
"driver-statelessness tax": s18/s20 re-trained KMeans + re-wrote the
index per call; every gr lane re-ran a corpus-scale self-join that is
~95% of gr7's sf100 cost).

This module closes that gap with a filesystem cache keyed by CORPUS
IDENTITY, not by path alone: the key folds in every source parquet
file's (relative path, size, mtime_ns), so a regenerated or edited
corpus under the same directory gets a fresh build instead of a stale
artifact — the safety property that makes rebuild-if-absent sound.
Publication is atomic (build into a dot-prefixed temp dir, one
``os.rename``), so a concurrent builder race leaves exactly one
winner and no torn artifact; losers discard their build and read the
winner's.

Cache location: ``$SPARK_GRAFT_ARTIFACT_DIR`` if set, else
``<tmpdir>/spark_graft_artifacts``. At deployment scale the same
layout lands on shared storage (S3/HDFS) and the fingerprint walk is
one LIST call — the artifact is then shared across sessions and
executor fleets, which is the whole point.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from collections.abc import Callable, Iterable


def cache_base() -> str:
    return os.environ.get(
        "SPARK_GRAFT_ARTIFACT_DIR",
        os.path.join(tempfile.gettempdir(), "spark_graft_artifacts"),
    )


def corpus_fingerprint(sf_dir: str, tables: Iterable[str]) -> str:
    """Digest of the source tables' physical identity: every visible
    parquet file's (table, relative path, size, mtime_ns). A cheap
    stat()-only walk — no file contents are read — with the same
    hidden-path pruning as ``catalog.table_row_count`` so staging
    debris doesn't perturb the key."""
    from aws_csp_datapipeline_spark.catalog import table_path

    h = hashlib.md5()
    for t in sorted(tables):
        p = table_path(sf_dir, t)
        files: list[str] = []
        if os.path.isdir(p):
            for root, dirs, fs in os.walk(p):
                dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
                files.extend(
                    os.path.join(root, f)
                    for f in fs
                    if f.endswith(".parquet") and not f.startswith(("_", "."))
                )
        elif os.path.exists(p):
            files.append(p)
        for f in sorted(files):
            st = os.stat(f)
            h.update(
                f"{t}|{os.path.relpath(f, p)}|{st.st_size}|{st.st_mtime_ns}\n".encode()
            )
    return h.hexdigest()


def get_or_build(
    kind: str,
    sf_dir: str,
    tables: Iterable[str],
    config: dict,
    build_fn: Callable[[str], None],
) -> str:
    """Return the directory of the ``kind`` artifact for this corpus +
    config, invoking ``build_fn(staging_dir)`` only when no published
    artifact exists. ``build_fn`` must write the COMPLETE artifact
    into the staging directory it is handed; publication is a single
    atomic rename, so readers never observe a partial artifact and a
    lost race cleanly defers to the winner."""
    cfg_key = hashlib.md5(
        json.dumps(config, sort_keys=True).encode()
    ).hexdigest()[:8]
    fp = corpus_fingerprint(sf_dir, tables)[:16]
    base = cache_base()
    final = os.path.join(base, f"{kind}-{fp}-{cfg_key}")
    if os.path.isdir(final):
        return final
    os.makedirs(base, exist_ok=True)
    staging = tempfile.mkdtemp(prefix=f".{kind}-build-", dir=base)
    try:
        build_fn(staging)
        try:
            os.rename(staging, final)
        except OSError:
            # lost the publish race: the winner's artifact is
            # equivalent (same corpus, same config) — use it
            if not os.path.isdir(final):
                raise
            shutil.rmtree(staging, ignore_errors=True)
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return final
