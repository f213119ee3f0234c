"""Persisted IVF ANN index: build ONCE, probe many.

`similarity.ivf_topk` answers a one-off ANN query by training the
coarse quantizer and assigning every corpus vector inside a single
session — the right shape for ad-hoc use, but at corpus scale the
index is an ARTIFACT: the assignment pass (the expensive part — one
scan of all N vectors) is paid once, written out partitioned by cell,
and every probe after that reads only its ``n_probe`` cell
directories. This module is that artifact's lifecycle:

- ``build_ivf_index``: train the seeded coarse quantizer on a bounded
  sample (the ``ivf_topk`` build rules), assign all vectors, write
  ``<dir>/cells`` as cell-PARTITIONED parquet plus ``<dir>/centroids``
  and a ``meta.json``.
- ``probe_ivf_index``: rank cells for one query vector driver-side
  (the centroid table is tiny by construction — ≤4096 rows), then scan
  ONLY the probed cell partitions — structurally, by handing Spark
  just those ``cell=`` directories (with ``basePath`` so the partition
  column survives), which skips even the partition-discovery listing
  of the other cells (``tests/test_ann_index.py`` pins the pruning
  via ``inputFiles()``).
- ``batch_probe_ivf_index``: a whole probe table at once — cells
  ranked JVM-side against the broadcast centroid table, candidates
  fetched with one equi-join on ``cell``.
- ``append_to_index``: assign NEW vectors with the FROZEN persisted
  quantizer (argmin over the broadcast centroid table — no retrain,
  no touch of existing cells) and append their partitions. The
  incremental-ingest shape: a daily embedding delta lands in the same
  index the nightly probes read.

Scale shape at 100 TB: cells ≈ √N (``similarity.auto_ivf_cells``)
keeps per-probe I/O ∝ n_probe·√N — sublinear per query — while the
one-time build stays a single linear scan. Recall is bought with
``n_probe`` exactly as in ``ivf_topk`` (probing every cell reproduces
brute force bit-for-bit; the equality test pins that).

Reference parity note: the reference engine has no vector surface at
all (its closest analog is the Redshift SORTKEY layout,
sql/ddl_create_tables.sql:26); this is part of the training-data
extension surface, same family as s1/s3/s5.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.functions.similarity import (
    _as_double,
    auto_ivf_cells,
    cosine,
    dot,
)

_META = "meta.json"
_CELLS = "cells"
_CENTROIDS = "centroids"


def _cell_rank_expr(vec: Column) -> Column:
    """Euclidean cell rank against a joined-in ``__ctr`` centroid
    column: argmin |v-c|^2 = argmin (|c|^2 - 2 v·c) since |v|^2 is
    constant per vector. Callers crossJoin the broadcast centroid
    table first."""
    return dot(F.col("__ctr"), F.col("__ctr")) - F.lit(2.0) * dot(vec, F.col("__ctr"))


def _assign_with_centers(
    df: DataFrame, centers_df: DataFrame, vec: Column
) -> DataFrame:
    """Assign each row of ``df`` to its nearest persisted centroid:
    broadcast crossJoin against the (≤4096-row) centroid table +
    one min_by aggregate — JVM-side end to end, one shuffle keyed by
    the row id (map-side combine collapses the ×cells expansion)."""
    joined = df.crossJoin(
        F.broadcast(
            centers_df.select(
                F.col("cell").alias("__cell"), F.col("ctr").alias("__ctr")
            )
        )
    ).withColumn("__cdist", _cell_rank_expr(vec))
    keys = [c for c in df.columns]
    return (
        joined.groupBy(*keys)
        .agg(F.min_by("__cell", "__cdist").alias("cell"))
    )


def _train_and_assign(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    n_cells: int | None,
    seed: int,
    max_iter: int,
):
    """Shared coarse-quantizer build: KMeans on a seeded ~64/centroid
    sample (the measured `ivf_topk` rules, SCALE.md "sf100 ANN/ER/
    dedup extension"), one `model.transform` assignment pass. NULL
    vectors are excluded (cosine against NULL can never match; same
    drop rule as `semdedup_flags`' single-phase path). Returns
    (assigned (id, vec, cell), centers, n_rows, n_cells)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    ).filter(F.col("vec").isNotNull())
    n_rows = c.count()
    cells = n_cells or auto_ivf_cells(n_rows)
    feat = c.withColumn("features", array_to_vector("vec"))
    train = feat
    sample_target = max(10_000, 64 * cells)
    if n_rows > sample_target:
        train = feat.sample(fraction=sample_target / n_rows, seed=seed)
    model = KMeans(
        k=cells, seed=seed, featuresCol="features", maxIter=max_iter
    ).fit(train)
    assigned = model.transform(feat).select(
        "id", "vec", F.col("prediction").cast("int").alias("cell")
    )
    centers = [
        (i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())
    ]
    return assigned, centers, n_rows, cells


def build_ivf_index(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    index_dir: str,
    n_cells: int | None = None,
    seed: int = 42,
    max_iter: int = 10,
) -> dict:
    """Build and persist the index; returns the metadata dict.

    The write repartitions by ``cell`` so each task emits only its
    own cells' files — no task×cell small-file explosion."""
    assigned, centers, n_rows, cells = _train_and_assign(
        corpus, vec_col, id_col, n_cells, seed, max_iter
    )
    (
        assigned.repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, _CELLS))
    )
    spark = corpus.sparkSession
    spark.createDataFrame(centers, "cell int, ctr array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(index_dir, _CENTROIDS))
    dim = len(centers[0][1])
    meta = {
        "n_cells": cells,
        "dim": dim,
        "n_rows": n_rows,
        "seed": seed,
        "vec_col": vec_col,
        "id_col": id_col,
    }
    with open(os.path.join(index_dir, _META), "w") as fh:
        json.dump(meta, fh)
    return meta


def build_ivf_pq_index(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    index_dir: str,
    n_cells: int | None = None,
    pq_m: int = 8,
    pq_k: int = 256,
    seed: int = 42,
    max_iter: int = 10,
) -> dict:
    """The FULL IVF-PQ index: cell-partitioned PQ CODES instead of raw
    vectors — the artifact stores (id, codes, vnorm, cell), ~3% of the
    raw bytes, plus the centroid table and the PQ codebooks (in
    meta.json; m·k·(dim/m) floats, driver-sized by construction).
    A probe prunes to n_probe cell directories, ADC-scores only codes,
    and exact-reranks the shortlist against full vectors fetched for
    finalists only (`probe_ivf_pq_index`). Storage and kernel-choice
    measurements: SCALE.md "PQ at sf100"."""
    from aws_csp_datapipeline_spark.functions import pq as PQ

    assigned, centers, n_rows, cells = _train_and_assign(
        corpus, vec_col, id_col, n_cells, seed, max_iter
    )
    books = PQ.train_pq_codebooks(
        corpus, vec_col, m=pq_m, k=pq_k, seed=seed, max_iter=max_iter
    )
    encoded = PQ.pq_encode(assigned, "vec", books).select(
        "id", "codes", "vnorm", "cell"
    )
    (
        encoded.repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, _CELLS))
    )
    spark = corpus.sparkSession
    spark.createDataFrame(centers, "cell int, ctr array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(index_dir, _CENTROIDS))
    meta = {
        "n_cells": cells,
        "dim": len(centers[0][1]),
        "n_rows": n_rows,
        "seed": seed,
        "vec_col": vec_col,
        "id_col": id_col,
        "pq_codebooks": books,
    }
    with open(os.path.join(index_dir, _META), "w") as fh:
        json.dump(meta, fh)
    return meta


def probe_ivf_pq_index(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    shortlist: int | None = None,
    rerank_against: DataFrame | None = None,
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF-PQ read path: prune to the n_probe nearest cell
    directories (same structural pruning as `probe_ivf_index`),
    ADC-score the codes there, and — when ``rerank_against`` (the
    original (id_col, vec_col) corpus) is given — exact-rerank the
    shortlist against full vectors. Without a rerank table the ADC
    approximation itself is returned. Returns (id_col, cos_sim).

    Like ``probe_ivf_index``, existence checks go through the local
    filesystem (`os.path.isdir`) — see that docstring for the
    object-store note; every probed cell being empty yields an empty
    result, not an error."""
    from aws_csp_datapipeline_spark.functions import pq as PQ

    meta = read_meta(index_dir)
    books = meta["pq_codebooks"]
    centers = [
        (r["cell"], list(r["ctr"])) for r in _centroids(spark, index_dir).collect()
    ]
    probe = [c for c, _ in _rank_cells_local(centers, query_vec)[:n_probe]]
    cells_dir = os.path.join(index_dir, _CELLS)
    paths = [
        p
        for c in probe
        if os.path.isdir(p := os.path.join(cells_dir, f"cell={c}"))
    ]
    if not paths:
        return spark.createDataFrame(
            [], f"{meta['id_col']} bigint, cos_sim double"
        )
    cand = spark.read.option("basePath", cells_dir).parquet(*paths)
    if exclude_id is not None:
        cand = cand.filter(F.col("id") != exclude_id)
    rr = rerank_against
    if rr is not None:
        rr = rr.select(
            F.col(meta["id_col"]).alias("id"),
            F.col(meta["vec_col"]).alias("__rv"),
        )
        if exclude_id is not None:
            rr = rr.filter(F.col("id") != exclude_id)
    out = PQ.pq_adc_topk(
        cand,
        books,
        query_vec,
        "id",
        k=k,
        shortlist=shortlist,
        rerank_against=rr,
        vec_col="__rv" if rr is not None else None,
    )
    return out.withColumnRenamed("id", meta["id_col"])


def read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _META)) as fh:
        return json.load(fh)


def _centroids(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, _CENTROIDS))


def _rank_cells_local(centers: list[tuple[int, list[float]]], qv: list[float]):
    """Driver-side euclidean cell ranking for a SINGLE probe vector —
    the centroid table is ≤4096 rows by construction, far below any
    distributed-work threshold."""

    def d2(ctr):
        return sum(x * x for x in ctr) - 2.0 * sum(a * b for a, b in zip(qv, ctr))

    return sorted(centers, key=lambda t: (d2(t[1]), t[0]))


def probe_ivf_index(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    exclude_id: int | None = None,
) -> DataFrame:
    """Top-k cosine neighbors of one query vector, scanning only the
    ``n_probe`` nearest cell PARTITIONS — no listing or I/O outside
    the probed cell directories. Returns (neighbor_id, cell, cos_sim)
    ordered by similarity.

    If every probed cell directory is empty/missing (possible when
    n_probe is small and KMeans produced empty cells) the result is
    an EMPTY frame with the same schema, not an error. Existence
    checks use the local filesystem (`os.path.isdir` / `open` on
    meta.json): the artifact as written targets a posix path (local
    disk / NFS / fuse-mounted store); for a raw object store the
    checks would route through the Hadoop FS API instead — documented
    constraint, not silently assumed."""
    centers = [
        (r["cell"], list(r["ctr"])) for r in _centroids(spark, index_dir).collect()
    ]
    probe = [c for c, _ in _rank_cells_local(centers, query_vec)[:n_probe]]
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    cells_dir = os.path.join(index_dir, _CELLS)
    # STRUCTURAL pruning: hand Spark only the probed cell directories
    # (with basePath so `cell` stays a column) instead of a filter the
    # optimizer must push — at √N cells even the partition-discovery
    # LISTING is skipped, which at 100k+ cells is itself a cost. An
    # empty KMeans cell writes no directory; drop those.
    paths = [
        p
        for c in probe
        if os.path.isdir(p := os.path.join(cells_dir, f"cell={c}"))
    ]
    if not paths:
        return spark.createDataFrame(
            [], "neighbor_id bigint, cell int, cos_sim double"
        )
    df = (
        spark.read.option("basePath", cells_dir)
        .parquet(*paths)
        .withColumn("cos_sim", F.round(cosine(F.col("vec"), qv), 4))
    )
    if exclude_id is not None:
        df = df.filter(F.col("id") != exclude_id)
    return (
        df.select(F.col("id").alias("neighbor_id"), "cell", "cos_sim")
        .orderBy(F.col("cos_sim").desc(), "neighbor_id")
        .limit(k)
    )


def batch_probe_ivf_index(
    spark: SparkSession,
    index_dir: str,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """ANN join of a probe TABLE against the persisted index: rank
    cells per probe against the broadcast centroid table (JVM-side),
    fetch candidates with one equi-join on ``cell``, exact cosine
    re-rank, per-probe top-k. The probe side is re-used twice
    (cell-rank, then re-rank) but only its (id, vec) projection ever
    moves. Self-matches (same id) are excluded, mirroring
    `ivf_topk`."""
    from pyspark.sql import Window

    p = probes.select(
        F.col(id_col).alias("probe_id"), _as_double(F.col(vec_col)).alias("pv")
    ).filter(F.col("pv").isNotNull())
    ranked = p.crossJoin(
        F.broadcast(
            _centroids(spark, index_dir).select(
                F.col("cell"), F.col("ctr").alias("__ctr")
            )
        )
    ).withColumn("__cdist", _cell_rank_expr(F.col("pv")))
    wc = Window.partitionBy("probe_id").orderBy("__cdist", "cell")
    pcells = (
        ranked.withColumn("__rc", F.row_number().over(wc))
        .filter(F.col("__rc") <= n_probe)
        .select("probe_id", "pv", "cell")
    )
    idx = spark.read.parquet(os.path.join(index_dir, _CELLS))
    scored = (
        idx.join(F.broadcast(pcells), "cell")
        .filter(F.col("probe_id") != F.col("id"))
        .withColumn("cos_sim", F.round(cosine(F.col("pv"), F.col("vec")), 4))
        .select("probe_id", F.col("id").alias("neighbor_id"), "cos_sim")
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def batch_probe_ivf_pq_index(
    spark: SparkSession,
    index_dir: str,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_probe: int = 4,
    shortlist: int | None = None,
    rerank_against: DataFrame | None = None,
) -> DataFrame:
    """ANN join of a probe TABLE against the persisted IVF-PQ index:
    cells ranked per probe against the broadcast centroid table, PQ
    codes fetched with one equi-join on ``cell``, ADC-scored per
    (probe, candidate) via the codebook literal (JVM-side: the m×k
    dot-product table is a probe-INDEPENDENT reformulation — each
    subspace looks up the candidate's centroid and dots it against
    the probe's subvector), then per-probe shortlist and optional
    exact rerank. Returns (probe_id, neighbor_id, cos_sim)."""
    from pyspark.sql import Window

    from aws_csp_datapipeline_spark.functions import pq as PQ
    from aws_csp_datapipeline_spark.functions.similarity import cosine

    meta = read_meta(index_dir)
    books = meta["pq_codebooks"]
    m = len(books)
    sub = len(books[0][0])

    p = probes.select(
        F.col(id_col).alias("probe_id"), _as_double(F.col(vec_col)).alias("pv")
    ).filter(F.col("pv").isNotNull())
    ranked = p.crossJoin(
        F.broadcast(
            _centroids(spark, index_dir).select(
                F.col("cell"), F.col("ctr").alias("__ctr")
            )
        )
    ).withColumn("__cdist", _cell_rank_expr(F.col("pv")))
    wc = Window.partitionBy("probe_id").orderBy("__cdist", "cell")
    pcells = (
        ranked.withColumn("__rc", F.row_number().over(wc))
        .filter(F.col("__rc") <= n_probe)
        .select("probe_id", "pv", "cell")
    )
    idx = spark.read.parquet(os.path.join(index_dir, _CELLS))
    # ADC against a moving probe: decode the candidate's per-subspace
    # centroid (a literal-array lookup) and dot it with the probe's
    # subvector — identical arithmetic to the single-probe LUT form
    adot = None
    for j, book in enumerate(books):
        cb = PQ._codebook_expr(book)
        centroid_j = F.element_at(cb, F.element_at(F.col("codes"), j + 1) + 1)
        term = F.aggregate(
            F.zip_with(
                F.slice(F.col("pv"), j * sub + 1, sub),
                centroid_j,
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        adot = term if adot is None else adot + term
    pnorm = F.sqrt(
        F.aggregate(F.col("pv"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = (
        idx.join(F.broadcast(pcells), "cell")
        .filter(F.col("probe_id") != F.col("id"))
        .withColumn("adc_sim", adot / (pnorm * F.col("vnorm")))
        .select("probe_id", F.col("id").alias("neighbor_id"), "adc_sim")
    )
    n_short = shortlist or (4 * k if rerank_against is not None else k)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc_sim").desc(), "neighbor_id"
    )
    short = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max(n_short, k))
        .drop("__rn")
    )
    if rerank_against is None:
        return short.select(
            "probe_id", "neighbor_id", F.round("adc_sim", 4).alias("cos_sim")
        )
    full = rerank_against.select(
        F.col(meta["id_col"]).alias("neighbor_id"),
        _as_double(F.col(meta["vec_col"])).alias("__v"),
    )
    rer = (
        short.join(full, "neighbor_id")
        .join(p, "probe_id")
        .withColumn("cos_sim", F.round(cosine(F.col("pv"), F.col("__v")), 4))
        .select("probe_id", "neighbor_id", "cos_sim")
    )
    wr = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), "neighbor_id"
    )
    return (
        rer.withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def append_to_index(
    delta: DataFrame, vec_col: str, id_col: str, index_dir: str
) -> int:
    """Assign NEW vectors with the frozen persisted quantizer and
    append them to the index — no retrain, existing cell files
    untouched (parquet append only adds files inside the target
    ``cell=`` directories). Returns the number of appended rows.

    This is what keeps the artifact valid under incremental ingest:
    the quantizer is part of the index's identity, so deltas MUST use
    the stored centroids — refitting on the delta would re-home
    existing cells and silently invalidate every persisted
    assignment. The same rule extends to a PQ index: its cells hold
    (id, codes, vnorm) rather than raw vectors, so the delta is
    PQ-ENCODED with the STORED codebooks before the append — writing
    raw (id, vec) rows into a PQ cell directory would silently mix
    schemas and corrupt every later ADC probe."""
    spark = delta.sparkSession
    meta = read_meta(index_dir)
    d = delta.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    ).filter(F.col("vec").isNotNull())
    assigned = _assign_with_centers(d, _centroids(spark, index_dir), F.col("vec"))
    if "pq_codebooks" in meta:
        from aws_csp_datapipeline_spark.functions import pq as PQ

        out = PQ.pq_encode(assigned, "vec", meta["pq_codebooks"]).select(
            "id", "codes", "vnorm", "cell"
        )
    else:
        out = assigned
    n = out.count()
    (
        out.repartition(F.col("cell"))
        .write.mode("append")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, _CELLS))
    )
    meta["n_rows"] = int(meta["n_rows"]) + n
    with open(os.path.join(index_dir, _META), "w") as fh:
        json.dump(meta, fh)
    return n
