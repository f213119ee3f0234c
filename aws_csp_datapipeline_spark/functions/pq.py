"""Product quantization (PQ) for embedding columns: the compression
half of the IVF-PQ design that makes 100-TB-scale ANN feasible.

A 64-dim float32 embedding is 256 bytes; its PQ code is ``m`` small
ints (one per subspace — 8 bytes at m=8) plus one stored norm. The
trick (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
Search"): split the vector into ``m`` contiguous subvectors, learn a
``k``-centroid codebook per subspace, and represent the vector by its
per-subspace nearest-centroid ids. Distances against a query are then
computed WITHOUT decompression via ADC (asymmetric distance
computation): the query precomputes an m×k lookup table of
subspace dot products, and a candidate's approximate dot product is
m table lookups — `element_at` per subspace here, JVM-side, no UDF.

Scale shape:
- codebook training = m independent KMeans fits on bounded seeded
  samples (64 vectors/centroid, 10 iterations — the measured
  `ivf_topk` build rules); cost is independent of corpus size.
- encoding = one linear pass: per-subspace argmin against the literal
  codebook via JVM array expressions (no joins, no Python — m·k·(dim/m)
  interpreted ops per row, a one-time cost measured in SCALE.md).
- an ADC scan reads (id, codes, norm) — ~3% of the raw embedding
  bytes — and computes m lookups + one divide per row; composed with
  the `ann_index` cell partitioning this is IVF-PQ: prune to n_probe
  cells, ADC-score only codes, exact-rerank the short list against
  full vectors fetched for finalists only (`rerank` here).

Cosine handling: ADC approximates the DOT product; cosine needs the
true vector norm, which PQ reconstruction distorts — so `pq_encode`
stores the exact norm at encode time (one double) and ADC divides by
it, keeping the approximation error confined to the dot product.

The codebooks are plain Python lists (m×k×(dim/m) floats — ≤64k
numbers at m=8,k=256,dim=64), small enough to ship as literal
expressions; they are built via one generated-SQL `F.expr` per call
site, not per-float Column calls (the er3 py4j-chatter lesson,
SCALE.md "er3 build cost").
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.functions.similarity import _as_double


def _sql_floats(xs) -> str:
    return "array(" + ",".join(f"{float(x)!r}D" for x in xs) + ")"


def _codebook_expr(codebook: list[list[float]]) -> Column:
    """One subspace's k×sub codebook as a literal array<array<double>>,
    parsed JVM-side in a single expr."""
    return F.expr("array(" + ",".join(_sql_floats(c) for c in codebook) + ")")


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str,
    m: int = 8,
    k: int = 256,
    seed: int = 42,
    max_iter: int = 10,
) -> list[list[list[float]]]:
    """Learn the m per-subspace codebooks. Returns
    ``codebooks[j][c] = centroid c of subspace j`` (each of dim/m
    floats). Vector dim must be divisible by ``m``. Each fit trains on
    a seeded sample of ≥64·k rows (whole corpus if smaller)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = df.select(_as_double(F.col(vec_col)).alias("v")).filter(
        F.col("v").isNotNull()
    )
    dim = len(v.first()["v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    n = v.count()
    sample_target = max(10_000, 64 * k)
    if n > sample_target:
        v = v.sample(fraction=sample_target / n, seed=seed)
    v = v.cache()
    try:
        books = []
        for j in range(m):
            feat = v.select(
                array_to_vector(F.slice("v", j * sub + 1, sub)).alias("features")
            )
            model = KMeans(
                k=min(k, n), seed=seed + j, featuresCol="features", maxIter=max_iter
            ).fit(feat)
            books.append(
                [[float(x) for x in ctr] for ctr in model.clusterCenters()]
            )
        return books
    finally:
        v.unpersist()


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks: list[list[list[float]]],
    codes_col: str = "codes",
    norm_col: str = "vnorm",
) -> DataFrame:
    """Add ``codes_col`` (array<int>, one code per subspace) and
    ``norm_col`` (the EXACT l2 norm, stored so ADC cosine never pays
    the reconstruction error twice). One linear pass.

    The argmin kernel is an Arrow-batched pandas_udf doing one numpy
    matmul per subspace (B×sub @ sub×k) — the documented Python
    boundary (SCALE.md "Python boundary"): the first implementation
    expressed the same argmin as interpreted higher-order array
    expressions (transform + zip_with + aggregate) and was a measured
    DNF at 2M vectors — m·k·(dim/m) ≈ 16k interpreted lambda
    evaluations per ROW with array allocation per candidate, >12 min
    without finishing one partition, vs ~seconds for the BLAS matmul
    of the identical arithmetic (SCALE.md "PQ at sf100"). NULL
    vectors get NULL codes/norm."""
    import numpy as np

    m = len(codebooks)
    sub = len(codebooks[0][0])
    cbs = [np.asarray(book, dtype=np.float64) for book in codebooks]
    # precompute |c|^2 per subspace: argmin |s-c|^2 = argmin(|c|^2 - 2 s·c)
    cb_sq = [(cb * cb).sum(axis=1) for cb in cbs]

    @F.pandas_udf("array<int>")
    def _codes(vs: pd.Series) -> pd.Series:
        out = []
        mask = vs.notna()
        if not mask.any():
            return pd.Series([None] * len(vs))
        mat = np.array([list(x) for x in vs[mask]], dtype=np.float64)
        codes = np.empty((mat.shape[0], m), dtype=np.int32)
        for j in range(m):
            s = mat[:, j * sub : (j + 1) * sub]
            d = cb_sq[j][None, :] - 2.0 * (s @ cbs[j].T)
            codes[:, j] = d.argmin(axis=1)
        it = iter(codes.tolist())
        for ok in mask:
            out.append(next(it) if ok else None)
        return pd.Series(out)

    v = _as_double(F.col(vec_col))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return df.withColumn(codes_col, _codes(v)).withColumn(norm_col, norm)


def pq_decode_expr(
    codebooks: list[list[list[float]]], codes_col: str = "codes"
) -> Column:
    """Reconstruction: concatenate each subspace's looked-up centroid.
    Used by the tests to bound reconstruction error; probes never
    decode (that's ADC's point)."""
    parts = [
        F.element_at(
            _codebook_expr(book), F.element_at(F.col(codes_col), j + 1) + 1
        )
        for j, book in enumerate(codebooks)
    ]
    return F.flatten(F.array(*parts))


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    id_col: str,
    k: int = 10,
    codes_col: str = "codes",
    norm_col: str = "vnorm",
    shortlist: int | None = None,
    rerank_against: DataFrame | None = None,
    vec_col: str | None = None,
) -> DataFrame:
    """Approximate cosine top-k via ADC: the query precomputes the
    m×k dot-product lookup tables DRIVER-side (m·k ≤ 2048 floats),
    and each candidate costs m `element_at` lookups + one divide.

    With ``rerank_against`` (a (id, vec) table) the ADC pass only
    builds a ``shortlist`` (default 4k) of candidates, then the
    short list alone joins back to the full vectors for an EXACT
    cosine rerank — the standard IVF-PQ two-stage read: full vectors
    are fetched for finalists only. Returns (id, cos_sim)."""
    import math

    m = len(codebooks)
    sub = len(codebooks[0][0])
    qnorm = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    luts = []
    for j, book in enumerate(codebooks):
        qj = query_vec[j * sub : (j + 1) * sub]
        luts.append([sum(a * b for a, b in zip(qj, c)) for c in book])
    adot = None
    for j, lut in enumerate(luts):
        term = F.element_at(
            F.expr(_sql_floats(lut)), F.element_at(F.col(codes_col), j + 1) + 1
        )
        adot = term if adot is None else adot + term
    approx = adot / (F.lit(qnorm) * F.col(norm_col))
    n_short = shortlist or (4 * k if rerank_against is not None else k)
    short = (
        encoded.select(F.col(id_col), approx.alias("adc_sim"))
        .orderBy(F.col("adc_sim").desc(), F.col(id_col))
        .limit(max(n_short, k))
    )
    if rerank_against is None:
        return short.select(
            F.col(id_col), F.round(F.col("adc_sim"), 4).alias("cos_sim")
        )
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    full = rerank_against.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    )
    dotq = F.aggregate(
        F.zip_with(F.col("__v"), qv, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(F.col("__v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        short.join(full, id_col)
        .select(
            F.col(id_col),
            F.round(dotq / (F.lit(qnorm) * vnorm), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )
