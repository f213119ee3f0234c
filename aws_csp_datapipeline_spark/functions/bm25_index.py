"""Persisted BM25 inverted index — the text-retrieval member of the
corpus-artifact family (IVF/PQ indexes for vectors, the co-supply
edge list for graphs, the semdedup kept-state for embeddings, this
for keyword retrieval).

Economics, same as the others: the BUILD tokenizes the whole corpus
once and writes (a) a postings table (token, doc_id, tf) clustered by
token hash and sorted (token, doc_id) — every token's postings land
in one file, in one run, so a query-term filter prunes at the file
and row-group level exactly like the edge artifact's src-clustered
layout — plus (b) a per-document length table and (c) the two corpus
scalars (N, avgdl) in meta.json. A PROBE then reads only the queried
terms' postings: cost proportional to the ANSWER (df of the query
terms), not the corpus. At 100 TB the postings are the big-but-
build-once object on shared storage; ad-hoc retrieval queries stop
re-tokenizing 5M documents per query.

Scoring is bit-for-bit the t12 formula (BM25, k1=1.2, b=0.75,
idf = ln((N−df+0.5)/(df+0.5)+1)), so a probe through the artifact
must EQUAL the inline t12 lane — which is how the registry lane is
oracle-paired and how tests/test_artifact_cache.py pins it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.functions.text import token_count, tokens


def build_bm25_index(
    df: DataFrame, text_col: str, id_col: str, artifact_dir: str
) -> dict:
    """Tokenize once; write postings + doclens + meta.json into
    ``artifact_dir`` (a staging dir under the artifact cache's atomic
    publish protocol — see ``artifact_cache.get_or_build``)."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    postings = tok.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    (
        postings.repartition(F.col("token"))
        .sortWithinPartitions("token", "doc_id")
        .write.mode("overwrite")
        .parquet(os.path.join(artifact_dir, "postings"))
    )
    # token_count, NOT F.size(tokens(..)): split("") is [""] so size
    # would read 1 for an empty/whitespace-only document while the
    # inline t12 lane (text.bm25_scores) reads 0 — a silent avgdl
    # divergence that breaks the probe==inline guarantee. All three
    # dl definitions (here, bm25_scores, the shared DuckDB oracle's
    # dl CTE) use the empty→0 rule.
    doclens = df.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("long").alias("dl"),
    )
    doclens.write.mode("overwrite").parquet(
        os.path.join(artifact_dir, "doclens")
    )
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    meta = {"n_docs": int(stats["n_docs"]), "avgdl": float(stats["avgdl"])}
    with open(os.path.join(artifact_dir, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def probe_bm25_index(
    spark: SparkSession,
    artifact_dir: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document holding any query term: read ONLY the
    queried tokens' postings (the token-clustered layout turns the
    IN-filter into file/row-group pruning), derive per-term df from
    the pruned postings, join doc lengths, apply the t12 BM25
    formula. Returns (doc_id, score) unrounded/unsorted — the caller
    shapes the report."""
    with open(os.path.join(artifact_dir, "meta.json")) as fh:
        meta = json.load(fh)
    postings = spark.read.parquet(
        os.path.join(artifact_dir, "postings")
    ).filter(F.col("token").isin(terms))
    doclens = spark.read.parquet(os.path.join(artifact_dir, "doclens"))
    dft = postings.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs, avgdl = meta["n_docs"], meta["avgdl"]
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        + 1.0
    )
    score_term = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    )
    return (
        postings.join(dft, "token")
        .join(doclens, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(score_term).alias("score"))
    )
