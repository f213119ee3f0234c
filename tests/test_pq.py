"""Product quantization: reconstruction quality, ADC recall, and the
two-stage (shortlist → exact rerank) contract.

Floors are set against the synthetic embeddings table — unit-norm
RANDOM 64-d vectors, the hardest regime for PQ (no subspace
structure to exploit): measured m=8,k=16 reconstruction cosine
≈ 0.68, ADC-only recall@10 ≈ 0.4, ADC+rerank(50) ≈ 0.8 at local[8];
floors sit well under those with KMeans-init jitter margin."""

from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.functions import pq as PQ
from aws_csp_datapipeline_spark.functions.similarity import cosine_topk


def _recon_cos(enc, books):
    dec = enc.withColumn("recon", PQ.pq_decode_expr(books))
    dotv = F.aggregate(
        F.zip_with(
            F.col("recon"),
            F.expr("transform(embedding, x -> cast(x as double))"),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rnorm = F.sqrt(
        F.aggregate(F.col("recon"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dec.select(
        (dotv / (rnorm * F.col("vnorm"))).alias("c")
    ).agg(F.avg("c")).first()[0]


def test_reconstruction_floor_and_monotone_in_m(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    books8 = PQ.train_pq_codebooks(emb, "embedding", m=8, k=16)
    books2 = PQ.train_pq_codebooks(emb, "embedding", m=2, k=16)
    rc8 = _recon_cos(PQ.pq_encode(emb, "embedding", books8), books8)
    rc2 = _recon_cos(PQ.pq_encode(emb, "embedding", books2), books2)
    assert rc8 >= 0.55, rc8
    # more subspaces = finer effective codebook (k^m) = better
    # reconstruction; a wide planted gap, not a jitter-sensitive one
    assert rc8 > rc2 + 0.1, (rc8, rc2)


def test_adc_topk_recall_and_rerank(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    books = PQ.train_pq_codebooks(emb, "embedding", m=8, k=16)
    enc = PQ.pq_encode(emb, "embedding", books)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    corpus = enc.filter(F.col("vec_id") != 0)
    exact = {
        r["vec_id"]
        for r in cosine_topk(
            emb.filter(F.col("vec_id") != 0), "embedding", "vec_id", qv, k=10
        ).collect()
    }
    adc = {r["vec_id"] for r in PQ.pq_adc_topk(corpus, books, qv, "vec_id", k=10).collect()}
    assert len(adc) == 10
    assert len(adc & exact) / 10 >= 0.2  # ADC alone, random vectors

    rr_rows = PQ.pq_adc_topk(
        corpus,
        books,
        qv,
        "vec_id",
        k=10,
        shortlist=50,
        rerank_against=emb.filter(F.col("vec_id") != 0),
        vec_col="embedding",
    ).collect()
    rr = {r["vec_id"] for r in rr_rows}
    assert len(rr & exact) / 10 >= 0.6  # shortlist + exact rerank
    # reranked similarities are EXACT cosines: each reported cos_sim
    # must equal the brute-force value for that id
    exact_sims = {
        r["vec_id"]: r["cos_sim"]
        for r in cosine_topk(
            emb.filter(F.col("vec_id") != 0), "embedding", "vec_id", qv, k=500
        ).collect()
    }
    for r in rr_rows:
        assert abs(r["cos_sim"] - exact_sims[r["vec_id"]]) < 1e-9


def test_encode_deterministic_and_dim_check(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    books = PQ.train_pq_codebooks(emb, "embedding", m=4, k=8)
    a = {
        r["vec_id"]: r["codes"]
        for r in PQ.pq_encode(emb, "embedding", books).select("vec_id", "codes").collect()
    }
    b = {
        r["vec_id"]: r["codes"]
        for r in PQ.pq_encode(emb, "embedding", books).select("vec_id", "codes").collect()
    }
    assert a == b
    import pytest

    with pytest.raises(ValueError):
        PQ.train_pq_codebooks(emb, "embedding", m=7)
