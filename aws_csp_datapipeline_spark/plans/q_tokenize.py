"""Tokenizer-training lane: BPE over the document corpus.

Registry queries:

* ``t17_bpe_pair_counts`` — the first BPE iteration's frequency-weighted
  adjacent character-pair counts (oracle-paired: pure aggregation).
* ``t17_bpe_merges`` — the learned merge table for 8 merges
  (rows-only: iterative algorithm per the driver contract; verified
  against a pure-Python BPE reference in ``tests/test_bpe.py``).
* ``t18_bpe_encode`` — per-document BPE token counts under the learned
  merges (rows-only; model-checked in ``tests/test_bpe.py``).

Scale story (100 TB): the only corpus-scale job is the word-frequency
pass (narrow explode → combiner agg on singletons). Training iterates
on the ~|vocab|-row word table; encoding is a shuffle-free narrow
projection of chained JVM fold expressions. See
``functions/bpe.py`` module docstring.

Reference scope: the reference repo has no tokenizer — this extends the
north-star LLM-pipeline surface beside ``t14_vocab_build``
(SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.functions import bpe
from aws_csp_datapipeline_spark.plans.registry import register

N_MERGES = 8


@register(
    "t17_bpe_pair_counts",
    r"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
      FROM documents
    ),
    wf AS (
      SELECT word, COUNT(*) AS freq FROM tok WHERE word <> '' GROUP BY word
    ),
    syms AS (SELECT str_split(word, '') AS s, freq FROM wf WHERE len(word) >= 2),
    pairs AS (
      SELECT unnest(list_zip(s[:-2], s[2:])) AS z, freq FROM syms
    )
    SELECT z[1] AS left_sym, z[2] AS right_sym,
           CAST(SUM(freq) AS BIGINT) AS pair_freq
    FROM pairs GROUP BY 1, 2
    ORDER BY pair_freq DESC, left_sym, right_sym LIMIT 20
    """,
)
def t17_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 first-iteration BPE pair counts: what the trainer's
    argmax sees before the first merge. Vocab-sized aggregation after
    the one corpus-scale word-count pass."""
    d = load_table(spark, sf_dir, "documents")
    wf = bpe.word_freqs(d)
    syms = wf.select(bpe.chars(F.col("word")).alias("syms"), F.col("freq"))
    return (
        bpe.pair_counts(syms)
        .select(
            F.col("left").alias("left_sym"),
            F.col("right").alias("right_sym"),
            F.col("pair_freq").cast("long").alias("pair_freq"),
        )
        .orderBy(F.desc("pair_freq"), F.asc("left_sym"), F.asc("right_sym"))
        .limit(20)
    )


def _learned_merges(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, str, int]]:
    d = load_table(spark, sf_dir, "documents")
    return bpe.train_bpe(bpe.word_freqs(d), N_MERGES)


@register("t17_bpe_merges", None)
def t17_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table (rank order). Iterative algorithm →
    rows-only driver check; the merge list itself is deterministic
    (argmax ties break lexicographically) and model-checked in
    tests/test_bpe.py against an independent Python implementation."""
    rows = [
        (rank + 1, left, right, left + right, freq)
        for rank, (left, right, freq) in enumerate(
            _learned_merges(spark, sf_dir)
        )
    ]
    return spark.createDataFrame(
        rows, "rank INT, left_sym STRING, right_sym STRING, merged STRING, pair_freq BIGINT"
    )


@register("t18_bpe_encode", None)
def t18_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the corpus-trained BPE merges:
    the number every packing/budgeting stage downstream consumes
    (cf. tt6_greedy_pack, which bins on whitespace token counts).
    Encoding is one narrow projection — chained JVM folds, no shuffle,
    no Python per row."""
    merges = [(l, r) for l, r, _ in _learned_merges(spark, sf_dir)]
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id"),
        bpe.encode_token_count(F.col("text"), merges).alias("n_bpe_tokens"),
    )


@register("pipe5_tokenized_packing", None)
def pipe5_tokenized_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware batch assembly: the packing step (`tt6`) driven
    by REAL tokenizer counts instead of whitespace counts — train BPE
    on the corpus, encode every document, then greedy-pack per
    language shard against a 2048-token budget. This is the actual
    pretraining data flow (tokenize → pack into context windows);
    rows-only because the merge list is learned (tests/test_bpe.py
    pins invariants: bins are contiguous, budget-bounded exclusive
    prefix sums, counts consistent with t18).

    One corpus pass for word freqs, vocab-table training iterations,
    then a single narrow encode projection feeding the per-shard
    running-sum window — the same one-shuffle shape as tt6."""
    from pyspark.sql import Window

    merges = [(l, r) for l, r, _ in _learned_merges(spark, sf_dir)]
    d = load_table(spark, sf_dir, "documents")
    n_t = d.select(
        "lang",
        "doc_id",
        bpe.encode_token_count(F.col("text"), merges).alias("n"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = n_t.withColumn(
        "bin_id",
        F.floor(F.coalesce(F.sum("n").over(w), F.lit(0)) / F.lit(2048)).cast(
            "long"
        ),
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").cast("long").alias("total_tokens"),
    )
