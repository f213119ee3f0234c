"""Byte-pair-encoding tokenizer: distributed training + JVM-side encode.

The training-data pipelines the reference feeds (and every LM corpus
pipeline) need a tokenizer trained on the corpus itself. Classic BPE
(Sennrich et al. 2016) is an iterative algorithm — repeatedly merge the
most frequent adjacent symbol pair — which maps onto Spark like this:

* ONE corpus-scale pass builds the word-frequency table
  (``word_freqs``). This is the only job whose input grows with the
  corpus; it is a narrow explode → hash-agg on ``word`` singletons with
  map-side partial counts, so the shuffle is bounded by per-partition
  vocabulary, not corpus tokens.
* Training then iterates on the WORD-FREQUENCY table only — ~|vocab|
  rows regardless of corpus size (this is how industrial BPE trainers
  work: they train on the word-count dict, never re-scanning the
  corpus). Each merge step is a vocab-sized pair-count aggregation plus
  a single-row argmax collect; the driver loop is control-only.
* Merge application is a pure column expression: a left-to-right fold
  (``F.aggregate``) over the symbol array that concatenates the chosen
  pair. No Python runs per row — the fold is JVM-side and codegen'd —
  and the same expression encodes unseen documents at any scale
  (``encode_token_count``), chained once per learned merge.

Greedy-fold correctness: the fold merges (left, right) whenever the
accumulator's last symbol equals ``left`` and the current element
equals ``right``. Because a merged symbol is the concatenation
``left+right`` (strictly longer than ``left``), a symbol produced by a
merge in this same pass can never equal ``left`` unless the original
text genuinely contained that longer symbol — so the fold reproduces
exactly the standard non-overlapping left-to-right merge pass
(e.g. merge (a,a) on "aaaa" → [aa, aa], on "aaa" → [aa, a]).
Verified against an independent pure-Python BPE model in
``tests/test_bpe.py`` (hypothesis property test).

Reference scope: the reference repo has no tokenizer; this is part of
the declared LLM-pipeline extension surface (SURVEY.md §2 north-star),
beside the vocabulary build (``t14_vocab_build``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.functions import text as X


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-tokenized, lowercased text — the
    single corpus-scale pass of BPE training."""
    return (
        docs.select(F.explode(X.tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def chars(col: Column) -> Column:
    """Initial symbol sequence: one symbol per character.

    ``split(word, '')`` yields the character array with no empty
    trailing element — same contract as DuckDB's ``str_split(word,
    '')`` used by the pair-count oracle, including the one edge both
    engines share: the empty string maps to ``['']`` (callers filter
    empty words before reaching this)."""
    return F.split(col, "")


def merge_pair(col: Column, left: str, right: str) -> Column:
    """Apply one BPE merge to a symbol array: greedy left-to-right
    non-overlapping replacement of adjacent (left, right) with
    left+right, as a JVM-side fold — no Python per row.

    ``try_element_at`` (not ``element_at``) keeps the empty-accumulator
    probe NULL-safe under ANSI mode (Spark 4 default)."""
    merged = left + right
    return F.aggregate(
        col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left)) & (x == F.lit(right)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def apply_merges(col: Column, merges: list[tuple[str, str]]) -> Column:
    """Chain the learned merge list (rank order) over a symbol array.
    Static expression unroll: one fold per merge, all inside whole-stage
    codegen; cost is O(|merges| · |word|) per row with zero shuffles."""
    out = col
    for left, right in merges:
        out = merge_pair(out, left, right)
    return out


def pair_counts(word_syms: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts over (syms, freq).

    ``arrays_zip(syms[:-1], syms[1:])`` forms the adjacent pairs in a
    narrow projection; the explode emits (left, right, freq) triples
    whose hash-agg has map-side partial combine. Input is the
    vocab-sized word table, so this never touches corpus-scale data."""
    syms = F.col("syms")
    zipped = F.arrays_zip(
        F.slice(syms, F.lit(1), F.size(syms) - 1).alias("left"),
        F.slice(syms, F.lit(2), F.size(syms) - 1).alias("right"),
    )
    return (
        word_syms.filter(F.size(syms) >= 2)
        .select(F.explode(zipped).alias("p"), F.col("freq"))
        .groupBy(
            F.col("p.left").alias("left"), F.col("p.right").alias("right")
        )
        .agg(F.sum("freq").alias("pair_freq"))
    )


def _safe_merge_batch(
    rows, remaining: int, batch_size: int, min_pair_freq: int, truncated: bool
) -> list[tuple[str, str, int]]:
    """Select a prefix-greedy batch of merges from one round's
    pair-count top list that is PROVABLY identical to what sequential
    single-merge greedy would pick (the standard frequency-gap trick).

    ``rows`` is sorted by (freq desc, left asc, right asc) — the exact
    sequential pick order among pairs whose counts a prior merge in
    the batch cannot have changed. A merge of (l, r) only perturbs
    counts of pairs containing l, r, or the merged symbol l+r:
    pairs touching l/r can only SHRINK, and a pair (x, l+r)/(l+r, y)
    can RISE to at most old(x, l+r) + old(x, l) (respawns are bounded
    by the count of the source pair they came from; the first term is
    nonzero only when the string l+r collides with a symbol that
    already existed via a different merge path). Every old count in
    those sums belongs to a CONFLICTING pair, so each is ≤ ``bound``,
    the max old freq over every conflicting row — wherever it sits in
    the list, scanned or not (a round-5 review found the original
    scanned-rows-only bound unsound: an equal-freq conflicting row
    BELOW the candidate could respawn a lexicographically-smaller
    winner) — or, when the list was truncated, the last row's freq.
    Hence every perturbed count is < 2·bound + 1, and a candidate is
    safe iff

    * its symbols are disjoint from every earlier selection's
      {left, right, merged} set (its own count is then unperturbed),
      and
    * its count is STRICTLY above 2·bound — it then beats every
      possibly-perturbed pair outright, so tie-breaks are irrelevant
      and the sequential argmax after the earlier merges is exactly
      this pair.

    The 2× is the symbol-collision term; it closes batches earlier
    than a max-only rule (more driver rounds, never more than
    sequential), buying a proof that needs no global vocabulary
    lookup. Model-equality is pinned by tests/test_bpe.py including
    the tie regression that broke the original rule."""
    cap = min(batch_size, remaining)
    first = rows[0]
    batch = [(first["left"], first["right"], int(first["pair_freq"]))]
    conflict = {first["left"], first["right"], first["left"] + first["right"]}
    trunc_bound = int(rows[-1]["pair_freq"]) if truncated else 0

    def bound() -> int:
        b = trunc_bound
        for r in rows:
            if (r["left"] in conflict or r["right"] in conflict) and (
                r["left"], r["right"], int(r["pair_freq"])
            ) not in batch:
                b = max(b, int(r["pair_freq"]))
        return b

    for row in rows[1:]:
        if len(batch) >= cap:
            break
        left, right, freq = row["left"], row["right"], int(row["pair_freq"])
        if freq < min_pair_freq:
            break
        if left in conflict or right in conflict:
            continue
        if freq <= 2 * bound():
            break  # rows are freq-desc: nothing later can clear it either
        batch.append((left, right, freq))
        conflict |= {left, right, left + right}
    return batch


def train_bpe(
    word_freq: DataFrame,
    n_merges: int,
    min_pair_freq: int = 2,
    batch_size: int = 8,
    stats: dict | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) table.

    Deterministic: argmax ties break on (left, right) lexicographically.
    The driver loop is control-only — each round runs one vocab-sized
    aggregation and collects a small top list; the evolving symbol
    table is re-persisted per round (and the predecessor unpersisted)
    so lineage stays a bounded number of folds deep. Stops early when
    no pair reaches ``min_pair_freq``.

    ``batch_size`` > 1 applies several merges per driver round when
    provably equivalent to single-merge greedy (see
    ``_safe_merge_batch``) — same output merges, fewer collect()
    round-trips for large vocabularies (model-equality tested in
    tests/test_bpe.py). ``stats``, if given, records
    ``{"rounds": <driver rounds run>}``.

    Returns [(left, right, pair_freq), ...] in rank order.
    """
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")  # 0 would loop forever
    cur = word_freq.select(
        chars(F.col("word")).alias("syms"), F.col("freq")
    ).persist()
    cur.count()  # materialize before the loop so each step folds once
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    top_n = max(4 * batch_size, 8)
    try:
        while len(merges) < n_merges:
            rows = (
                pair_counts(cur)
                .orderBy(F.desc("pair_freq"), F.asc("left"), F.asc("right"))
                .limit(top_n)
                .collect()
            )
            rounds += 1
            if not rows or rows[0]["pair_freq"] < min_pair_freq:
                break
            batch = _safe_merge_batch(
                rows,
                remaining=n_merges - len(merges),
                batch_size=batch_size,
                min_pair_freq=min_pair_freq,
                truncated=len(rows) == top_n,
            )
            merges.extend(batch)
            out_col = F.col("syms")
            for left, right, _ in batch:
                out_col = merge_pair(out_col, left, right)
            nxt = cur.select(out_col.alias("syms"), F.col("freq")).persist()
            nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    return merges


def encode_token_count(col: Column, merges: list[tuple[str, str]]) -> Column:
    """BPE token count of a text column under a learned merge list.

    Narrow projection: tokenize → per-word symbol fold chain → sum of
    symbol counts. Everything is JVM array expressions (transform +
    aggregate), so encoding scales with input splits and never
    shuffles."""
    per_word = F.transform(
        F.filter(X.tokens(col), lambda w: w != ""),
        lambda w: F.size(apply_merges(chars(w), merges)),
    )
    return F.coalesce(
        F.aggregate(per_word, F.lit(0), lambda a, x: a + x), F.lit(0)
    ).alias("n_bpe_tokens")
