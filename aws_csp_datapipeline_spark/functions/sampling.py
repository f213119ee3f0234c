"""Deterministic sampling / dataset-split operators.

A training-data pipeline needs reproducible splits: the same row must
land in the same split on every run, on every engine, regardless of
partitioning — so ``df.sample``/``sampleBy`` (seeded per-partition RNG,
partitioning-dependent) are the wrong tool. Everything here derives the
split from a **content hash of a key column** (md5, identical hex in
every engine), making the assignment a pure function of the data:
stable under repartitioning, under engine swap (the DuckDB oracle runs
the same expression), and under incremental re-runs (new rows don't
reshuffle old ones — the property that keeps a 100 TB corpus's
train/test split frozen while it grows).

All expressions are built-in (JVM-side, codegen); no UDFs, no RNG.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column) -> Column:
    """A uniform 256-bucket assignment: the first two hex chars of
    md5(key-as-string). Kept as the two-char hex STRING — lexicographic
    order on fixed-width lowercase hex equals numeric order, and string
    compare is what ANSI SQL restates exactly."""
    return F.substring(F.md5(key.cast("string")), 1, 2)


def _threshold(frac: float) -> str:
    """frac → two-char hex threshold t such that P(bucket < t) ≈ frac
    (exact multiples of 1/256)."""
    n = max(0, min(256, round(frac * 256)))
    return format(n, "02x")


def split_assign(
    key: Column, train_frac: float = 0.75, labels: tuple[str, str] = ("train", "test")
) -> Column:
    """Split label column: hash-bucket the key, compare against the
    fraction threshold."""
    return F.when(_bucket(key) < F.lit(_threshold(train_frac)), F.lit(labels[0])).otherwise(
        F.lit(labels[1])
    )


def hash_split(
    df: DataFrame, key_col: str, train_frac: float = 0.75, split_col: str = "split"
) -> DataFrame:
    """Deterministic train/test split: adds ``split_col`` with
    'train'/'test' as a pure function of ``key_col``. Narrow (no
    shuffle); filter on the label afterwards to materialize one side."""
    return df.withColumn(split_col, split_assign(F.col(key_col), train_frac))


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, fracs: Mapping[str, float]
) -> DataFrame:
    """Deterministic per-stratum downsample: keep a row iff its hash
    bucket falls under its stratum's fraction threshold (strata absent
    from ``fracs`` are dropped). The 100-TB use case is class
    rebalancing — e.g. downsample dominant languages — with an
    assignment that is reproducible row-for-row, unlike
    ``sampleBy``'s partitioning-dependent RNG. Narrow, no shuffle."""
    bucket = _bucket(F.col(key_col))
    thresh = None
    for stratum, frac in fracs.items():
        cond = F.lit(_threshold(frac))
        thresh = (
            F.when(F.col(strata_col) == stratum, cond)
            if thresh is None
            else thresh.when(F.col(strata_col) == stratum, cond)
        )
    return df.filter(bucket < thresh.otherwise(F.lit("00")))


def per_group_sample(
    df: DataFrame, group_col: str, key_col: str, k: int, salt_buckets: int = 0
) -> DataFrame:
    """Deterministic k-per-group sample: rank rows inside each group
    by (md5(key), key) — a content-defined, engine-portable order —
    and keep the first k. The hash makes the pick pseudo-random but
    frozen: re-runs, repartitions, and engine swaps pick the SAME k
    rows, and growing a group only evicts rows at the hash boundary.

    The ranking window shuffles by ``group_col``; with few, huge
    groups (the 100-TB corpus case: group = language) cap the window
    input first with a generous ``stratified_sample`` prefilter
    (hash-threshold >> k/|group|), so only a sliver of each group
    reaches the exact top-k window — or pass ``salt_buckets`` to run
    the ``per_group_topk`` salted two-phase form (identical result,
    mega-group sort spread across buckets)."""
    return per_group_topk(
        df,
        group_col,
        [_bucket(F.col(key_col)).asc(), F.col(key_col).asc()],
        k,
        key_col=key_col,
        salt_buckets=salt_buckets,
        rank_col="__rn",
    ).drop("__rn")


def auto_salt_buckets(n_rows: int, threshold: int = 500_000, buckets: int = 32) -> int:
    """Salting gate for ``per_group_topk``, following the repo's
    auto-knob convention (``similarity.auto_sign_bits``,
    ``dedup.minhash_lsh_pairs(bucket_cap='auto')``): OFF (0) at and
    below ``threshold`` rows so every attested plan keeps its
    measured single-window shape, 32-way salted beyond. Callers pass
    the RAW source-table count (a metadata-only parquet count-star),
    never the count of a derived frame — counting a derived input
    would execute its whole subplan once just to pick a knob (the er3
    plan-build-cost lesson, SCALE.md "er3 build cost")."""
    return buckets if n_rows > threshold else 0


def per_group_topk(
    df: DataFrame,
    group_col: str,
    order_by: list[Column],
    k: int,
    key_col: str,
    salt_buckets: int = 0,
    rank_col: str = "__rk",
) -> DataFrame:
    """Top-K rows per group under a TOTAL order, skew-proof at scale.

    Single-phase (``salt_buckets=0``): one window over ``group_col``
    — the right plan when no group dwarfs the rest, since the
    per-group sort is spillable and AQE splits skewed groups only
    BETWEEN groups, not within one. But a pathological mega-group
    (one crawl domain holding half a 100 TB corpus) sorts entirely
    inside one task.

    Two-phase (``salt_buckets=B``): rows are salted with
    ``pmod(xxhash64(key_col), B)`` — content-derived, so stable under
    task retries and repartitioning, unlike ``spark_partition_id()``
    — and phase 1 keeps each (group, salt) bucket's top k with the
    mega-group's sort spread over B tasks. Phase 2 ranks the
    ≤ k·B survivors per group exactly. Any row in a group's true
    top k ranks ≤ k within its own salt bucket (a fortiori), so the
    result is IDENTICAL to the single-phase window — proven pairwise
    on a planted mega-source corpus in
    ``tests/test_sampling_ops.py::test_per_group_topk_salted_equals_single_phase``.

    Requires ``order_by`` to be a total order (include a unique
    tie-break column, e.g. ``F.asc(key_col)``): under ties the two
    phases may keep different representatives.

    Returns ``df`` plus ``rank_col`` (1-based rank within group),
    filtered to rank ≤ k. Gate with ``auto_salt_buckets`` on the raw
    table count."""
    from pyspark.sql import Window

    if salt_buckets:
        w1 = Window.partitionBy(group_col, "__salt").orderBy(*order_by)
        df = (
            df.withColumn(
                "__salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets))
            )
            .withColumn("__rk1", F.row_number().over(w1))
            .filter(F.col("__rk1") <= k)
            .drop("__rk1", "__salt")
        )
    w = Window.partitionBy(group_col).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def deterministic_shuffle(
    df: DataFrame, key_col: str, salt: str = "shuf1"
) -> DataFrame:
    """Deterministic pseudo-random training order: every row gets a
    (batch, pos) pair such that reading batches in lexicographic order
    and rows by pos within each batch replays ONE fixed, seed-stable
    shuffled order of the whole corpus.

    Why not ``ORDER BY rand()``: per-partition RNG is neither stable
    under repartitioning nor reproducible across engines. Why not one
    global ``row_number``: an unpartitioned window collapses the
    corpus into a single task. Instead the md5 of (salt || key) is
    split into a 256-way batch prefix plus a within-batch sort key, so
    the assignment is (a) a pure function of the data — re-runs and
    engine swaps agree, the DuckDB oracle restates it verbatim — and
    (b) fully distributed: one hash-exchange on ``batch`` (256-way),
    per-batch local sort, no global sort, no RNG state. At 100 TB this
    is the epoch-shuffle writer: ``partitionBy(batch)``, rows written
    in pos order, trainers stream batches in name order. Changing
    ``salt`` is a fresh epoch permutation; appended rows change only
    positions WITHIN their batch (shift-by-rank), never other batches'
    contents.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string")))
    batch = F.substring(h, 1, 2)
    w = Window.partitionBy("batch").orderBy(F.col("__h"), F.col(key_col))
    return (
        df.withColumn("__h", h)
        .withColumn("batch", batch)
        .withColumn("pos", F.row_number().over(w))
        .drop("__h")
    )


def dsir_logweights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: Column,
    buckets: int = 1024,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): per-document importance log-weights toward a target domain,
    from hashed-unigram bag-of-words models. Each token hashes into
    one of ``buckets`` buckets; the target distribution p_t is fit on
    the rows where ``target`` is true, the proposal p_p on the whole
    corpus (both add-one smoothed), and a document's weight is

        mean over its token instances of  log p_t(b) - log p_p(b)

    Sampling ∝ exp(weight · n_tokens) then tilts the corpus toward
    the target domain. Returns (``id_col``, n_tokens,
    dsir_logweight); empty documents drop.

    Portability: the bucket is the first 6 hex chars of md5(token)
    read as an integer, mod ``buckets`` — identical in every engine
    (same convention as the md5 split/shuffle family here), so the
    ANSI oracle restates it verbatim. xxhash64 would be cheaper but
    engine-private; one md5 per token instance is the price of an
    exactly-restatable oracle, and a production run can swap in
    xxhash64 without changing any count.

    Shape: ONE explode of the token stream feeds both model fits
    (each a ``buckets``-row aggregate — map-side partial, constant
    shuffle) and the scoring join, which broadcasts the two tiny
    count tables back onto the stream; then one groupBy(doc). At
    100 TB the model tables stay ``buckets`` rows no matter the
    corpus, so the only data-sized costs are the explode and the
    per-doc reduce — both embarrassingly parallel.
    """
    from aws_csp_datapipeline_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col).alias("__doc"),
        target.alias("__tgt"),
        F.explode(tokens(F.col(text_col))).alias("__w"),
    ).filter(F.col("__w") != "")
    b = (
        F.conv(F.substring(F.md5(F.col("__w")), 1, 6), 16, 10).cast("long")
        % buckets
    )
    tb = toks.select("__doc", "__tgt", b.alias("__b"))
    prop = tb.groupBy("__b").agg(F.count(F.lit(1)).alias("__cp"))
    tgt = (
        tb.filter(F.col("__tgt"))
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__ct"))
    )
    totals = tb.agg(
        F.count(F.lit(1)).alias("__tp"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("__tt"),
    )
    term = F.log(
        (F.coalesce(F.col("__ct"), F.lit(0)) + 1.0)
        / (F.col("__tt") + F.lit(float(buckets)))
    ) - F.log((F.col("__cp") + 1.0) / (F.col("__tp") + F.lit(float(buckets))))
    return (
        tb.join(F.broadcast(prop), "__b")
        .join(F.broadcast(tgt), "__b", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("__doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum(term) / F.count(F.lit(1)), 4).alias(
                "dsir_logweight"
            ),
        )
        .select(
            F.col("__doc").alias(id_col), "n_tokens", "dsir_logweight"
        )
    )


def purged_time_split(
    df: DataFrame,
    time_col: str,
    entity_col: str,
    test_frac: float = 0.2,
    embargo_days: int = 30,
) -> DataFrame:
    """Leakage-safe TEMPORAL split for time-correlated corpora: the
    last ``test_frac`` of the observed date RANGE is the test window,
    the ``embargo_days`` immediately before it are quarantined (rows
    too close to the test window leak near-future information into
    training), and earlier rows of any entity that ALSO appears in
    the test window are labeled ``purged`` — an entity seen at eval
    time must not be memorized from its own training-era rows. The
    purge is the embargo idea applied on the ENTITY axis (cf. the
    purged/embargoed cross-validation construction in the
    quantitative-ML literature); tt5_split_leakage audits a hash
    split for exactly this overlap, this operator PREVENTS it.

    Returns one labeled row per input row: (entity, day, split) with
    split in {train, embargo, test, purged} and day the integer
    offset from the corpus' first date.

    Scale shape: one tiny extent aggregate broadcast back, a narrow
    per-row day/label projection, then ONE equi-join of the corpus
    against the distinct test-window entities — keyed shuffle, AQE's
    strategy call (the distinct-entity side is corpus-dependent, so
    no broadcast hint). Day cutoffs use a single double multiply +
    floor, identical on any IEEE engine.
    """
    if not 0.0 < test_frac < 1.0:
        raise ValueError(f"test_frac must be in (0, 1), got {test_frac}")
    if embargo_days < 0:
        raise ValueError(f"embargo_days must be >= 0, got {embargo_days}")
    base = df.select(
        F.col(time_col).cast("date").alias("__t"),
        F.col(entity_col).alias("entity"),
    ).filter(F.col("__t").isNotNull() & F.col("entity").isNotNull())
    ext = base.agg(F.min("__t").alias("__lo"), F.max("__t").alias("__hi"))
    tagged = (
        base.crossJoin(F.broadcast(ext))
        .select(
            "entity",
            F.datediff("__t", "__lo").cast("long").alias("day"),
            F.floor(
                F.datediff("__hi", "__lo") * F.lit(1.0 - test_frac)
            ).alias("__ts"),
        )
        .withColumn(
            "__split0",
            F.when(F.col("day") >= F.col("__ts"), "test")
            .when(F.col("day") >= F.col("__ts") - embargo_days, "embargo")
            .otherwise("train"),
        )
    )
    test_entities = (
        tagged.filter(F.col("__split0") == "test")
        .select("entity")
        .distinct()
        .withColumn("__in_test", F.lit(True))
    )
    return tagged.join(test_entities, "entity", "left").select(
        "entity",
        "day",
        F.when(
            (F.col("__split0") == "train") & F.col("__in_test").isNotNull(),
            "purged",
        )
        .otherwise(F.col("__split0"))
        .alias("split"),
    )


def epoch_expand(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weight_col: str,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Fractional-epoch mixture expansion: materialize a training
    stream where every source gets an EQUAL share of the weight
    budget (``weight_col``, e.g. chars or tokens) by repeating each
    document ``e_s = min(total_w / (n_sources * w_s), max_epochs)``
    times — floor(e_s) full copies plus one extra copy with
    probability frac(e_s), decided by the repo's portable md5 coin
    (first 6 hex chars as a 24-bit integer), so the realized stream
    is a pure function of the corpus: reproducible across runs,
    partitionings, and engines. Over-represented sources (e_s < 1)
    are DOWN-sampled by the same coin; ``max_epochs`` caps repetition
    of tiny sources (repeating data beyond a few epochs degrades
    models faster than it helps).

    Returns one row per EMITTED copy: (source, id, copy_idx >= 1).

    Scale shape: one map-side-combinable aggregate to per-source
    weights, a broadcast of the n_sources-row epoch table back onto
    the corpus, then a narrow explode — the expansion never shuffles
    the corpus. Epoch arithmetic is two exact-integer casts, one IEEE
    division, one multiply+floor: identical on any engine.
    """
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    per = df.groupBy(source_col).agg(
        F.sum(weight_col).cast("long").alias("__ws")
    )
    tot = per.agg(
        F.sum("__ws").cast("long").alias("__wt"),
        F.count(F.lit(1)).alias("__ns"),
    )
    # a zero-weight source (all-empty docs) has an undefined share;
    # repeating it is free, so it gets the cap — and the when() guard
    # keeps ANSI mode from erroring on the division
    e = F.when(
        F.col("__ws") <= 0, F.lit(float(max_epochs))
    ).otherwise(
        F.least(
            F.col("__wt").cast("double")
            / (F.col("__ns") * F.col("__ws")).cast("double"),
            F.lit(float(max_epochs)),
        )
    )
    eps = per.crossJoin(F.broadcast(tot)).select(
        source_col, e.alias("__e")
    )
    coin = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10
    ).cast("long")
    extra_gate = F.floor(
        (F.col("__e") - F.floor(F.col("__e"))) * F.lit(16777216.0)
    ).cast("long")
    k = (
        F.floor("__e").cast("long")
        + F.when(coin < extra_gate, F.lit(1)).otherwise(F.lit(0))
    ).alias("__k")
    return (
        df.join(F.broadcast(eps), source_col)
        .select(source_col, id_col, k)
        .select(
            source_col,
            id_col,
            F.explode(
                F.when(
                    F.col("__k") >= 1,
                    F.sequence(F.lit(1).cast("long"), F.col("__k")),
                ).otherwise(F.array().cast("array<long>"))
            ).alias("copy_idx"),
        )
    )


def scaling_law_subsets(
    df: DataFrame,
    key_col: str,
    base_frac: float = 1.0 / 64,
    k: int = 6,
) -> DataFrame:
    """NESTED geometric training subsets for scaling-law runs: subset
    i targets a ``base_frac * 2**i`` fraction of the corpus, and
    because every gate tests the SAME md5 coin against a doubling
    threshold, subset 0 ⊂ subset 1 ⊂ ... ⊂ subset k-1 BY
    CONSTRUCTION — each larger training run strictly extends the
    smaller one, which is what makes points on a scaling curve
    comparable. Adds ``subset_id``: the smallest subset containing
    the row (a row in subset i is in every j > i), NULL if in none.

    Deterministic and engine-portable (24-bit md5 coin vs integer
    gates, the repo's split-family convention); a narrow projection —
    no shuffle, stable under repartitioning and corpus growth.
    """
    if not 0.0 < base_frac <= 1.0:
        raise ValueError(f"base_frac must be in (0, 1], got {base_frac}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if base_frac * 2 ** (k - 1) > 1.0 + 1e-12:
        raise ValueError(
            f"largest subset frac {base_frac * 2 ** (k - 1)} exceeds 1.0"
        )
    coin = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 6), 16, 10
    ).cast("long")
    label: Column = F.lit(None).cast("int")
    # build the when-chain from the LARGEST subset down so the
    # smallest matching subset wins
    for i in range(k - 1, -1, -1):
        gate = int(base_frac * 2**i * 16777216)
        label = F.when(coin < F.lit(gate), F.lit(i)).otherwise(label)
    return df.withColumn("subset_id", label)


def weighted_topk_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Exact-k weighted sampling WITHOUT replacement (the
    Efraimidis-Spirakis exponential-key construction): each row draws
    the deterministic md5 unit coin u and is ranked by
    log(u) / w — the k largest keys are a weighted-without-replacement
    sample, with inclusion probability proportional to weight at every
    prefix. This is the SELECTION step that consumes importance
    weights (tt14's DSIR weights, quality scores): tt7's Bernoulli
    gate keeps a random-SIZED sample; this keeps exactly k.

    Deterministic per corpus (the coin is a pure function of the key),
    but NOT oracle-paired: the ranking key is transcendental (log),
    and IEEE says nothing about cross-engine agreement of log's last
    ulp — two engines could order a near-tied pair differently. The
    repo's hash gate demands bit-exactness, so this lane is rows-only
    with a behavioral pytest that also asserts the realized key
    margins are orders of magnitude above ulp scale
    (tests/test_sampling_ops.py). Rows with weight <= 0 or NULL are
    excluded (zero-weight rows have inclusion probability 0).

    Scale shape: narrow key computation + one TakeOrderedAndProject
    (k rows per partition, no global sort) — the o3 top-k plan.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    coin = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 6), 16, 10
        ).cast("long")
        + 1
    ) / F.lit(16777217.0)  # (0, 1]: log never sees 0
    key = F.log(coin) / F.col(weight_col).cast("double")
    return (
        df.filter(
            F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
        )
        .withColumn("__es_key", key)
        .orderBy(F.desc("__es_key"), F.asc(key_col))
        .limit(k)
        .drop("__es_key")
    )
