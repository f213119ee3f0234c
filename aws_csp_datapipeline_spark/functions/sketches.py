"""Count-Min Sketch built from plain DataFrame aggregations.

A CMS is d hash rows × w buckets of counters; estimate(key) = min over
rows of its bucket's counter (always an overestimate, error ≤ εN with
ε ≈ e/w at high probability). Because the sketch is just a (seed,
bucket) → count table, it is mergeable by UNION + re-aggregate —
per-partition / per-day sketches roll up exactly like a17's HLL
sketches, which is what makes frequency monitoring affordable over a
100-TB event history: the persisted state is d×w integers per grain,
re-aggregable to any coarser grain without re-scanning raw data.

Spark-first: the build is one explode(d tags) + one partial-aggregated
groupBy — no UDFs, no driver state; xxhash64(key, seed) keeps the hash
family inside whole-stage codegen. (Spark's own F.count_min_sketch
emits an opaque binary; this relational form stays queryable/mergeable
with plain SQL, which the pipeline needs.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, key: Column, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the (seed, bucket, cnt) sketch table for ``key`` over all
    rows of ``df``. At most depth × width rows come out of the one
    shuffle; the explode multiplies rows before the map-side partial
    aggregation, so the exchange itself carries only per-partition
    bucket partials."""
    tagged = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(F.xxhash64(key, F.lit(s)), F.lit(width)).alias(
                            "bucket"
                        ),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("t")
    )
    return (
        tagged.select("t.seed", "t.bucket")
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, key_col: str, depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimated frequency for each candidate key: join each key's d
    (seed, bucket) coordinates against the sketch and take the MIN
    counter. The sketch is d×w rows → broadcast; candidates never
    shuffle."""
    key = F.col(key_col)
    coords = candidates.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(F.xxhash64(key, F.lit(s)), F.lit(width)).alias(
                            "bucket"
                        ),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("t"),
    ).select(key_col, "t.seed", "t.bucket")
    return (
        coords.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )


# --- bottom-k (KMV) distinct sketches: mergeable set operations ---


def kmv_build(df: DataFrame, group_col: str, key: Column, k: int = 256) -> DataFrame:
    """Per-group bottom-k (KMV) distinct sketch: the k smallest
    xxhash64 values of the group's DISTINCT keys, as one sorted
    array<long> per group — (group, kmv).

    The KMV sketch answers distinct-count AND set-operation questions
    (union/intersection/Jaccard between groups) from k longs per
    group, with ~1/√k relative error (Beyer et al. 2007, "On synopses
    for distinct-value estimation"). Mergeable: union two sketches by
    merging arrays and re-taking the bottom k — so per-day/per-shard
    sketches roll up without rescanning, same contract as the HLL/CMS
    rollups (`a17`, `a20`).

    Build shape: distinct (group, hash) pairs shuffle once; a
    row_number window keeps the k smallest per group (top-k-per-key,
    never a full sort); the array_agg collects exactly k longs per
    group. At 100 TB the sketch table is |groups| × k longs — the
    whole point."""
    from pyspark.sql import Window

    hashed = df.select(
        F.col(group_col).alias("grp"), F.xxhash64(key).alias("h")
    ).dropDuplicates(["grp", "h"])
    w = Window.partitionBy("grp").orderBy("h")
    bottom = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return bottom.groupBy(F.col("grp").alias(group_col)).agg(
        F.array_sort(F.collect_list("h")).alias("kmv")
    )


def _as_unit(h: Column) -> Column:
    """Map a signed-64 hash to (0, 1): u = (h + 2^63) / 2^64."""
    return (h.cast("double") + F.lit(float(2**63))) / F.lit(float(2**64))


def kmv_distinct_estimate(kmv: Column, k: int = 256) -> Column:
    """Distinct-count estimate from one sketch: (k−1)/u(θ) with θ the
    kth smallest hash; exact |kmv| when the group had < k distinct
    keys (the sketch saw everything)."""
    return F.when(F.size(kmv) < k, F.size(kmv).cast("double")).otherwise(
        F.lit(float(k - 1)) / _as_unit(F.element_at(kmv, k))
    )


def kmv_pair_estimates(
    a: Column, b: Column, k: int = 256
) -> tuple[Column, Column, Column]:
    """(est_union, est_intersection, est_jaccard) between two KMV
    sketches: merge, re-take bottom k (θ = new kth), count shared
    hashes below θ → ρ = shared/k, U = (k−1)/u(θ), I = ρ·U.
    Pure array expressions over ≤2k longs per pair — pairwise set
    comparison without touching the raw data."""
    merged = F.slice(F.array_sort(F.array_union(a, b)), 1, k)
    m = F.size(merged)  # = k unless both sketches saw tiny sets
    theta = F.element_at(merged, m)
    shared = F.size(F.array_intersect(a, b))
    # exact when the union fits inside the sketch
    est_union = F.when(
        m < k, m.cast("double")
    ).otherwise(F.lit(float(k - 1)) / _as_unit(theta))
    rho = (
        F.size(
            F.filter(F.array_intersect(a, b), lambda h: h <= theta)
        ).cast("double")
        / m
    )
    est_inter = F.when(m < k, shared.cast("double")).otherwise(rho * est_union)
    est_jacc = F.when(m < k, shared / m.cast("double")).otherwise(rho)
    return est_union, est_inter, est_jacc


def bloom_build(
    df: DataFrame, key: Column, n_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Bloom filter as a RELATION: (word_idx, word) rows — int64 words
    of a ``n_bits`` bitset, each member setting ``k`` bits
    (xxhash64(key, seed) per seed, codegen-side). Built with one
    explode(k tags) + one bit_or aggregate, so it partial-aggregates
    map-side like the CMS above and MERGES by UNION + re-bit_or.

    Why relational instead of Spark's internal BloomFilter binary
    (`bloom_filter_agg` is not in the public function registry —
    verified UNRESOLVED_ROUTINE on this build): the word table is
    queryable, mergeable, and persistable with plain SQL, and at
    n_bits=2^27 it is ~2M rows / 16 MB — broadcastable. This is the
    "ships as a broadcast/bloom filter instead of the equi-join"
    restatement the d1/d9 docstrings promise for 100-TB membership:
    the big side probes a broadcast word table instead of shuffling
    its fingerprints into a join.

    Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; at m/n = 10
    bits per member and k = 5 that is ~0.9%."""
    tags = F.array(*[F.lit(i) for i in range(k)])
    bit = F.pmod(F.xxhash64(F.col("__k"), F.col("__seed")), F.lit(n_bits))
    return (
        df.select(key.alias("__k"), F.explode(tags).alias("__seed"))
        .select(
            (bit / 64).cast("long").alias("word_idx"),
            (bit % 64).cast("int").alias("__bit"),
        )
        # F.shiftleft only takes a literal shift in the Python API —
        # the column-shift form goes through the SQL expression
        .select("word_idx", F.expr("shiftleft(CAST(1 AS BIGINT), __bit)").alias("__w"))
        .groupBy("word_idx")
        .agg(F.bit_or("__w").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    key: Column,
    bloom: DataFrame,
    n_bits: int = 1 << 20,
    k: int = 5,
    out_col: str = "might_contain",
) -> DataFrame:
    """Membership probe against a ``bloom_build`` word table: each row
    derives its k (word_idx, bit) pairs, LEFT-joins the broadcast word
    table, and is a member candidate iff ALL k bits are set. No
    false negatives; false positives at the sized rate. The probe
    side's own columns ride along untouched.

    Row multiplicity is preserved: each input row is tagged with a
    ``monotonically_increasing_id`` BEFORE the k-way explode and the
    k probe rows regroup on that id (bool_and over the hits), so
    duplicate probe rows come back as duplicate output rows and a
    member appearing d>1 times still sees exactly its own k bits —
    grouping on the payload columns instead would collapse the d
    copies into d*k exploded rows and break the all-k test (a
    false NEGATIVE, which the filter contract forbids)."""
    cols = df.columns
    tags = F.array(*[F.lit(i) for i in range(k)])
    bit = F.pmod(F.xxhash64(key, F.col("__seed")), F.lit(n_bits))
    probes = (
        df.withColumn("__rid", F.monotonically_increasing_id())
        .select(*cols, "__rid", F.explode(tags).alias("__seed"))
        .select(
            *cols,
            "__rid",
            (bit / 64).cast("long").alias("word_idx"),
            (bit % 64).cast("int").alias("__bit"),
        )
        .select(
            *cols,
            "__rid",
            "word_idx",
            F.expr("shiftleft(CAST(1 AS BIGINT), __bit)").alias("__b"),
        )
    )
    joined = probes.join(F.broadcast(bloom), "word_idx", "left").withColumn(
        "__hit",
        (F.col("word").isNotNull())
        & (F.col("word").bitwiseAND(F.col("__b")) == F.col("__b")),
    )
    return (
        joined.groupBy("__rid", *cols)
        .agg(F.bool_and("__hit").alias(out_col))
        .drop("__rid")
    )


def bloom_dense_words(bloom: DataFrame, n_bits: int) -> list[int]:
    """Collect a ``bloom_build`` word table into the dense int64 word
    list (driver-side). Size bound: n_bits/64 longs — 16k at 2^20
    bits, 64k at 2^22; use the relational ``bloom_probe`` instead
    when the filter is too big to ship as a literal."""
    words = [0] * (n_bits // 64)
    for r in bloom.collect():
        words[int(r["word_idx"])] = int(r["word"])
    return words


def bloom_contains_expr(
    words: list[int], key: Column, n_bits: int, k: int = 5
) -> Column:
    """ZERO-join membership test: the dense word list ships as ONE
    literal array expression (generated SQL parsed JVM-side — the
    er3 py4j-chatter lesson, SCALE.md "er3 build cost") and each row
    checks its k bits with element_at lookups inline in the
    projection. No shuffle, no join — the probe rides the scan. The
    scale form of "ship the membership set into the probe scan":
    big-big membership joins become a map-side filter plus one small
    exact-confirm join on the survivors. Use the relational
    ``bloom_probe`` when the filter outgrows a literal
    (``bloom_dense_words`` documents the bound)."""
    arr = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
    one = F.lit(1).cast("long")
    cond = None
    for i in range(k):
        bit = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits))
        word = F.element_at(arr, (bit / 64).cast("int") + 1)
        mask = F.call_function("shiftleft", one, (bit % 64).cast("int"))
        hit = word.bitwiseAND(mask) != 0
        cond = hit if cond is None else cond & hit
    return cond
