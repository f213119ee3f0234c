"""Quality checks for the approximate/iterative operators that have
no SQL oracle: recall floors against the exact path, and union-find
verification of the connected components."""

from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.plans.registry import queries


def _pairs(df):
    return {(r[0], r[1]) for r in df.collect()}


def test_lsh_ann_recall_floor(spark, sf_oracle):
    qs = queries()
    exact = _pairs(qs["s2_knn_join"](spark, sf_oracle))
    approx = _pairs(qs["s3_lsh_ann_topk"](spark, sf_oracle))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"hyperplane-LSH recall degraded: {recall:.2f}"


def test_ivf_ann_recall_floor(spark, sf_oracle):
    qs = queries()
    exact = _pairs(qs["s2_knn_join"](spark, sf_oracle))
    approx = _pairs(qs["s5_ivf_ann_topk"](spark, sf_oracle))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall degraded: {recall:.2f}"


def test_ivf_broadcast_centers_path_equals_bruteforce(spark):
    """Above 64 cells ivf_topk switches from the codegen literal to a
    broadcast centers table (auto_ivf_cells can size into the
    hundreds). With n_probe = n_cells every cell is searched, so the
    result must EQUAL exact brute force — which exercises the
    broadcast path end-to-end, not just its plan shape."""
    from aws_csp_datapipeline_spark.functions.similarity import ivf_topk, knn_join

    rows = [
        (i, [float(((i * 31 + d * 17) % 97) - 48) / 48.0 for d in range(8)])
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = df.filter(F.col("vec_id") < 3)
    exact = {
        (r["probe_id"], r["neighbor_id"], r["cos_sim"])
        for r in knn_join(probes, df, "embedding", "vec_id", k=3).collect()
    }
    ivf = {
        (r["probe_id"], r["neighbor_id"], r["cos_sim"])
        for r in ivf_topk(
            probes, df, "embedding", "vec_id", k=3, n_cells=70, n_probe=70
        ).collect()
    }
    assert ivf == exact and len(exact) == 9


def test_simhash_finds_jaccard_dups(spark, sf_oracle):
    """SimHash candidates must cover a reasonable share of the true
    J>=0.8 pairs (weaker signature, so a floor, not equality). The
    xxhash64 family — the in-engine scale default — carries the
    original 0.5 floor; the registered d4 lane runs the PORTABLE
    md5 family (a different random projection, so recall on the
    ~25-pair sf0.01 population moves by sampling noise: measured
    12/25 vs xxhash64's 13/25) and gets a floor one pair looser.
    d4's VALUES are pinned exactly by its DuckDB oracle; this test
    guards family QUALITY, not equality."""
    from aws_csp_datapipeline_spark.catalog import load_table
    from aws_csp_datapipeline_spark.functions.dedup import (
        simhash_candidate_pairs,
    )

    qs = queries()
    true_pairs = _pairs(qs["d2_ngram_jaccard_pairs"](spark, sf_oracle))
    d = load_table(spark, sf_oracle, "documents")
    xx_pairs = _pairs(
        simhash_candidate_pairs(d, "text", "doc_id", max_hamming=3)
    )
    assert len(true_pairs & xx_pairs) >= len(true_pairs) * 0.5
    sim_pairs = _pairs(qs["d4_simhash_candidates"](spark, sf_oracle))
    assert len(true_pairs & sim_pairs) >= len(true_pairs) * 0.5 - 1


def test_winnow_fingerprints_separate_dups_from_unrelated(spark, sf_oracle):
    """Near-dup pairs (J>=0.8) must share a large fraction of winnow
    fingerprints; unrelated pairs almost none — the separation that
    makes winnowing a usable dedup signal."""
    from aws_csp_datapipeline_spark.catalog import load_table
    from aws_csp_datapipeline_spark.functions.text import winnow_fingerprints
    from pyspark.sql import functions as F

    qs = queries()
    dup_pairs = [(r[0], r[1]) for r in qs["d2_ngram_jaccard_pairs"](spark, sf_oracle).collect()]
    d = load_table(spark, sf_oracle, "documents")
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in d.select(
            "doc_id", winnow_fingerprints(F.col("text")).alias("fps")
        ).collect()
    }

    def overlap(a, b):
        inter = len(fps[a] & fps[b])
        return inter / max(1, min(len(fps[a]), len(fps[b])))

    dup_overlaps = [overlap(a, b) for a, b in dup_pairs]
    assert min(dup_overlaps) >= 0.5, min(dup_overlaps)
    ids = sorted(fps)[:30]
    dup_set = set(dup_pairs)
    unrelated = [
        overlap(a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if (a, b) not in dup_set
    ]
    # word-salad corpora share vocabulary, so unrelated overlap isn't
    # zero — but it must stay well below the near-dup band
    assert max(unrelated) <= 0.35, max(unrelated)
    assert min(dup_overlaps) > max(unrelated)


def test_salted_join_on_skewed_data(spark):
    """One hot key carrying 50k of 51k rows: the salted join must
    still equal the plain join exactly."""
    from pyspark.sql import functions as F

    big = spark.range(51_000).select(
        F.when(F.col("id") < 50_000, 7).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("rowid"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    n_salts = 8
    b = big.withColumn("__salt", F.pmod(F.xxhash64("rowid"), F.lit(n_salts)))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    salted = b.join(
        s, (b["k"] == s["k"]) & (b["__salt"] == s["__salt"])
    ).select("rowid", "v")
    plain = big.join(small, "k").select("rowid", "v")
    assert salted.count() == plain.count() == 51_000
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_neardup_groups_match_union_find(spark, sf_oracle):
    """Distributed min-label propagation == driver-side union-find on
    the same pair set."""
    qs = queries()
    pairs = [(r[0], r[1]) for r in qs["d2_ngram_jaccard_pairs"](spark, sf_oracle).collect()]
    got = {(r["doc"], r["group_id"]) for r in qs["d6_neardup_groups"](spark, sf_oracle).collect()}

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    exp = {(x, find(x)) for x in parent}
    assert got == exp


def test_hll_sketch_rollup_error_bound(spark, sf_oracle):
    """Monthly estimates from unioned daily HLL sketches must land
    within 5% of the exact per-month distinct-user counts (lgK=14
    keeps the standard error well under that)."""
    from aws_csp_datapipeline_spark.catalog import load_table

    approx = {
        r["month"]: r["n_users_approx"]
        for r in queries()["a17_hll_sketch_rollup"](spark, sf_oracle).collect()
    }
    ev = load_table(spark, sf_oracle, "events")
    exact = {
        r["month"]: r["n"]
        for r in ev.select(
            F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month"),
            "user_id",
        )
        .groupBy("month")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for m, est in approx.items():
        assert abs(est - exact[m]) / exact[m] < 0.05, (m, est, exact[m])


def test_cms_estimate_error_bound(spark, sf_oracle):
    """CMS guarantees est >= true and (w.h.p.) est <= true + eps*N.
    Check every distinct key, not just the top-10."""
    from aws_csp_datapipeline_spark.functions.sketches import cms_build, cms_estimate

    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    n_total = li.count()
    sketch = cms_build(li, F.col("l_suppkey"), depth=4, width=256)
    est = cms_estimate(
        sketch, li.select("l_suppkey").distinct(), "l_suppkey", depth=4, width=256
    )
    true = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("true_count"))
    joined = est.join(true, "l_suppkey").collect()
    assert len(joined) > 0
    slack = 16 * n_total / 256
    for r in joined:
        assert r["est_count"] >= r["true_count"], r
        assert r["est_count"] - r["true_count"] <= slack, r


def test_kmv_estimates_track_exact_overlap(spark, sf_oracle):
    """KMV pairwise estimates vs exact per-source distinct counts and
    pairwise intersections: with k=256 over ~100-doc sources the
    sketch saw everything, so estimates must be EXACT; a second pass
    with k=32 (true estimation regime) must stay within the ~1/sqrt(k)
    error band."""
    from pyspark.sql import functions as F

    from aws_csp_datapipeline_spark.catalog import load_table
    from aws_csp_datapipeline_spark.functions import sketches as SK
    from aws_csp_datapipeline_spark.functions.text import fingerprint

    d = load_table(spark, sf_oracle, "documents")
    fp = d.select("source", fingerprint(F.col("text")).alias("f")).dropDuplicates(
        ["source", "f"]
    ).persist()
    exact_pairs = {
        (r["source_a"], r["source_b"]): r["n"]
        for r in fp.alias("a")
        .join(
            fp.select(F.col("source").alias("source_b"), "f").alias("b"), "f"
        )
        .filter(F.col("a.source") < F.col("source_b"))
        .groupBy(F.col("a.source").alias("source_a"), "source_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    exact_distinct = {
        r["source"]: r["n"]
        for r in fp.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    for k, tol in ((256, 0.0), (32, 0.5)):
        sk = SK.kmv_build(d, "source", fingerprint(F.col("text")), k=k)
        dist = {
            r["source"]: r["est"]
            for r in sk.select(
                "source",
                SK.kmv_distinct_estimate(F.col("kmv"), k=k).alias("est"),
            ).collect()
        }
        for s, n in exact_distinct.items():
            assert abs(dist[s] - n) <= max(2.0, tol * n), (k, s, dist[s], n)
        a = sk.select(F.col("source").alias("source_a"), F.col("kmv").alias("ka"))
        b = sk.select(F.col("source").alias("source_b"), F.col("kmv").alias("kb"))
        eu, ei, ej = SK.kmv_pair_estimates(F.col("ka"), F.col("kb"), k=k)
        ests = {
            (r["source_a"], r["source_b"]): r["ei"]
            for r in a.join(b, F.col("source_a") < F.col("source_b"))
            .select("source_a", "source_b", ei.alias("ei"))
            .collect()
        }
        for pair, n in exact_pairs.items():
            est = ests.get(pair, 0.0)
            assert abs(est - n) <= max(3.0, tol * max(n, 10)), (k, pair, est, n)
    fp.unpersist()


def test_bloom_no_false_negatives_and_fp_bound(spark):
    """Every member probes true (bloom guarantee); non-member false
    positives stay near the sized ~0.9% rate (m/n=10 bits, k=5)."""
    from aws_csp_datapipeline_spark.functions import sketches as SK

    n = 5_000
    members = spark.range(n).select(F.col("id").alias("key"))
    bloom = SK.bloom_build(members, F.col("key"), n_bits=n * 10, k=5)

    hits = SK.bloom_probe(
        members, F.col("key"), bloom, n_bits=n * 10, k=5
    )
    assert hits.filter(~F.col("might_contain")).count() == 0

    non = spark.range(1_000_000, 1_000_000 + 20_000).select(
        F.col("id").alias("key")
    )
    fp = (
        SK.bloom_probe(non, F.col("key"), bloom, n_bits=n * 10, k=5)
        .filter(F.col("might_contain"))
        .count()
    )
    assert fp / 20_000 < 0.03, fp  # sized ~0.9%, generous margin


def test_bloom_merge_by_union(spark):
    """Two half-corpus blooms re-aggregated equal the one-shot bloom —
    the partial/merge property the 100-TB membership path needs."""
    from aws_csp_datapipeline_spark.functions import sketches as SK

    a = spark.range(0, 500).select(F.col("id").alias("key"))
    b = spark.range(500, 1_000).select(F.col("id").alias("key"))
    both = a.unionByName(b)
    one_shot = {
        (r["word_idx"], r["word"])
        for r in SK.bloom_build(both, F.col("key"), n_bits=8192, k=5).collect()
    }
    merged = {
        (r["word_idx"], r["word"])
        for r in SK.bloom_build(a, F.col("key"), n_bits=8192, k=5)
        .unionByName(SK.bloom_build(b, F.col("key"), n_bits=8192, k=5))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
        .collect()
    }
    assert one_shot == merged


def test_bloom_inline_expr_matches_relational_probe(spark):
    """The zero-join literal-array probe agrees with the relational
    probe on members AND non-members."""
    from aws_csp_datapipeline_spark.functions import sketches as SK

    n_bits = 1 << 14
    members = spark.range(2_000).select(F.col("id").alias("key"))
    bloom = SK.bloom_build(members, F.col("key"), n_bits=n_bits, k=5)
    words = SK.bloom_dense_words(bloom, n_bits)

    probe = spark.range(0, 6_000).select(F.col("id").alias("key"))
    inline = {
        r["key"]: r["m"]
        for r in probe.select(
            "key",
            SK.bloom_contains_expr(words, F.col("key"), n_bits, 5).alias("m"),
        ).collect()
    }
    rel = {
        r["key"]: r["might_contain"]
        for r in SK.bloom_probe(
            probe, F.col("key"), bloom, n_bits=n_bits, k=5
        ).collect()
    }
    assert inline == rel
    assert all(inline[i] for i in range(2_000))  # no false negatives


def test_bloom_probe_preserves_duplicate_rows(spark):
    """ADVICE r9 fix: a member row appearing d>1 times must come back
    d times, each with might_contain=true — the old groupBy(payload)
    + sum(hit)==k collapsed the d copies into d*k exploded rows and
    reported a FALSE NEGATIVE, contradicting the filter contract."""
    from aws_csp_datapipeline_spark.functions import sketches as SK

    members = spark.range(100).select(F.col("id").alias("key"))
    bloom = SK.bloom_build(members, F.col("key"), n_bits=4096, k=5)
    # probe with every member appearing exactly 3 times
    dup = members.unionByName(members).unionByName(members)
    out = SK.bloom_probe(dup, F.col("key"), bloom, n_bits=4096, k=5)
    assert out.count() == 300  # multiplicity preserved
    assert out.filter(~F.col("might_contain")).count() == 0  # no false negs
