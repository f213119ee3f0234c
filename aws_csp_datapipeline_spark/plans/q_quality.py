"""Data-quality gate queries: column profiling, FK audits, snapshot
reconciliation, uniqueness expectation, TF-IDF corpus statistics, and
approximate percentiles.

The reference fixes quality defects point-wise at ingest (null
spellings, lambda_function.py:247-248; existence probes, :342-364);
these queries are the bulk, between-stage form of the same checks a
100-TB pipeline runs as gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.functions.text import tokens
from aws_csp_datapipeline_spark.operators import quality as Q
from aws_csp_datapipeline_spark.plans.registry import register


@register(
    "dq1_column_profile",
    """
    SELECT 'c_nationkey' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(c_nationkey) AS n_nulls,
           COUNT(DISTINCT c_nationkey) AS n_distinct FROM customer
    UNION ALL
    SELECT 'c_acctbal', COUNT(*), COUNT(*) - COUNT(c_acctbal),
           COUNT(DISTINCT c_acctbal) FROM customer
    UNION ALL
    SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
           COUNT(DISTINCT c_mktsegment) FROM customer
    """,
)
def dq1_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null/distinct profile of customer in ONE scan (the
    oracle's UNION ALL of three scans restates it; Spark computes all
    statistics in a single agg and reshapes with stack)."""
    c = load_table(spark, sf_dir, "customer")
    return Q.profile_columns(c, ["c_nationkey", "c_acctbal", "c_mktsegment"])


@register(
    "dq2_orphan_counts",
    """
    SELECT 'lineitem->orders' AS relation,
           (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
              (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
              (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'events->customer_with_balance',
           (SELECT COUNT(*) FROM events e WHERE NOT EXISTS
              (SELECT 1 FROM customer c
               WHERE c.c_custkey = e.user_id AND c.c_acctbal > 0.0))
    """,
)
def dq2_orphan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over three declared FKs (the third
    checks against a filtered parent, so it has real violations). Each
    check is a left-anti join; only scalar counts leave the executors."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    active = c.filter(F.col("c_acctbal") > 0.0)
    ev = load_table(spark, sf_dir, "events")
    return Q.orphan_counts(
        [
            ("lineitem->orders", li, li.l_orderkey, o, o.o_orderkey),
            ("orders->customer", o, o.o_custkey, c, c.c_custkey),
            (
                "events->customer_with_balance",
                ev,
                ev.user_id,
                active,
                active.c_custkey,
            ),
        ]
    )


_NEW_SNAPSHOT_SQL = """
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 103 = 0
"""


@register(
    "dq3_snapshot_diff",
    f"""
    WITH new_snap AS ({_NEW_SNAPSHOT_SQL}),
    d AS (
      SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                    THEN 'changed'
                  ELSE 'unchanged' END AS diff_status
      FROM orders o FULL JOIN new_snap n ON o.o_orderkey = n.o_orderkey
    )
    SELECT diff_status, COUNT(*) AS n FROM d GROUP BY diff_status
    """,
)
def dq3_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (anti-entropy / CDC validation): diff
    today's orders against a simulated next-day snapshot (some keys
    deleted, some prices bumped, some keys added) and count rows per
    diff status. One full-outer join on the key; no row hashing."""
    o = load_table(spark, sf_dir, "orders")
    mod97 = F.col("o_orderkey") % 97
    new_snap = (
        o.filter(mod97 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 101 == 0, F.col("o_totalprice") + 1.0
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderstatus",
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % 103 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )
        )
    )
    diff = Q.snapshot_diff(
        o, new_snap, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
    return diff.groupBy("diff_status").agg(F.count(F.lit(1)).alias("n"))


@register(
    "dq4_duplicate_keys",
    """
    WITH k AS (
      SELECT l_orderkey, l_linenumber, COUNT(*) AS m
      FROM lineitem GROUP BY l_orderkey, l_linenumber
    ), d AS (SELECT * FROM k WHERE m > 1)
    SELECT COUNT(*) AS n_dup_keys,
           COALESCE(MAX(m), 1) AS max_multiplicity
    FROM d
    """,
)
def dq4_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness expectation on lineitem's natural key
    (l_orderkey, l_linenumber): duplicate-key count and the worst
    multiplicity (1 when the key is clean — every key singleton)."""
    li = load_table(spark, sf_dir, "lineitem")
    return Q.duplicate_key_audit(li, ["l_orderkey", "l_linenumber"])


@register(
    "t9_tfidf_stats",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
      FROM documents
    ), stats AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS total_tf
      FROM tok GROUP BY token
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT token, df, total_tf,
           ROUND(LN(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS idf
    FROM stats, n
    WHERE df >= 50
    """,
)
def t9_tfidf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF corpus statistics: per-token document frequency, total
    term frequency, and idf = ln(N/df) for common tokens. One explode
    + one grouped pass (df and total_tf in the same agg); the corpus
    size N joins in as a broadcast scalar, never a driver collect."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    stats = tok.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("total_tf"),
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        stats.crossJoin(F.broadcast(n))
        .filter(F.col("df") >= 50)
        .select(
            "token",
            "df",
            "total_tf",
            F.round(
                F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("idf"),
        )
    )


_A15_SQL = """
    SELECT o_orderpriority,
           percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
           percentile_disc(0.5)  WITHIN GROUP (ORDER BY o_totalprice) AS p50,
           percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75,
           percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS p95
    FROM orders GROUP BY o_orderpriority
"""


@register("a15_approx_percentile", _A15_SQL, oracle_sf_max=0.01)
def a15_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped approximate percentiles (GK sketch, Spark's
    approx_percentile with accuracy 10000) — the scale path when an
    exact per-group sort is too dear.

    Oracle-paired with a documented validity window (the d10 pattern):
    the GK bound is rank error ≤ N/accuracy per group, so whenever a
    group holds ≤ accuracy rows the sketch answer IS the exact
    discrete percentile and DuckDB's percentile_disc matches
    element-for-element. The attested sf0.01 corpus has ~3,000
    orders per priority (verified exact at local[4]/local[8]/
    local[32]); at sf0.1 (~30,000/group) the sketch is honestly
    approximate and the oracle is NOT valid — do not oracle-compare
    a15 beyond sf0.01. tests/test_quality.py bounds the relative
    error (<1%) at every SF regardless."""
    o = load_table(spark, sf_dir, "orders")
    pct = F.percentile_approx(
        "o_totalprice", [0.25, 0.5, 0.75, 0.95], 10000
    )
    return o.groupBy("o_orderpriority").agg(
        pct.getItem(0).alias("p25"),
        pct.getItem(1).alias("p50"),
        pct.getItem(2).alias("p75"),
        pct.getItem(3).alias("p95"),
    )


@register(
    "inc1_incremental_rollup",
    """
    WITH parts AS (
      SELECT o_orderpriority,
             CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS mon,
             COUNT(*) AS n, SUM(o_totalprice) AS s
      FROM orders
      WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'
      GROUP BY 1, 2
      UNION ALL
      SELECT o_orderpriority,
             CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE),
             COUNT(*), SUM(o_totalprice)
      FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      GROUP BY 1, 2
    )
    SELECT o_orderpriority, mon, CAST(SUM(n) AS BIGINT) AS n_orders,
           ROUND(SUM(s), 2) AS total_price,
           ROUND(SUM(s) / SUM(n), 4) AS avg_price
    FROM parts GROUP BY o_orderpriority, mon
    """,
)
def inc1_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: a historical partial aggregate
    (orders before 1997) merged with a new-data partial (1997+) by
    re-aggregating the mergeable statistics (count, sum) — AVG is
    reconstructed from sum/count at read time, never averaged across
    partials. The pattern behind incrementally-maintained materialized
    views: at 100 TB the base partial is a stored table and only the
    delta scans new data."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.to_date("o_orderdate").alias("d"),
        "o_totalprice",
    )
    cutoff = F.lit("1997-01-01").cast("date")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "o_orderpriority",
            F.date_trunc("month", F.col("d")).cast("date").alias("mon"),
        ).agg(
            F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
        )

    base = partial(o.filter(F.col("d") < cutoff))
    delta = partial(o.filter(F.col("d") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority", "mon")
        .agg(F.sum("n").alias("n_orders"),
             F.round(F.sum("s"), 2).alias("total_price"),
             F.round(F.sum("s") / F.sum("n"), 4).alias("avg_price"))
    )


@register(
    "dq5_quarantine_routing",
    """
    WITH raw AS (
      SELECT o_orderkey, o_totalprice,
             CASE CAST(o_orderkey % 4 AS INT)
               WHEN 0 THEN strftime(o_orderdate, '%d-%b')
               WHEN 1 THEN strftime(o_orderdate, '%b-%y')
               WHEN 2 THEN strftime(o_orderdate, '%Y')
               ELSE '-' END AS raw_date
      FROM orders WHERE o_orderkey <= 20000
    ),
    tagged AS (
      SELECT CASE
               WHEN NOT (regexp_matches(raw_date, '^\\d{4}$')
                      OR regexp_matches(raw_date, '^\\d{1,2}-[A-Za-z]{3}$')
                      OR regexp_matches(raw_date, '^[A-Za-z]{3}-\\d{2}$'))
                 THEN 'unparseable_date'
               WHEN o_totalprice > 400000.0 THEN 'price_out_of_range'
               ELSE 'valid' END AS reason
      FROM raw
    )
    SELECT reason, COUNT(*) AS n FROM tagged GROUP BY reason
    """,
)
def dq5_quarantine_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing over reference-shaped messy rows: first
    failing rule tags the row (unparseable date, then out-of-range
    price), everything else is 'valid'; the gate reports per-reason
    counts. Bad rows are data, not exceptions — at 100 TB they land in
    a quarantine table for reprocessing, and this tag is the routing
    key."""
    from aws_csp_datapipeline_spark.operators import cleaning as C

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 20000)
    raw = o.select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format("o_orderdate", "dd-MMM"))
        .when(F.col("o_orderkey") % 4 == 1, F.date_format("o_orderdate", "MMM-yy"))
        .when(F.col("o_orderkey") % 4 == 2, F.date_format("o_orderdate", "yyyy"))
        .otherwise(F.lit("-"))
        .alias("raw_date"),
    )
    tagged = C.route_quarantine(
        raw,
        [
            ("unparseable_date", C.parse_messy_date(F.col("raw_date")).isNull()),
            ("price_out_of_range", F.col("o_totalprice") > 400000.0),
        ],
    )
    return tagged.groupBy("reason").agg(F.count(F.lit(1)).alias("n"))


# Shared by t12 (inline scoring) and t27 (scoring through the
# persisted inverted-index artifact): the two lanes compute the SAME
# answer by construction, so they share one oracle.
_BM25_TOPDOCS_SQL = r"""
    WITH dl AS (
      -- empty/whitespace-only text counts 0 tokens (split('') is [''],
      -- len 1) — matches text.token_count on the Spark side
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(lower(text)), '\s+'))
             END AS dl
      FROM documents
    ), tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok
      WHERE token IN ('table', 'merge', 'window') GROUP BY doc_id, token
    ), dft AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), scal AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (SELECT AVG(dl) FROM dl) AS avgdl
    )
    SELECT doc_id,
           ROUND(SUM(LN((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
                     (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS score
    FROM tf JOIN dl USING (doc_id) JOIN dft USING (token), scal
    GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10
    """


@register("t12_bm25_topdocs", _BM25_TOPDOCS_SQL)
def t12_bm25_topdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) retrieval scoring for a fixed query
    ('table merge window'): the inverted-index shape — tokens are
    filtered to the query vocabulary BEFORE the tf aggregation, so
    the shuffle carries only query-term postings, not the corpus;
    df and the (N, avgdl) scalars broadcast; top-10 is
    TakeOrderedAndProject."""
    from aws_csp_datapipeline_spark.functions.text import bm25_scores

    d = load_table(spark, sf_dir, "documents")
    return (
        bm25_scores(d, ["table", "merge", "window"])
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "dq6_freshness_lag",
    """
    WITH latest AS (
      SELECT event_type, MAX(ts) AS latest_ts FROM events GROUP BY event_type
    ), ref AS (SELECT MAX(ts) AS global_ts FROM events)
    SELECT event_type,
           CAST(date_diff('second', latest_ts, global_ts) AS BIGINT) AS lag_s,
           date_diff('second', latest_ts, global_ts) > 86400 AS stale
    FROM latest, ref
    """,
)
def dq6_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness gate: per-feed (event_type) lag behind the newest
    data anywhere, flagged stale past 24 h — the monitor that catches
    a dead upstream before a training run consumes a partial day.
    Two tiny aggregates; the global watermark broadcasts. (Lag is
    measured against the data's own high-water mark, not wall clock,
    so the check is deterministic and engine-portable.)"""
    ev = load_table(spark, sf_dir, "events")
    latest = ev.groupBy("event_type").agg(F.max("ts").alias("latest_ts"))
    ref = ev.agg(F.max("ts").alias("global_ts"))
    lag = F.col("global_ts").cast("long") - F.col("latest_ts").cast("long")
    return latest.crossJoin(F.broadcast(ref)).select(
        "event_type",
        lag.alias("lag_s"),
        (lag > 86400).alias("stale"),
    )


@register(
    "dq7_distribution_drift",
    """
    WITH d AS (
      SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0'
                  THEN 'train' ELSE 'test' END AS split,
             least(CAST(n_chars AS BIGINT) // 200, 9) AS bucket
      FROM documents
    ), counts AS (
      SELECT split, bucket, COUNT(*) AS n FROM d GROUP BY split, bucket
    ), grid AS (
      SELECT s.split, b.bucket, COALESCE(c.n, 0) AS n
      FROM (SELECT DISTINCT split FROM counts) s
      CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bucket) b
      LEFT JOIN counts c ON c.split = s.split AND c.bucket = b.bucket
    ), probs AS (
      SELECT split, bucket,
             CAST(n + 1 AS DOUBLE)
               / (SUM(n) OVER (PARTITION BY split) + 10) AS p
      FROM grid
    )
    SELECT ROUND(SUM((a.p - b.p) * LN(a.p / b.p)), 6) AS psi
    FROM probs a JOIN probs b ON a.bucket = b.bucket
    WHERE a.split = 'train' AND b.split = 'test'
    """,
)
def dq7_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor between the train and
    test splits over the document-length distribution (10 fixed
    buckets, Laplace-smoothed) — the gate that catches a skewed split
    or upstream distribution shift before training. Everything after
    the first groupBy is constant-size (splits x buckets)."""
    from pyspark.sql import Window

    from aws_csp_datapipeline_spark.functions import sampling as SMP

    docs = SMP.hash_split(load_table(spark, sf_dir, "documents"), "doc_id", 0.75)
    d = docs.select(
        "split",
        F.least((F.col("n_chars").cast("long") / 200).cast("long"), F.lit(9)).alias(
            "bucket"
        ),
    )
    counts = d.groupBy("split", "bucket").agg(F.count(F.lit(1)).alias("n"))
    splits = counts.select("split").distinct()
    grid = (
        splits.crossJoin(spark.range(10).select(F.col("id").alias("bucket")))
        .join(counts, ["split", "bucket"], "left")
        .select("split", "bucket", F.coalesce("n", F.lit(0)).alias("n"))
    )
    w = Window.partitionBy("split")
    probs = grid.select(
        "split",
        "bucket",
        ((F.col("n") + 1).cast("double") / (F.sum("n").over(w) + 10)).alias("p"),
    )
    a = probs.filter(F.col("split") == "train").select(
        "bucket", F.col("p").alias("pa")
    )
    b = probs.filter(F.col("split") == "test").select(
        "bucket", F.col("p").alias("pb")
    )
    return a.join(b, "bucket").agg(
        F.round(
            F.sum((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))), 6
        ).alias("psi")
    )


@register(
    "t13_keywords_per_doc",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
    ), dft AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, token,
             ROUND(tf * LN(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN dft USING (token), n
    )
    SELECT doc_id, token, tfidf FROM scored
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, token) <= 3
    """,
)
def t13_keywords_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 tokens by tf·idf —
    corpus df joins back to the per-doc tf table (df table broadcast;
    the per-doc ranking window partitions by doc, so no global
    sort). Ranking on the ROUNDED score with a token tie-break keeps
    the cut engine-portable."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dft), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tfidf")
    )


@register(
    "dq8_expectation_suite",
    """
    SELECT 'orderkey_not_null' AS check_name,
           COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orderkey_unique',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'totalprice_positive',
           COUNT(*) FILTER (WHERE o_totalprice <= 0) FROM orders
    UNION ALL
    SELECT 'status_in_domain',
           COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
    FROM orders
    UNION ALL
    SELECT 'date_in_range',
           COUNT(*) FILTER (WHERE o_orderdate < DATE '1992-01-01'
                               OR o_orderdate > DATE '1998-12-31')
    FROM orders
    """,
)
def dq8_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite gate: five table contracts (not-null, key
    uniqueness, positivity, enum domain, date range) evaluated in ONE
    scan via conditional aggregates — the check row per contract is
    what a pipeline asserts on before promoting a batch. (The
    uniqueness check is the only one needing a distinct; the rest
    fold into a single pass.)"""
    o = load_table(spark, sf_dir, "orders")
    base = o.agg(
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("orderkey_not_null"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("orderkey_unique"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("totalprice_positive"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("status_in_domain"),
        F.count(
            F.when(
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
                | (F.col("o_orderdate") > F.lit("1998-12-31").cast("date")),
                1,
            )
        ).alias("date_in_range"),
    )
    checks = [
        "orderkey_not_null",
        "orderkey_unique",
        "totalprice_positive",
        "status_in_domain",
        "date_in_range",
    ]
    stacked = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("check_name"),
                        F.col(c).cast("long").alias("n_violations"),
                    )
                    for c in checks
                ]
            )
        ).alias("r")
    )
    return stacked.select("r.check_name", "r.n_violations")


@register(
    "dq12_skew_profile",
    """
    WITH k AS (
      SELECT l_suppkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS total,
             AVG(CAST(cnt AS DOUBLE)) AS mean_cnt
      FROM k
    )
    SELECT key, cnt,
           ROUND(100.0 * cnt / total, 4) AS share_pct,
           ROUND(cnt / mean_cnt, 4) AS skew_ratio
    FROM k, tot
    ORDER BY cnt DESC, key LIMIT 10
    """,
)
def dq12_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew profile: the top-10 heaviest values of a
    prospective shuffle key with their share of all rows and their
    ratio to the mean per-key load. This is the diagnostic that decides
    whether a join needs salting (`j3_salted_join`) or can rely on AQE
    skew splitting: a max skew_ratio near 1 means uniform; >> 1 means
    the hot key's partition dominates the stage. One combiner-agg over
    the key column (key singletons shuffle, never rows) + a broadcast
    1-row totals join — cost is O(distinct keys), so profiling a 100 TB
    fact costs one narrow column scan."""
    li = load_table(spark, sf_dir, "lineitem")
    k = (
        li.groupBy(F.col("l_suppkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = k.agg(
        F.sum("cnt").cast("double").alias("total"),
        F.avg(F.col("cnt").cast("double")).alias("mean_cnt"),
    )
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            F.round(F.lit(100.0) * F.col("cnt") / F.col("total"), 4).alias(
                "share_pct"
            ),
            F.round(F.col("cnt") / F.col("mean_cnt"), 4).alias("skew_ratio"),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(10)
    )


@register(
    "dq13_join_cardinality",
    """
    WITH lo AS (SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY 1),
    rc AS (SELECT c_custkey AS key, COUNT(*) AS cnt FROM customer GROUP BY 1)
    SELECT CAST(CAST(SUM(CAST(lo.cnt AS DECIMAL(38,0)) * rc.cnt)
                     AS DECIMAL(38,0)) AS VARCHAR) AS est_join_rows,
           CAST(COUNT(*) AS BIGINT) AS matching_keys,
           CAST(CAST(MAX(CAST(lo.cnt AS DECIMAL(38,0)) * rc.cnt)
                     AS DECIMAL(38,0)) AS VARCHAR) AS max_key_fanout
    FROM lo JOIN rc USING (key)
    """,
)
def dq13_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-join cardinality WITHOUT running the join:
    |A ⋈ B| = Σ_k cntA(k)·cntB(k) over per-key count histograms —
    the pre-flight check before a fact-fact join that could explode
    (max_key_fanout flags the single worst key). Two combiner aggs
    shuffle key singletons; the histogram join is distinct-key-sized,
    so the probe costs O(|keys|) instead of materializing the join.
    At 100 TB this is the difference between discovering a 10^13-row
    blow-up from a one-minute scan vs from a dead cluster. The sum and
    max run in DECIMAL(38,0): the blow-up regime this exists to detect
    is exactly where a 64-bit product/sum would overflow (ANSI error
    or wraparound), so the diagnostic must out-range the disaster it
    measures."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    lo = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt_l")
    )
    rc = c.groupBy(F.col("c_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt_r")
    )
    prod = F.col("cnt_l").cast("decimal(38,0)") * F.col("cnt_r")
    # the sum/max stay DECIMAL(38,0) internally (the whole point is
    # out-ranging the int64 blow-up regime) but are emitted as STRINGS
    # on BOTH sides: the driver's value hash is result-type sensitive
    # and r8 proved DECIMAL(38,0) fails it even with identical values
    # (CORRECTNESS_r08 dq13; see tools/type_parity.py)
    return lo.join(rc, "key").agg(
        F.sum(prod).cast("decimal(38,0)").cast("string").alias("est_join_rows"),
        F.count(F.lit(1)).cast("long").alias("matching_keys"),
        F.max(prod).cast("decimal(38,0)").cast("string").alias("max_key_fanout"),
    )


@register(
    "dq14_file_manifest",
    """
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS file,
           COUNT(*) AS n_rows,
           MIN(l_orderkey) AS min_orderkey,
           MAX(l_orderkey) AS max_orderkey
    FROM read_parquet('/root/testdata/sf0.01/lineitem.parquet*',
                      filename=true)
    GROUP BY 1 ORDER BY 1
    """,
    oracle_sf_max=0.01,
)
def dq14_file_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file layout manifest: row count and key range of every
    parquet file backing the lineitem table — the audit behind
    small-file compaction (`sources/layout.compact_parquet`) and
    clustering quality (overlapping key ranges ⇒ scans can't prune).

    Oracle window (the a15/d10 ``oracle_sf_max`` pattern, r10 verdict
    item 6): the registered DuckDB views hide file identity, but
    DuckDB's ``read_parquet(..., filename=true)`` restates the
    manifest — at the driver's attestation SF, whose path the oracle
    names explicitly (the compare contract fixes sf=0.01; the gate
    downgrades every other SF to rows-only instead of comparing
    against the wrong corpus). The pytest twin (tests/test_quality.py)
    still checks pyarrow per-file metadata at any SF.

    Cost shape: only the key column is read (column pruning), the
    group key is `input_file_name()` so partial aggs collapse each
    scan task to at most a few rows, and the shuffle is file-count-
    sized — a 100 TB table with 100k files yields a 100k-row
    manifest from a one-column scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("file")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("min_orderkey"),
            F.max("l_orderkey").alias("max_orderkey"),
        )
        .orderBy("file")
    )


@register(
    "dq15_fd_audit",
    """
    WITH fd1 AS (
      SELECT 'o_orderkey->o_custkey' AS dependency,
             CAST(COUNT(*) AS BIGINT) AS violating_keys
      FROM (
        SELECT o_orderkey FROM orders
        GROUP BY o_orderkey HAVING COUNT(DISTINCT o_custkey) > 1
      )
    ),
    fd2 AS (
      SELECT 'c_custkey->c_mktsegment' AS dependency,
             CAST(COUNT(*) AS BIGINT) AS violating_keys
      FROM (
        SELECT c_custkey FROM customer
        GROUP BY c_custkey HAVING COUNT(DISTINCT c_mktsegment) > 1
      )
    ),
    fd3 AS (
      SELECT 'l_orderkey,l_linenumber->l_partkey' AS dependency,
             CAST(COUNT(*) AS BIGINT) AS violating_keys
      FROM (
        SELECT l_orderkey, l_linenumber FROM lineitem
        GROUP BY l_orderkey, l_linenumber
        HAVING COUNT(DISTINCT l_partkey) > 1
      )
    )
    SELECT * FROM fd1 UNION ALL SELECT * FROM fd2 UNION ALL SELECT * FROM fd3
    ORDER BY dependency
    """,
)
def dq15_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each declared dependency
    X → Y, count determinant values carrying more than one distinct
    dependent — 0 means the invariant holds; >0 is the upstream-merge
    or key-reuse bug this check exists to catch before a join fans
    out. At 100 TB, run per ingest batch and diff against the
    previous audit.

    Scale shape: a single-column dependent never needs
    COUNT(DISTINCT) — `min(dep) != max(dep)` detects "more than one
    distinct value" with a plain combiner aggregate. That matters
    because the determinants here are near-unique (they're the keys
    being audited), so Catalyst's distinct-agg expansion — an extra
    Exchange keyed on (determinant, dependent) BEFORE the per-key
    distinct count — shuffles the full fact table one additional
    time for no collapse. The min/max form is one keys+2-longs
    shuffle per dependency (interleaved A/B: sf10 9.6 → 6.1 s,
    sf100 122 → 113 s median on 600M-row lineitem — SCALE.md
    "dq15"); NULL dependents are ignored by both forms
    (COUNT(DISTINCT) skips NULLs; min=max=NULL ⇒ NULL ≠ NULL is
    NULL ⇒ not a violation)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def fd(df, name, det, dep):
        v = (
            df.groupBy(*det)
            .agg(F.min(dep).alias("lo"), F.max(dep).alias("hi"))
            .filter(F.col("lo") != F.col("hi"))
            .agg(F.count(F.lit(1)).cast("long").alias("violating_keys"))
        )
        return v.select(F.lit(name).alias("dependency"), "violating_keys")

    return (
        fd(o, "o_orderkey->o_custkey", ["o_orderkey"], "o_custkey")
        .unionByName(
            fd(c, "c_custkey->c_mktsegment", ["c_custkey"], "c_mktsegment")
        )
        .unionByName(
            fd(
                li,
                "l_orderkey,l_linenumber->l_partkey",
                ["l_orderkey", "l_linenumber"],
                "l_partkey",
            )
        )
        .orderBy("dependency")
    )


@register(
    "a24_mad_outliers",
    """
    WITH med AS (
      SELECT o_orderpriority, median(o_totalprice) AS med
      FROM orders GROUP BY o_orderpriority
    ),
    dev AS (
      SELECT o.o_orderpriority, ABS(o.o_totalprice - m.med) AS adev, m.med
      FROM orders o JOIN med m USING (o_orderpriority)
    ),
    mad AS (
      SELECT o_orderpriority, ANY_VALUE(med) AS med,
             median(adev) AS mad
      FROM dev GROUP BY o_orderpriority
    )
    SELECT d.o_orderpriority,
           ROUND(m.med, 2) AS med, ROUND(m.mad, 2) AS mad,
           CAST(COUNT(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (o_orderpriority)
    GROUP BY d.o_orderpriority, m.med, m.mad
    """,
)
def a24_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier audit via median absolute deviation: per
    priority class, flag orders beyond 3 scaled MADs (1.4826·MAD ≈ σ
    under normality) — the robust sibling of `dq9`'s 3-sigma audit
    that a single fat-tailed batch can't blind (mean/stddev move with
    the outliers; medians don't). Exact medians (no sketch): two
    grouped percentile passes, each a keys+value shuffle, with the
    tiny per-class median/MAD tables broadcast back onto the fact."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    med = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("med")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.percentile("adev", 0.5).alias("mad")
    )
    cut = F.lit(3 * 1.4826) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.first("med"), 2).alias("med"),
            F.round(F.first("mad"), 2).alias("mad"),
            F.count(F.when(F.col("adev") > cut, 1)).cast("long").alias(
                "n_outliers"
            ),
        )
    )


@register(
    "dq16_chisq_independence",
    """
    WITH obs AS (
      SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
             CAST(COUNT(*) AS DOUBLE) AS o
      FROM events GROUP BY 1, 2
    ),
    margins AS (
      SELECT event_type, dow, o,
             SUM(o) OVER (PARTITION BY event_type) AS row_tot,
             SUM(o) OVER (PARTITION BY dow) AS col_tot,
             SUM(o) OVER () AS tot
      FROM obs
    ),
    cells AS (
      SELECT o, row_tot * col_tot / tot AS e FROM margins
    ),
    dims AS (
      SELECT COUNT(DISTINCT event_type) AS r, COUNT(DISTINCT dow) AS c
      FROM obs
    )
    SELECT ROUND(SUM((o - e) * (o - e) / e), 4) AS chi_sq,
           CAST((SELECT (r - 1) * (c - 1) FROM dims) AS BIGINT) AS dof
    FROM cells
    """,
)
def dq16_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between event type and day-of-week:
    the drift gate for 'did the traffic mix change with the calendar'
    (compare χ² against the dof-critical value downstream; PSI `dq7`
    is the two-sample sibling). One contingency aggregation — the
    observed table is |types|×7 cells, so the margins/expected math
    runs on a constant-size relation at any event volume."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    row_tot = F.sum("o").over(Window.partitionBy("event_type"))
    col_tot = F.sum("o").over(Window.partitionBy("dow"))
    tot = F.sum("o").over(Window.partitionBy())
    cells = obs.select(
        "event_type",
        "dow",
        "o",
        (row_tot * col_tot / tot).alias("e"),
    )
    dims = obs.agg(
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("dow").alias("c"),
    )
    stat = cells.agg(
        F.round(
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")),
            4,
        ).alias("chi_sq")
    )
    return stat.crossJoin(F.broadcast(dims)).select(
        "chi_sq", ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof")
    )


@register(
    "dq17_monotonicity_audit",
    """
    WITH r AS (
      SELECT user_id,
             CASE WHEN event_id < lag(event_id)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS inv
      FROM events
    )
    SELECT CAST(SUM(inv) AS BIGINT) AS n_inversions,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT CASE WHEN inv = 1 THEN user_id END) AS BIGINT)
             AS n_users_affected
    FROM r
    """,
)
def dq17_monotonicity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonicity audit: events whose serial id runs BACKWARD along
    the user's time axis — the clock-skew / out-of-order-ingest signal
    that breaks as-of joins and watermark assumptions downstream
    (`x1`, `st2`). One window over the shared (user, time) sort, one
    scalar rollup; a nonzero count at ingest time is the cue to widen
    watermark delays before the streaming layer drops those rows."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    inv = F.when(
        F.col("event_id") < F.lag("event_id").over(w), 1
    ).otherwise(0)
    r = ev.select("user_id", inv.alias("inv"))
    return r.agg(
        F.sum("inv").cast("long").alias("n_inversions"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct(F.when(F.col("inv") == 1, F.col("user_id")))
        .cast("long")
        .alias("n_users_affected"),
    )


@register(
    "dq18_ks_drift",
    """
    WITH d AS (
      SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0'
                  THEN 1 ELSE 0 END AS is_train,
             CAST(n_chars AS BIGINT) // 50 AS v
      FROM documents
    ), counts AS (
      SELECT v,
             SUM(is_train) AS c1,
             SUM(1 - is_train) AS c2
      FROM d GROUP BY v
    ), cum AS (
      SELECT SUM(c1) OVER (ORDER BY v) AS cum1,
             SUM(c2) OVER (ORDER BY v) AS cum2,
             SUM(c1) OVER () AS n1,
             SUM(c2) OVER () AS n2
      FROM counts
    )
    SELECT ROUND(MAX(ABS(CAST(cum1 AS DOUBLE) / n1
                         - CAST(cum2 AS DOUBLE) / n2)), 6) AS ks_d,
           CAST(MAX(n1) AS BIGINT) AS n_train,
           CAST(MAX(n2) AS BIGINT) AS n_test
    FROM cum
    """,
)
def dq18_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the
    train/test splits over the document-length distribution: the
    max ECDF gap, the distribution-shape sibling of dq7's PSI (PSI
    sees mass shifts per bucket; KS sees the worst cumulative gap,
    catching location shifts PSI's coarse buckets dilute).

    Exact on a 50-char quantized grid: the first groupBy collapses
    the corpus to one row per occupied grid value, so the ECDF
    window (a single unpartitioned ordered sum) runs over a
    grid-sized relation — corpus-size-independent, the dq7/dq16
    constant-tail shape — rather than sorting raw values."""
    from pyspark.sql import Window

    from aws_csp_datapipeline_spark.functions import sampling as SMP

    docs = SMP.hash_split(load_table(spark, sf_dir, "documents"), "doc_id", 0.75)
    d = docs.select(
        (F.col("split") == "train").cast("int").alias("is_train"),
        (F.col("n_chars").cast("long") / 50).cast("long").alias("v"),
    )
    counts = d.groupBy("v").agg(
        F.sum("is_train").alias("c1"),
        F.sum(F.lit(1) - F.col("is_train")).alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    cum = counts.select(
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
        F.sum("c1").over(tot).alias("n1"),
        F.sum("c2").over(tot).alias("n2"),
    )
    return cum.agg(
        F.round(
            F.max(
                F.abs(
                    F.col("cum1").cast("double") / F.col("n1")
                    - F.col("cum2").cast("double") / F.col("n2")
                )
            ),
            6,
        ).alias("ks_d"),
        F.max("n1").cast("long").alias("n_train"),
        F.max("n2").cast("long").alias("n_test"),
    )


@register(
    "dq19_fd_multi_audit",
    """
    WITH fd1 AS (
      SELECT 'l_orderkey,l_linenumber->l_partkey' AS dependency,
             CAST(COUNT(*) AS BIGINT) AS violating_keys
      FROM (
        SELECT l_orderkey, l_linenumber FROM lineitem
        GROUP BY l_orderkey, l_linenumber
        HAVING COUNT(DISTINCT l_partkey) > 1
      )
    ),
    fd2 AS (
      SELECT 'l_orderkey,l_linenumber->l_suppkey' AS dependency,
             CAST(COUNT(*) AS BIGINT) AS violating_keys
      FROM (
        SELECT l_orderkey, l_linenumber FROM lineitem
        GROUP BY l_orderkey, l_linenumber
        HAVING COUNT(DISTINCT l_suppkey) > 1
      )
    ),
    fd3 AS (
      SELECT 'l_partkey->l_suppkey' AS dependency,
             CAST(COUNT(*) AS BIGINT) AS violating_keys
      FROM (
        SELECT l_partkey FROM lineitem
        GROUP BY l_partkey HAVING COUNT(DISTINCT l_suppkey) > 1
      )
    )
    SELECT * FROM fd1 UNION ALL SELECT * FROM fd2 UNION ALL SELECT * FROM fd3
    ORDER BY dependency
    """,
)
def dq19_fd_multi_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARED-SCAN multi-FD audit: k declared dependencies of ONE
    table verified in a single pass (`functions/quality.py::
    fd_violation_counts`) — dq15's per-dependency form costs one full
    scan per FD, and at sf100 the scan dominates the audit (SCALE.md
    "dq15"), so k FDs of one table should cost one scan, one narrow
    k·N-row shuffle with map-side combine, and a per-fd count. The
    manual-Expand design (explode into per-FD (tag, keys, dep)
    copies) keeps shuffle rows exactly as narrow as the separate
    passes; the trade is purely the k→1 scan collapse. Measured
    honestly in BOTH regimes (SCALE.md "dq19"): on PAGE-CACHED local
    parquet the k-pass form wins or washes (decode is CPU-cheap; the
    explode pushes ×k rows through one aggregate); COLD — page cache
    dropped per run, sf100, round-11 A/B — the shared scan wins both
    reps (266/282 s vs 283/313 s), the bytes-read-dominated shape a
    100-TB object-store deployment actually runs."""
    from aws_csp_datapipeline_spark.operators.quality import (
        FunctionalDependency as FD,
        fd_violation_counts,
    )

    li = load_table(spark, sf_dir, "lineitem")
    deps = [
        FD("l_orderkey,l_linenumber->l_partkey",
           ("l_orderkey", "l_linenumber"), "l_partkey"),
        FD("l_orderkey,l_linenumber->l_suppkey",
           ("l_orderkey", "l_linenumber"), "l_suppkey"),
        FD("l_partkey->l_suppkey", ("l_partkey",), "l_suppkey"),
    ]
    return fd_violation_counts(li, deps).orderBy("dependency")


@register(
    "dq20_k_anonymity",
    """
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           CAST(COUNT(*) AS BIGINT) AS group_size
    FROM customer
    GROUP BY 1, 2, 3
    HAVING COUNT(*) < 5
    ORDER BY group_size ASC, c_nationkey, c_mktsegment, bal_bucket
    LIMIT 200
    """,
)
def dq20_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002): quasi-identifier combinations
    — here (nation, market segment, account-balance bucket), the
    generalized attributes a release would publish — whose equivalence
    class holds FEWER than k=5 records re-identify their members; the
    gate reports every under-k class before a dataset ships. The
    privacy twin of the dq-family's integrity gates and the tabular
    counterpart of the text PII scrub (t-family).

    Scale shape: one narrow groupBy on the generalized QI tuple
    (map-side combined; |classes| bounded by the generalization grid,
    not the corpus), HAVING + TakeOrderedAndProject for the report.
    At 100 TB the same plan holds — the shuffle carries one row per
    QI class. The balance bucket uses floor(x/1000) so the
    generalization is part of the audited spec, restated identically
    by the oracle (IEEE double division + floor on both engines)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("group_size"))
        .filter(F.col("group_size") < 5)
        .orderBy("group_size", "c_nationkey", "c_mktsegment", "bal_bucket")
        .limit(200)
    )


@register("t27_bm25_index_probe", _BM25_TOPDOCS_SQL)
def t27_bm25_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t12's retrieval through a PERSISTED inverted-index artifact —
    the text member of the corpus-artifact family (IVF/PQ for
    vectors, co-supply edges for graphs, semdedup kept-state): the
    build tokenizes the corpus ONCE and writes token-clustered
    postings + doc lengths + (N, avgdl); every probe after that reads
    only the queried terms' postings (file/row-group pruning on the
    clustered layout) — cost proportional to the query's df, not the
    corpus. Identical scoring to t12 by construction (same BM25
    constants, df/avgdl derived from the same definitions), so the
    two lanes share one oracle and tests/test_artifact_cache.py pins
    probe == inline as well as call #2 skipping the build. The
    fingerprint-keyed cache rebuilds when the corpus changes."""
    from aws_csp_datapipeline_spark.functions import bm25_index as BI
    from aws_csp_datapipeline_spark.functions.artifact_cache import (
        get_or_build,
    )

    def build(staging: str) -> None:
        BI.build_bm25_index(
            load_table(spark, sf_dir, "documents"), "text", "doc_id", staging
        )

    adir = get_or_build(
        # v2: dl switched to token_count (empty doc -> 0) so cached
        # v1 artifacts with the size(split())-based dl can't be read
        "bm25_index", sf_dir, ["documents"], {"tok": "ws-lower", "v": 2}, build
    )
    return (
        BI.probe_bm25_index(spark, adir, ["table", "merge", "window"])
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )
